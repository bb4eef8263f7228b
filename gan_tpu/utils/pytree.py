"""Small pytree utilities (param counting, byte sizes).

Replaces the reference's `Units.show_model` param-count print
(/root/reference/train/trainunits.py:40-42).
"""

import jax
import numpy as np


def param_count(tree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def tree_bytes(tree) -> int:
    """Total bytes of all leaves in a pytree."""
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
    )
