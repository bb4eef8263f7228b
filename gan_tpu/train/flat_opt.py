"""Flat-vector optimizer adapter.

The zoo's deep models have thousands of small parameter leaves
(SURVEY.md SS7 hard part 4 — e.g. G13_5 has ~2.9k leaves). Per-leaf optax
updates emit ~12 HLO ops per leaf, which dominates XLA compile time and
kernel-launch overhead. This adapter ravels the param/grad pytrees into one
1-D vector, runs the (elementwise) optimizer once, and unravels the update:
O(leaves) reshapes/concats instead of O(leaves * ops_per_update).

Valid for any purely-elementwise transformation (adam, adamw, sgd, clip);
exactly the reference's optimizer family (trainunits.py:18-19, wgan.py:17-18).
"""

from typing import NamedTuple

import jax
import jax.flatten_util
import optax


class FlatState(NamedTuple):
    inner: optax.OptState


def flatten_optimizer(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    def init(params):
        vec, _ = jax.flatten_util.ravel_pytree(params)
        return FlatState(inner=tx.init(vec))

    def update(grads, state, params=None):
        gvec, unravel = jax.flatten_util.ravel_pytree(grads)
        pvec = None
        if params is not None:
            pvec, _ = jax.flatten_util.ravel_pytree(params)
        upd, inner = tx.update(gvec, state.inner, pvec)
        return unravel(upd), FlatState(inner=inner)

    return optax.GradientTransformation(init, update)
