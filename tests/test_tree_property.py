"""Property test: tree channel bookkeeping (get_out_planes) matches actual
output shapes — the jax port of the reference's test_2 sweeps
(generator_6.py:491-503, generator_9.py:331-343). eval_shape only."""

import jax
import jax.numpy as jnp
import pytest

from gan_tpu.models.blocks_rir import RiRTree
from gan_tpu.models.generators.g05 import Tree5
from gan_tpu.models.generators.g04 import Tree4

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


@pytest.mark.parametrize("last_planes", [8, 12, 20])
@pytest.mark.parametrize("out_planes", [4, 8])
@pytest.mark.parametrize("dense_depth", [0, 2])
@pytest.mark.parametrize("level,block_num", [(1, 2), (2, 1), (3, 2)])
def test_rir_tree_channel_math(last_planes, out_planes, dense_depth, level, block_num):
    t = RiRTree(last_planes, 4, out_planes, dense_depth, level=level,
                block_num=block_num, style="g6", act="prelu")
    out = jax.eval_shape(
        lambda: t.init_with_output(
            RNGS, jnp.zeros((2, 8, 8, last_planes)), train=True)
    )[0]
    assert out.shape[-1] == t.get_out_planes()


@pytest.mark.parametrize("last_planes,out_planes,dense_depth", [
    (16, 8, 2), (64, 32, 8), (24, 32, 4),
])
@pytest.mark.parametrize("level,block_num", [(1, 3), (2, 2)])
def test_dpn_tree_channel_math(last_planes, out_planes, dense_depth, level, block_num):
    t = Tree5(last_planes, 8, out_planes, dense_depth, level=level,
              block_num=block_num)
    out = jax.eval_shape(
        lambda: t.init_with_output(
            RNGS, jnp.zeros((2, 8, 8, last_planes)))
    )[0]
    assert out.shape[-1] == t.get_out_planes()


@pytest.mark.parametrize("in_planes,planes", [(32, 16), (16, 16)])
@pytest.mark.parametrize("level", [1, 2])
def test_g4_tree_width(in_planes, planes, level):
    t = Tree4(in_planes, planes, level=level, block_num=3)
    out = jax.eval_shape(
        lambda: t.init_with_output(
            RNGS, jnp.zeros((2, 8, 8, in_planes)))
    )[0]
    assert out.shape[-1] == planes  # G4 trees emit `planes` channels