"""G13_5 style-bank equality: the batched cross-module to_style computation
(models/style_bank.py) must be a pure re-layout — identical forward values
and batch-stat updates to the classic per-site chains, via the param-tree
converters."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.models.generators.g13_5 import Generator13_5
from gan_tpu.models import style_bank as sb
from gan_tpu.utils import param_count


def _build(impl):
    g = Generator13_5(z_dim=32, planes=8, mapping_layers=2, remat=False,
                      rir_impl=impl)
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    vars_c = g.init(rngs, z, train=True)
    return g, z, vars_c


@pytest.mark.parametrize("impl", ["vmap", "folded", "unrolled"])
def test_bank_forward_matches_classic(impl):
    g, z, vars_c = _build(impl)
    gb = g.clone(style_bank=True)
    reg = sb.style_registry(gb)
    assert reg, "registry must be non-empty"
    vars_b = sb.classic_to_bank(vars_c, reg)

    noise = {"noise": jax.random.PRNGKey(9)}
    out_c, mut_c = g.apply(vars_c, z, train=True, rngs=noise,
                           mutable=["batch_stats"])
    out_b, mut_b = gb.apply(vars_b, z, train=True, rngs=noise,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c),
                               rtol=2e-4, atol=1e-5)

    # updated batch stats must round-trip to the classic layout
    back = sb.bank_to_classic(
        {"params": vars_b["params"], "batch_stats": mut_b["batch_stats"]}, reg)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(mut_c["batch_stats"])
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back["batch_stats"])
    assert len(flat_c) == len(flat_b)
    for (pc, lc), (pb, lb) in zip(flat_c, flat_b):
        assert pc == pb
        np.testing.assert_allclose(np.asarray(lb), np.asarray(lc),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pc))


def test_bank_param_count_and_roundtrip():
    g, z, vars_c = _build("vmap")
    gb = g.clone(style_bank=True)
    reg = sb.style_registry(gb)

    # bank-mode self-init has the same trainable param count
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    vars_b_init = gb.init(rngs, z, train=True)
    assert param_count(vars_b_init["params"]) == param_count(vars_c["params"])

    # classic -> bank -> classic is the identity
    vars_b = sb.classic_to_bank(vars_c, reg)
    assert param_count(vars_b["params"]) == param_count(vars_c["params"])
    back = sb.bank_to_classic(vars_b, reg)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(vars_c["params"])
    flat_r, _ = jax.tree_util.tree_flatten_with_path(back["params"])
    assert [p for p, _ in flat_c] == [p for p, _ in flat_r]
    for (pc, lc), (_, lr) in zip(flat_c, flat_r):
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(lc),
                                      err_msg=jax.tree_util.keystr(pc))


@pytest.mark.skipif(os.environ.get("GAN_TPU_SLOW_TESTS") != "1",
                    reason="~25 min of eager grad on this single-core host"
                           " (GAN_TPU_SLOW_TESTS=1 to run; green 2026-08-21)")
def test_bank_gradients_flow():
    g, z, vars_c = _build("vmap")
    gb = g.clone(style_bank=True)
    reg = sb.style_registry(gb)
    vars_b = sb.classic_to_bank(vars_c, reg)

    def loss(params):
        out = gb.apply(
            {"params": params, "batch_stats": vars_b["batch_stats"]}, z,
            train=True, rngs={"noise": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(out))

    grads = jax.grad(loss)(vars_b["params"])
    bank_leaves = jax.tree_util.tree_leaves(grads["style_bank"])
    assert bank_leaves and all(
        np.isfinite(np.asarray(l)).all() for l in bank_leaves)
    # the style path must actually carry gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in bank_leaves)
