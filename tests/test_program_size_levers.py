"""Equality tests for the program-size perf levers (docs/STATUS.md r3):
each lever must be a pure program transformation — identical math to the
default implementation it replaces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("hw,out", [(64, 5), (32, 5), (13, 5), (8, 5),
                                    (64, 1), (5, 5), (4, 1)])
def test_adaptive_pool_matmul_matches_slice(monkeypatch, hw, out):
    from gan_tpu.models import sk

    x = jax.random.normal(jax.random.PRNGKey(0), (2, hw, hw, 7))
    monkeypatch.setenv("GAN_TPU_POOL_IMPL", "slice")
    ref = sk.adaptive_avg_pool(x, out)
    monkeypatch.setenv("GAN_TPU_POOL_IMPL", "matmul")
    got = sk.adaptive_avg_pool(x, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_adaptive_pool_matmul_rectangular(monkeypatch):
    from gan_tpu.models import sk

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 9, 3))
    monkeypatch.setenv("GAN_TPU_POOL_IMPL", "slice")
    ref = sk.adaptive_avg_pool(x, 5)
    monkeypatch.setenv("GAN_TPU_POOL_IMPL", "matmul")
    got = sk.adaptive_avg_pool(x, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_split_step_matches_monolithic(monkeypatch):
    """GAN_TPU_SPLIT_STEP=1 chains d/g sub-programs with the same rng
    derivation as the monolithic step: identical state + metrics."""
    from gan_tpu.models.generators import Generator1
    from gan_tpu.models.discriminators import Discriminator3WGANGP
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step

    obj = get_objective("wganlazygpR2")
    g = Generator1(z_dim=16, image_size=(64, 64, 3))
    d = Discriminator3WGANGP(ndf=4)
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    batch = jax.random.normal(jax.random.PRNGKey(7), (4, 64, 64, 3))

    def run(split):
        monkeypatch.setenv("GAN_TPU_SPLIT_STEP", "1" if split else "0")
        state = create_state(rng, g, d, g_tx, d_tx, batch_size=4,
                             image_size=(64, 64, 3))
        step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
        assert (step.parts("pen") is not None) == split
        ms = []
        for i in range(3):  # pen step at i=0, nopen at 1,2
            state, m = step(state, batch, jax.random.PRNGKey(100 + i), i)
            ms.append(m)
        return state, ms

    s_ref, m_ref = run(split=False)
    s_got, m_got = run(split=True)

    assert int(s_got.step) == int(s_ref.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.g_params),
                    jax.tree_util.tree_leaves(s_got.g_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.d_params),
                    jax.tree_util.tree_leaves(s_got.d_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
    for ma, mb in zip(m_ref, m_got):
        assert set(ma) == set(mb)
        for k in ma:
            np.testing.assert_allclose(
                np.asarray(mb[k]), np.asarray(ma[k]), rtol=1e-5,
                atol=1e-6, err_msg=k)


def test_g_dfwd_remat_matches_default(monkeypatch):
    """GAN_TPU_G_DFWD_REMAT=1 (jax.checkpoint around the D forward inside
    the G loss — the b20 HBM lever, docs/STATUS.md r4) is a pure remat:
    identical metrics and updated params."""
    from gan_tpu.models import build_generator, build_discriminator
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step

    obj = get_objective("wganlazygpR2")
    g = build_generator("G1", z_dim=16)
    d = build_discriminator("D3_wgangp", ndf=4)
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    batch = jax.random.normal(rng, (4, 64, 64, 3))

    def run():
        state = create_state(rng, g, d, g_tx, d_tx, batch_size=4,
                             image_size=(64, 64, 3))
        step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
        state, m = step(state, batch, jax.random.PRNGKey(1), 0)
        return jax.device_get((state.g_params, m))

    monkeypatch.delenv("GAN_TPU_G_DFWD_REMAT", raising=False)
    p_ref, m_ref = run()
    monkeypatch.setenv("GAN_TPU_G_DFWD_REMAT", "1")
    p_got, m_got = run()
    for k in m_ref:
        np.testing.assert_allclose(m_got[k], m_ref[k], rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
