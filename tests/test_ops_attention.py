"""attention_core: pallas flash path == reference einsum path.

Shapes mirror the zoo's real uses: N = H*W in {64, 256, 1024, 4096},
E from c/8 (SAGAN bottleneck) up to full c (G13/D9 variants).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.ops import attention_core


def _qkv(key, b, n, e, dtype=jnp.float32):
    kf, kg, kh = jax.random.split(key, 3)
    f = jax.random.normal(kf, (b, n, e), dtype)
    g = jax.random.normal(kg, (b, n, e), dtype)
    hx = jax.random.normal(kh, (b, n, e), dtype)
    return f, g, hx


@pytest.mark.parametrize("n,e", [(64, 48), (256, 8), (1024, 32), (4096, 6)])
def test_pallas_forward_matches_einsum(n, e):
    f, g, hx = _qkv(jax.random.PRNGKey(0), 2, n, e)
    ref = attention_core(f, g, hx, impl="einsum")
    out = attention_core(f, g, hx, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_grads_match_einsum():
    f, g, hx = _qkv(jax.random.PRNGKey(1), 2, 256, 16)

    def loss(impl):
        def fn(f, g, hx):
            out = attention_core(f, g, hx, impl=impl, interpret=True)
            return jnp.sum(jnp.sin(out))

        return fn

    ref_grads = jax.grad(loss("einsum"), argnums=(0, 1, 2))(f, g, hx)
    pl_grads = jax.grad(loss("pallas"), argnums=(0, 1, 2))(f, g, hx)
    for a, b in zip(pl_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_nondivisible_query_tile():
    # N not a multiple of block_q exercises the cdiv remainder path
    f, g, hx = _qkv(jax.random.PRNGKey(2), 1, 192, 8)
    ref = attention_core(f, g, hx, impl="einsum")
    out = attention_core(f, g, hx, impl="pallas", block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_module_grads_under_env_flag(monkeypatch):
    # first-order training through the G-side module works on the pallas
    # path and matches einsum gradients
    from gan_tpu.models.blocks_rir import SelfAttention

    m = SelfAttention(embedding_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 16))
    vars_ = m.init(jax.random.PRNGKey(8), x)

    def loss(v):
        return jnp.sum(jnp.cos(m.apply(v, x)))

    g_ref = jax.grad(loss)(vars_)
    monkeypatch.setenv("GAN_TPU_ATTN_IMPL", "pallas")
    g_pl = jax.grad(loss)(vars_)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_module_parity_under_env_flag(monkeypatch):
    # The G-side SelfAttention produces identical outputs whichever impl
    # the env selects (pallas runs interpreted on CPU).
    from gan_tpu.models.blocks_rir import SelfAttention

    m = SelfAttention(embedding_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 24))
    vars_ = m.init(jax.random.PRNGKey(4), x)
    ref = m.apply(vars_, x)
    monkeypatch.setenv("GAN_TPU_ATTN_IMPL", "pallas")
    out = m.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
