"""End-to-end: a full train step through an attention-bearing generator on
the pallas path (interpreted on CPU) runs and matches the einsum path."""

import jax
import numpy as np
import pytest

from gan_tpu.models.generators.g08 import SkipTreeGenerator
from gan_tpu.models import build_discriminator
from gan_tpu.objectives import get_objective
from gan_tpu.train import create_state, build_train_step


def _tiny_attention_g():
    # smallest G9-style config that still routes through SelfAttention
    return SkipTreeGenerator(
        z_dim=8, planes=8, tree_shapes=((1, 1),) * 4,
        branches=(3,), stage_attention=True, stage_gamma=(0.1, 0.1),
    )


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_train_step_through_attention(monkeypatch, impl):
    monkeypatch.setenv("GAN_TPU_ATTN_IMPL", impl)
    g = _tiny_attention_g()
    d = build_discriminator("D3_wgangp", ndf=8)
    obj = get_objective("wgansn")  # first-order objective (no penalties)
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=2,
                         image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batch = jax.random.normal(rng, (2, 64, 64, 3))
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(list(vals.values()))), vals
    # stash for the cross-impl comparison below
    _RESULTS[impl] = vals


_RESULTS = {}


def test_impls_agree():
    if len(_RESULTS) == 2:
        for k in _RESULTS["einsum"]:
            np.testing.assert_allclose(
                _RESULTS["pallas"][k], _RESULTS["einsum"][k],
                rtol=1e-4, atol=1e-5)
