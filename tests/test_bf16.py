"""bf16 compute policy: params/optimizer stay f32, training stays finite,
and trajectories track f32 closely on the small pair (the full validation
lives in docs/STATUS.md; this is the regression guard)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.models import build_generator, build_discriminator
from gan_tpu.objectives import get_objective
from gan_tpu.train import create_state, build_train_step


def _run(dtype, steps=8):
    g = build_generator("G1", z_dim=16, dtype=dtype)
    d = build_discriminator("D1", dtype=dtype)
    obj = get_objective("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=4,
                         image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batch = jax.random.normal(rng, (4, 64, 64, 3))
    ms = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.PRNGKey(1 + i), i)
        ms.append({k: float(v) for k, v in m.items()})
    return state, ms


def test_bf16_params_stay_f32_and_losses_finite():
    state, ms = _run(jnp.bfloat16)
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
    for m in ms:
        assert all(np.isfinite(list(m.values()))), m


def test_bf16_tracks_f32():
    _, m32 = _run(None)
    _, m16 = _run(jnp.bfloat16)
    # same-seed trajectories agree loosely (bf16 rounding compounds)
    a = np.array([m["g_loss"] for m in m32])
    b = np.array([m["g_loss"] for m in m16])
    scale = max(1.0, float(np.abs(a).max()))
    assert np.max(np.abs(a - b)) / scale < 0.1
