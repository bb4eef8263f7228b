"""End-to-end train-step tests across the objective family (tiny models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.models.generators import Generator1
from gan_tpu.models.discriminators import (
    Discriminator1,
    Discriminator3WGANGP,
    Discriminator3WGANGPSN,
)
from gan_tpu.objectives import get_objective, OBJECTIVES
from gan_tpu.train import create_state, build_train_step


def _tiny(obj_name):
    g = Generator1(z_dim=16, image_size=(64, 64, 3))
    if "sn" in obj_name and "lazy" not in obj_name:
        d = Discriminator3WGANGPSN(ndf=4)
    elif obj_name in ("gan", "ganR2"):
        d = Discriminator1()
    else:
        d = Discriminator3WGANGP(ndf=4)
    return g, d


@pytest.mark.parametrize("obj_name", sorted(OBJECTIVES))
def test_objective_step_runs_and_updates(obj_name):
    obj = get_objective(obj_name)
    g, d = _tiny(obj_name)
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=4, image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=False)
    batch = jax.random.normal(rng, (4, 64, 64, 3))

    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)

    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"{obj_name}: {k} not finite"
    assert not np.allclose(g0, jax.tree_util.tree_leaves(state.g_params)[0])
    assert not np.allclose(d0, jax.tree_util.tree_leaves(state.d_params)[0])
    assert int(state.step) == 1

    # lazy objectives: off-cadence step skips penalties
    if obj.lazy_interval > 1:
        state, metrics = step(state, batch, jax.random.PRNGKey(2), 1)
        assert float(metrics["gp"]) == 0.0
        assert float(metrics["r1"]) == 0.0


def test_weight_clip_enforced():
    obj = get_objective("wgan")
    g, d = _tiny("wgan")
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=4, image_size=(64, 64, 3))
    # blow up a weight beyond the clip range
    leaves, treedef = jax.tree_util.tree_flatten(state.d_params)
    leaves[0] = leaves[0] + 50.0
    state = state.replace(d_params=jax.tree_util.tree_unflatten(treedef, leaves))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=False)
    batch = jax.random.normal(rng, (4, 64, 64, 3))
    state, _ = step(state, batch, jax.random.PRNGKey(1), 0)
    for leaf in jax.tree_util.tree_leaves(state.d_params):
        assert float(jnp.abs(leaf).max()) <= 1.0 + 1e-6


def test_spectral_state_updates():
    obj = get_objective("wgansn")
    g = Generator1(z_dim=16, image_size=(64, 64, 3))
    d = Discriminator3WGANGPSN(ndf=4)
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=4, image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=False)
    batch = jax.random.normal(rng, (4, 64, 64, 3))
    u0 = jax.tree_util.tree_leaves(state.d_state["spectral"])[0].copy()
    state, _ = step(state, batch, jax.random.PRNGKey(1), 0)
    u1 = jax.tree_util.tree_leaves(state.d_state["spectral"])[0]
    assert not np.allclose(u0, u1)
    # u is normalized after the power iteration
    np.testing.assert_allclose(float(jnp.linalg.norm(u1)), 1.0, rtol=1e-4)


def test_determinism():
    """Same seed -> bitwise-identical step results."""
    obj = get_objective("wgangp")
    g, d = _tiny("wgangp")
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)

    def run():
        state = create_state(rng, g, d, g_tx, d_tx, batch_size=4, image_size=(64, 64, 3))
        step = build_train_step(g, d, obj, g_tx, d_tx, jit=False)
        batch = jax.random.normal(rng, (4, 64, 64, 3))
        state, metrics = step(state, batch, jax.random.PRNGKey(7), 0)
        return metrics

    m1, m2 = run(), run()
    for k in m1:
        assert float(m1[k]) == float(m2[k])


def test_cadence_matches_individual_steps():
    """One jitted cadence dispatch == k individual step calls (same keys)."""
    obj = get_objective("wganlazygpR2")
    g, d = _tiny("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers()
    rng = jax.random.PRNGKey(0)
    k = obj.lazy_interval
    state_a = create_state(rng, g, d, g_tx, d_tx, batch_size=4,
                           image_size=(64, 64, 3))
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batches = jax.random.normal(rng, (k, 4, 64, 64, 3))
    keys = jax.random.split(jax.random.PRNGKey(7), k)

    for i in range(k):
        state_a, m = step(state_a, batches[i], keys[i], i)
    state_b, ms = step.cadence(state_b, batches, keys)

    assert int(state_b.step) == k
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.g_params),
                      jax.tree_util.tree_leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.d_params),
                      jax.tree_util.tree_leaves(state_b.d_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)
    # stacked metrics: penalty terms only on step 0
    gp = np.asarray(ms["gp"])
    assert gp.shape[0] == k and gp[0] != 0.0 and np.all(gp[1:] == 0.0)
