"""finite_guard + profiling utility tests (tiny, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.utils.guards import finite_guard
from gan_tpu.utils.profiling import StepTimer, cost_analysis


def test_finite_guard_passes_good_steps():
    def step(state, batch, rng):
        return state + 1.0, {"loss": jnp.sum(batch)}

    guarded = finite_guard(step)
    state, m = guarded(jnp.zeros(3), jnp.ones(2), None)
    np.testing.assert_array_equal(np.asarray(state), [1, 1, 1])
    assert float(m["skipped"]) == 0.0


def test_finite_guard_skips_nan_steps():
    def step(state, batch, rng):
        return state + 100.0, {"loss": jnp.float32(jnp.nan)}

    guarded = finite_guard(step)
    state0 = jnp.zeros(3)
    state, m = guarded(state0, jnp.ones(2), None)
    np.testing.assert_array_equal(np.asarray(state), np.asarray(state0))
    assert float(m["skipped"]) == 1.0


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((4,))
    t.start(sync_on=x)
    t.count(32)
    ips = t.stop(sync_on=x)
    assert ips > 0


def test_cost_analysis_reports_flops():
    f = jax.jit(lambda a, b: a @ b)
    costs = cost_analysis(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert isinstance(costs, dict)
    # flops key present on CPU/TPU backends (value backend-dependent)
    assert any("flops" in k for k in costs) or costs == {}