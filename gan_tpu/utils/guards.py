"""Failure detection (SURVEY.md SS5.3 — absent upstream: the reference's
only note is a NaN-fragility comment in discriminator_5_wgangpsn.py:85).

- finite_guard: wraps a train step; if any metric is non-finite the update
  is skipped (previous state returned) and a counter increments. The check
  stays on-device (lax.cond-free select) so no extra sync is introduced.
- debug_nans(): enables jax's nan debugging for interactive hunts.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def finite_guard(step_fn: Callable) -> Callable:
    """Wrap (state, batch, rng) -> (state, metrics) so non-finite metrics
    skip the update. Adds metrics['skipped'] (0/1)."""

    def guarded(state, batch, rng, *args, **kwargs):
        new_state, metrics = step_fn(state, batch, rng, *args, **kwargs)
        ok = jnp.all(
            jnp.stack([jnp.isfinite(v).all() for v in metrics.values()])
        )
        out_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_state, state
        )
        metrics = dict(metrics)
        metrics["skipped"] = (~ok).astype(jnp.float32)
        return out_state, metrics

    return guarded


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
