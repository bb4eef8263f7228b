"""Flat-vector optimizer adapter.

The zoo's deep models have thousands of small parameter leaves
(SURVEY.md SS7 hard part 4 — e.g. G13_5 has ~2.9k leaves). Per-leaf optax
updates emit ~12 HLO ops per leaf, which dominates XLA compile time and
kernel-launch overhead. This adapter ravels the param/grad pytrees into one
1-D vector, runs the (elementwise) optimizer once, and unravels the update:
O(leaves) reshapes/concats instead of O(leaves * ops_per_update).

Valid for any purely-elementwise transformation (adam, adamw, sgd, clip);
exactly the reference's optimizer family (trainunits.py:18-19, wgan.py:17-18).

SIZE GUARD: above ~100M params XLA assigns the unravel split a padded
(N/3, 3)-tiled layout whose allocation OOMs at COMPILE time (measured on
the flagship: `f32[120795728,3]{T(8,128)}` wants 61.8 GB — exactly
g_param_count/3 rows x 128 padded lanes; the failed endurance run,
runs/endurance_r3.log 2026-08-21). bench.py always disabled flat for the
flagship, but any Trainer-driven flagship run hit the OOM unless
GAN_TPU_FLAT_OPT=0 was exported by hand. The wrapper now decides AT INIT
from the actual param count and falls back to per-leaf updates beyond
GAN_TPU_FLAT_OPT_MAX (default 100e6); update() dispatches on the state
type, so either mode checkpoints/restores consistently.
"""

import os
from typing import NamedTuple

import jax
import jax.flatten_util
import optax


class FlatState(NamedTuple):
    inner: optax.OptState


def _max_flat_params() -> int:
    return int(float(os.environ.get("GAN_TPU_FLAT_OPT_MAX", "100e6")))


def flatten_optimizer(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    def init(params):
        n = sum(l.size for l in jax.tree_util.tree_leaves(params))
        if n > _max_flat_params():
            return tx.init(params)  # per-leaf mode (layout-OOM guard)
        vec, _ = jax.flatten_util.ravel_pytree(params)
        return FlatState(inner=tx.init(vec))

    def update(grads, state, params=None):
        if not isinstance(state, FlatState):  # per-leaf mode
            return tx.update(grads, state, params)
        gvec, unravel = jax.flatten_util.ravel_pytree(grads)
        pvec = None
        if params is not None:
            pvec, _ = jax.flatten_util.ravel_pytree(params)
        upd, inner = tx.update(gvec, state.inner, pvec)
        return unravel(upd), FlatState(inner=inner)

    return optax.GradientTransformation(init, update)
