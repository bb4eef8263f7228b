"""The single step-state pytree.

Replaces the reference's scattered mutable state — module objects, optimizer
objects, SN parametrization buffers, BN running stats, and the epoch/iter
counters carried on the Units trainer (/root/reference/train/trainunits.py:
12-26) — with one explicit, checkpointable pytree (SURVEY.md SS7 hard part 5).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GANTrainState:
    step: jax.Array            # global step counter (int32)
    g_params: Any
    g_state: Any               # G mutable collections (batch_stats, ...)
    d_params: Any
    d_state: Any               # D mutable collections (batch_stats, spectral)
    g_opt: Any
    d_opt: Any


def _split_vars(variables):
    variables = dict(variables)
    params = variables.pop("params")
    return params, variables


def create_state(
    rng: jax.Array,
    g_model,
    d_model,
    g_tx,
    d_tx,
    batch_size: int = 8,
    image_size=(64, 64, 3),
    init_on_cpu: bool = True,
) -> GANTrainState:
    """Initialize both networks and optimizers into one state pytree.

    init_on_cpu: run the (eager) init on the host CPU backend and transfer
    once. The deep zoo models have thousands of modules; eager per-op
    dispatch to a remote accelerator during init takes tens of minutes,
    while CPU eager init is seconds (SURVEY.md SS7 hard part 4).
    """
    import contextlib

    cpu = None
    if init_on_cpu and jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        kg, kd, kn = jax.random.split(rng, 3)
        z = jnp.zeros((batch_size, g_model.z_dim), jnp.float32)
        x = jnp.zeros((batch_size, *image_size), jnp.float32)
        g_vars = g_model.init({"params": kg, "noise": kn}, z, train=True)
        d_vars = d_model.init({"params": kd}, x, train=True, update_sn=False)
        g_params, g_state = _split_vars(g_vars)
        d_params, d_state = _split_vars(d_vars)
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_state=g_state,
            d_params=d_params,
            d_state=d_state,
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
        )
    if cpu is not None:
        state = jax.device_put(state, jax.devices()[0])
        state = jax.block_until_ready(state)
    return state
