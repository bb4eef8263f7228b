"""Tracing / profiling hooks (SURVEY.md SS5.1 — absent upstream).

- trace(): context manager around N steps -> TensorBoard/Perfetto trace dir
- StepTimer: images/sec with block_until_ready
- cost_analysis(): XLA FLOP estimate for a jitted function
"""

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gan_tpu_trace"):
    """jax.profiler trace around a block; view with TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput harness: images/sec/chip with proper device sync."""

    def __init__(self):
        self.n_images = 0
        self._t0: Optional[float] = None

    def start(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._t0 = time.perf_counter()
        self.n_images = 0

    def count(self, n: int):
        self.n_images += n

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        chips = jax.device_count()
        return self.n_images / dt / chips


def cost_analysis(jitted_fn, *args, **kwargs):
    """FLOP/byte estimates from XLA for a jitted function."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return dict(costs or {})
