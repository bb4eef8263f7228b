"""Persistent XLA compilation cache.

The deep zoo models produce 100k+ HLO-op step graphs; compiles take tens of
minutes (SURVEY.md SS7 hard part 4). The persistent cache makes that a
one-time cost per (program, topology): later processes (benchmarks, resumed
runs) load the compiled executable in seconds.
"""

import os


def enable_compilation_cache(cache_dir: str = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "GAN_TPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    if cache_dir in ("0", "off", "none"):
        # explicit opt-out: single-process runs (the multichip dryrun)
        # gain nothing from persistence, and XLA:CPU AOT reloads spew
        # machine-feature validation errors (MULTICHIP_r03 tail)
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir


def fast_compile_options() -> dict:
    """Compiler options biasing XLA toward compile speed for the deep zoo
    models' 100k-op step graphs (single-core compile host). Gated by
    GAN_TPU_FAST_COMPILE (default on); disable for maximum-quality codegen.
    """
    if os.environ.get("GAN_TPU_FAST_COMPILE", "1") != "1":
        return {}
    # names validated against this environment's PJRT: bare (unprefixed)
    # effort fields are accepted; xla_/xla_tpu_-prefixed variants crash the
    # compile helper.
    # GAN_TPU_MEM_EFFORT overrides memory_fitting_effort alone (measured on
    # the b20 flagship g-program: -1.0 -> 15.88G, default -> 16.60G; a
    # higher effort is the knob when a program misses HBM by ~100s of MB).
    return {
        "exec_time_optimization_effort": -1.0,
        "memory_fitting_effort": float(
            os.environ.get("GAN_TPU_MEM_EFFORT", "-1.0")),
    }
