"""Compare compiled HBM footprints of the flagship step across RiR pair
layouts / batch sizes / dtypes (XLA memory_analysis of the pen variant).

Usage:
    BENCH_DTYPE=bf16 BENCH_BATCH=16 GAN_TPU_RIR_IMPL=folded \
        python tools/memory_probe.py

Lowers + compiles the step (cache hit if prewarmed; otherwise pays the
compile) and prints argument/output/temp/total bytes. The v5e budget is
~15.75 GB usable HBM — docs/STATUS.md tracks which (batch, dtype, impl)
combinations fit.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step
    from __graft_entry__ import _flagship

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None

    g, d, g_name, d_name = _flagship(tiny=False, dtype=dtype)
    obj = get_objective("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers(flat=False)
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=batch_size,
                         image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batch = jax.random.normal(rng, (batch_size, 64, 64, 3))

    compiled = step.with_penalties.lower(
        state, batch, jax.random.PRNGKey(1)).compile()
    ma = compiled.memory_analysis()
    fields = [
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "generated_code_size_in_bytes",
        "alias_size_in_bytes",
    ]
    rep = {
        "pair": f"{g_name}+{d_name}",
        "batch": batch_size,
        "dtype": dtype_name,
        "rir_impl": os.environ.get("GAN_TPU_RIR_IMPL", "(default)"),
    }
    total = 0
    for f in fields:
        v = getattr(ma, f, None)
        if v is not None:
            rep[f] = int(v)
            if f in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes"):
                total += int(v)
    alias = rep.get("alias_size_in_bytes", 0)
    rep["live_estimate_gb"] = round((total - alias) / 2**30, 2)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
