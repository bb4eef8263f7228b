"""Compare compiled HBM footprints of the flagship step across RiR pair
layouts / batch sizes / dtypes (XLA memory_analysis of the pen variant).

Usage:
    BENCH_DTYPE=bf16 BENCH_BATCH=16 GAN_TPU_RIR_IMPL=folded \
        python tools/memory_probe.py [pen|nopen]

Lowers from ABSTRACT shapes (no state materialization — the
tools/compile_step.py pattern) and compiles (cache hit if prewarmed).
Prints argument/output/temp/total bytes; the v5e budget is ~15.75 GB
usable HBM — docs/STATUS.md tracks which (batch, dtype, impl) fit.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pen"
    import jax
    import jax.numpy as jnp

    from gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import build_train_step
    from gan_tpu.train.state import GANTrainState, _split_vars
    from __graft_entry__ import _flagship

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None

    g, d, g_name, d_name = _flagship(tiny=False, dtype=dtype)
    obj = get_objective("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers(flat=False)

    def build(rng_):
        kg, kd, kn = jax.random.split(rng_, 3)
        z = jnp.zeros((batch_size, g.z_dim), jnp.float32)
        x = jnp.zeros((batch_size, 64, 64, 3), jnp.float32)
        g_vars = g.init({"params": kg, "noise": kn}, z, train=True)
        d_vars = d.init({"params": kd}, x, train=True, update_sn=False)
        g_params, g_state = _split_vars(g_vars)
        d_params, d_state = _split_vars(d_vars)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
        )

    state_abs = jax.eval_shape(build, jax.random.PRNGKey(0))
    batch_abs = jax.ShapeDtypeStruct((batch_size, 64, 64, 3), jnp.float32)
    rng_abs = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    parts = step.parts(which)
    if parts:  # split-step mode: one report per sub-program
        fns = list(parts.items())
    else:
        fns = [(None, step.with_penalties if which == "pen"
                else step.without_penalties)]
    for sub, fn in fns:
        compiled = fn.lower(state_abs, batch_abs, rng_abs).compile()
        ma = compiled.memory_analysis()
        rep = {
            "pair": f"{g_name}+{d_name}",
            "variant": which if sub is None else f"{which}:{sub}",
            "batch": batch_size,
            "dtype": dtype_name,
            "rir_impl": os.environ.get("GAN_TPU_RIR_IMPL", "(default)"),
            "remat": os.environ.get("GAN_TPU_REMAT", "(default)"),
        }
        total = 0
        for f in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
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
