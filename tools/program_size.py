"""Measure the flagship step program's SIZE (MLIR bytes, op count) without
compiling it.

The axon remote compile helper is memory-capped: flagship-scale programs
over ~35 MB of MLIR get it SIGKILLed (docs/STATUS.md round-3 "perf levers"
— the folded pair layout died this way twice). Program-size reduction is
therefore a first-class perf lever: it gates the folded layout, larger
batches, and full-effort codegen. This tool is the feedback loop: it
traces + lowers the step from abstract shapes (tools/compile_step.py
pattern) on the CPU backend (no TPU tunnel lock, no remote compile) and
reports StableHLO text bytes and op counts per program variant.

CPU-lowered StableHLO is a faithful proxy for the TPU MLIR the compile
helper sees: the traced graph is platform-independent; only the final
codegen differs.

Usage:
    BENCH_BATCH=16 BENCH_DTYPE=bf16 GAN_TPU_RIR_IMPL=vmap \
        python tools/program_size.py [pen|nopen|both]
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, args, top: int = 12):
    lowered = fn.lower(*args)
    text = lowered.as_text()
    ops = collections.Counter()
    for m in re.finditer(r"=\s+(?:\"([\w.]+)\"|([\w.]+))", text):
        ops[m.group(1) or m.group(2)] += 1
    n_ops = sum(ops.values())
    return {
        "mlir_bytes": len(text),
        "mlir_mb": round(len(text) / 2**20, 2),
        "op_count": n_ops,
        "top_ops": dict(ops.most_common(top)),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pen"
    import jax

    jax.config.update("jax_platforms", "cpu")  # no TPU lock, no remote helper
    import jax.numpy as jnp

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
    base = {
        "pair": f"{g_name}+{d_name}",
        "batch": batch_size,
        "dtype": dtype_name,
        "rir_impl": os.environ.get("GAN_TPU_RIR_IMPL", "(default)"),
        "remat": os.environ.get("GAN_TPU_REMAT", "(default)"),
        "pool_impl": os.environ.get("GAN_TPU_POOL_IMPL", "(default)"),
        "split_step": os.environ.get("GAN_TPU_SPLIT_STEP", "(default)"),
        "style_bank": os.environ.get("GAN_TPU_STYLE_BANK", "(default)"),
    }
    variants = ["pen", "nopen"] if which == "both" else [which]
    for v in variants:
        fns = step.parts(v) if hasattr(step, "parts") else None
        if fns:  # split-step mode: report each sub-program
            for name, fn in fns.items():
                rep = dict(base, variant=f"{v}:{name}")
                rep.update(measure(fn, (state_abs, batch_abs, rng_abs)))
                print(json.dumps(rep))
        else:
            fn = step.with_penalties if v == "pen" else step.without_penalties
            rep = dict(base, variant=v)
            rep.update(measure(fn, (state_abs, batch_abs, rng_abs)))
            print(json.dumps(rep))


if __name__ == "__main__":
    main()
