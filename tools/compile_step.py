"""Compile the flagship train-step programs into the persistent cache from
ABSTRACT shapes only — no 2.5 GB state materialization, no device use.

The remote tpu_compile_helper has its own memory budget; keeping this
client process tiny (eval_shape state, ShapeDtypeStruct args) gives the
helper maximal headroom. Run before bench.py/prewarm when a fresh program
needs compiling:

    BENCH_DTYPE=bf16 BENCH_BATCH=16 python tools/compile_step.py nopen
    BENCH_DTYPE=bf16 BENCH_BATCH=16 python tools/compile_step.py pen nopen
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = [a for a in sys.argv[1:] if a in ("pen", "nopen", "cadence")] or [
        "pen", "nopen"]
    import jax
    import jax.numpy as jnp

    from gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step
    from gan_tpu.train.state import GANTrainState, _split_vars
    from __graft_entry__ import _flagship

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None

    g, d, g_name, d_name = _flagship(tiny=False, dtype=dtype)
    obj = get_objective("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers(flat=False)

    # abstract state: trace the pure init (no values anywhere)
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
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    try:  # new-style typed keys: match what bench passes at runtime
        rng_abs = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    except Exception:
        pass

    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    targets = {"pen": step.with_penalties, "nopen": step.without_penalties}
    if step.cadence is not None:
        targets["cadence"] = step.cadence
    # split-step mode (GAN_TPU_SPLIT_STEP=1): compile the d/g sub-programs
    # individually (the g program is shared between pen and nopen — its
    # second compile is a cache hit)
    for v in ("pen", "nopen"):
        parts = step.parts(v)
        if parts:
            targets.pop(v, None)
            for sub, fn in parts.items():
                targets[f"{v}:{sub}"] = fn
    if which == ["pen", "nopen"] and step.parts("pen"):
        which = ["pen:d", "pen:g", "nopen:d", "nopen:g"]
    k = obj.lazy_interval
    for name in which:
        fn = targets[name]
        if name == "cadence":
            batches_abs = jax.ShapeDtypeStruct(
                (k, batch_size, 64, 64, 3), jnp.float32)
            rngs_abs = jax.eval_shape(
                lambda: jax.random.split(jax.random.PRNGKey(0), k))
            args = (state_abs, batches_abs, rngs_abs)
        else:
            args = (state_abs, batch_abs, rng_abs)
        print(f"lowering {name} ({g_name}+{d_name} b{batch_size} "
              f"{dtype_name}) ...", flush=True)
        lowered = fn.lower(*args)
        print(f"compiling {name} ...", flush=True)
        lowered.compile()
        print(f"{name}: compiled OK", flush=True)


if __name__ == "__main__":
    main()
