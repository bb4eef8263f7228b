"""Profile the jitted train step: FLOP/byte cost analysis + measured wall
time -> achieved FLOP/s, written to docs/evidence/step_profile.json.

Run after the compile cache is warm (tools/prewarm_bench.py), e.g.:
    python tools/profile_step.py                 # flagship, batch 16
    BENCH_DTYPE=bf16 python tools/profile_step.py
    PROFILE_PAIR=small python tools/profile_step.py   # G2+D3 pair
    PROFILE_TRACE=1 python tools/profile_step.py      # + Perfetto trace

SURVEY.md SS5.1: the reference has no profiling at all; this is the
tracing/FLOP-reporting subsystem built for the rebuild.
"""

import json
import os
import sys
import time

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
    dtype_name = os.environ.get("BENCH_DTYPE", "f32")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None

    if os.environ.get("PROFILE_PAIR") == "small":
        from gan_tpu.models import build_generator, build_discriminator

        g = build_generator("G2", dtype=dtype)
        d = build_discriminator("D3_wgangp", dtype=dtype)
        g_name, d_name = "G2", "D3_wgangp"
    else:
        g, d, g_name, d_name = _flagship(tiny=False, dtype=dtype)

    obj = get_objective("wganlazygpR2")
    # mirror bench.py exactly (same program -> compile-cache hit): the flat
    # optimizer OOMs XLA layout padding at flagship scale
    flagship = os.environ.get("PROFILE_PAIR") != "small"
    g_tx, d_tx = obj.make_optimizers(flat=not flagship)
    rng = jax.random.PRNGKey(0)
    state = create_state(rng, g, d, g_tx, d_tx, batch_size=batch_size,
                         image_size=(64, 64, 3))
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batch = jax.random.normal(rng, (batch_size, 64, 64, 3))

    report = {
        "pair": f"{g_name}+{d_name}",
        "objective": "wganlazygpR2",
        "batch": batch_size,
        "dtype": dtype_name,
        "device": str(jax.devices()[0].device_kind),
    }

    # cost analysis per compiled variant (penalties on = the heavy one)
    for name, fn, args in [
        ("with_penalties", step.with_penalties,
         (state, batch, jax.random.PRNGKey(1))),
        ("without_penalties", step.without_penalties,
         (state, batch, jax.random.PRNGKey(2))),
    ]:
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
            bytes_ = float(ca.get("bytes accessed", 0.0))
        except Exception:
            flops = bytes_ = 0.0
        report[name] = {"flops": flops, "bytes_accessed": bytes_}

    # measured step times (donated state: rebuild between variants)
    def timed(n=10):
        # jax.block_until_ready is NOT a completion barrier over the axon
        # relay (bench.py docstring); only a device->host VALUE fetch is.
        nonlocal state
        s, m = step(state, batch, jax.random.PRNGKey(3), 0)   # pen
        s, m = step(s, batch, jax.random.PRNGKey(4), 1)       # nopen
        jax.device_get(m)
        # absorb the one-time first-dispatch session cost (bench.py)
        s, m = step(s, batch, jax.random.PRNGKey(1000), 0)
        jax.device_get(m)
        times = {"with_penalties": [], "without_penalties": []}
        for i in range(n):
            idx = i % obj.lazy_interval
            t0 = time.perf_counter()
            s, m = step(s, batch, jax.random.PRNGKey(5 + i), idx)
            jax.device_get(m)
            key = "with_penalties" if idx == 0 else "without_penalties"
            times[key].append(time.perf_counter() - t0)
        state = s
        return {k: (min(v) if v else None) for k, v in times.items()}

    t = timed()
    for k in ("with_penalties", "without_penalties"):
        if t[k]:
            report[k]["sec_per_step"] = round(t[k], 5)
            if report[k]["flops"]:
                report[k]["achieved_tflops"] = round(
                    report[k]["flops"] / t[k] / 1e12, 2)
            if report[k]["bytes_accessed"]:
                report[k]["achieved_hbm_gbps"] = round(
                    report[k]["bytes_accessed"] / t[k] / 1e9, 1)
    k_int = obj.lazy_interval
    if t["with_penalties"] and t["without_penalties"]:
        avg = (t["with_penalties"] + (k_int - 1) * t["without_penalties"]) / k_int
        report["images_per_sec_cadence_avg"] = round(batch_size / avg, 2)

    if os.environ.get("PROFILE_TRACE") == "1":
        trace_dir = "/tmp/gan_tpu_trace"
        perfetto = os.environ.get("PROFILE_PERFETTO") == "1"
        with jax.profiler.trace(trace_dir, create_perfetto_trace=perfetto):
            s, m = step(state, batch, jax.random.PRNGKey(99), 0)
            jax.device_get(m)  # value fetch: the only reliable barrier here
        report["trace_dir"] = trace_dir

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence", "step_profile.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    suffix = "" if os.environ.get("PROFILE_PAIR") != "small" else "_small"
    out = out.replace(".json", f"{suffix}_{dtype_name}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
