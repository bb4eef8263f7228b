"""Headline benchmark: images/sec/chip for the flagship pair under the
thesis objective (wganlazygpR2), 64x64.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Structure (round-2 fix: BENCH_r01 was a silent rc=124 timeout): the parent
process is a jax-free supervisor enforcing a wall-clock budget
(BENCH_BUDGET seconds, default 1200). The measurement runs in a child
process (BENCH_INNER=1). If the flagship attempt times out or fails, the
supervisor retries with the small warm pair (G2+D3) in the remaining
budget, and if that also fails it STILL prints the JSON line (value 0.0,
metric explaining the failure) — the driver always gets parseable output.

vs_baseline: ratio vs the PyTorch reference implementation measured on this
host (stored in BENCH_BASELINE.json by tools/measure_reference.py; the
reference publishes no throughput numbers — BASELINE.md). If no stored
baseline exists, vs_baseline is 0.0.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))


RESOLVED = None  # (batch_size, dtype_name) the last _measure() warmed


def _measure():
    import jax
    import jax.numpy as jnp

    # Testability on a busy/absent TPU: BENCH_PLATFORM=cpu forces the CPU
    # backend in-process (shell-level JAX_PLATFORMS is ignored under the
    # pinned axon platform).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step
    from __graft_entry__ import _flagship

    # Flagship (G13_5+D9_4) step compiles take tens of minutes on the
    # remote compile service. tools/prewarm_bench.py leaves a marker
    # (BENCH_WARM_b{batch}[_bf16]) once the persistent cache holds the
    # flagship program; without one (and without BENCH_FORCE_FLAGSHIP=1)
    # we bench the largest warm pair instead and say so in the metric name.
    cache_dir = os.environ.get(
        "GAN_TPU_COMPILE_CACHE", os.path.join(_REPO, ".jax_cache")
    )

    # batch/dtype: explicit BENCH_BATCH / BENCH_DTYPE win; otherwise scan
    # for prewarmed flagship markers (prefer bf16, then larger batch —
    # bf16 trains within ~1% of the f32 loss trajectory with f32
    # params/optimizer; see docs/STATUS.md). Note the flagship f32 step
    # does not fit HBM at batch 16 (lane padding at C=48, 64x64); the
    # reference's own committed batch size is 8 (main.py:28).
    import glob
    import re

    req_batch = os.environ.get("BENCH_BATCH")
    req_dtype = os.environ.get("BENCH_DTYPE", "auto")

    def _marker(bs, dt):
        sfx = "" if dt == "f32" else f"_{dt}"
        return os.path.join(cache_dir, f"BENCH_WARM_b{bs}{sfx}")

    found = []  # (bs, dtype_name)
    for p in glob.glob(os.path.join(cache_dir, "BENCH_WARM_b*")):
        m = re.fullmatch(r"BENCH_WARM_b(\d+)(?:_(\w+))?", os.path.basename(p))
        if m:
            found.append((int(m.group(1)), m.group(2) or "f32"))
    if req_batch is not None:
        found = [f for f in found if f[0] == int(req_batch)]
    if req_dtype != "auto":
        found = [f for f in found if f[1] == req_dtype]
    found.sort(key=lambda f: (f[1] == "bf16", f[0]), reverse=True)

    if found:
        batch_size, dtype_name = found[0]
    else:
        batch_size = int(req_batch) if req_batch is not None else 16
        dtype_name = req_dtype if req_dtype != "auto" else "f32"
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    marker = _marker(batch_size, dtype_name)
    # what this run actually warms — tools/prewarm_bench.py writes its
    # marker from this, not from raw env defaults (ADVICE r2: an existing
    # bf16 marker can steer the scan away from the env-default pair)
    global RESOLVED
    RESOLVED = (batch_size, dtype_name)

    # flags sidecar: a prewarmed program may be a non-default lever config
    # (style bank / folded pairs / pool matmul / split step — see
    # docs/STATUS.md). The prewarm writes BENCH_WARM_*.flags with the env
    # it compiled under; apply it (explicit env still wins) so bench runs
    # the program the cache actually holds.
    try:
        with open(marker + ".flags") as f:
            for k, v in (json.load(f).get("env") or {}).items():
                if k.startswith("GAN_TPU_"):
                    os.environ.setdefault(k, str(v))
    except (OSError, ValueError):
        pass

    use_flagship = (
        os.environ.get("BENCH_FORCE_FALLBACK") != "1"
        and (os.environ.get("BENCH_FORCE_FLAGSHIP") == "1"
             or os.path.exists(marker))
    )
    if use_flagship:
        g, d, g_name, d_name = _flagship(tiny=False, dtype=dtype)
    else:
        from gan_tpu.models import build_generator, build_discriminator

        g_name, d_name = "G2", "D3_wgangp"
        g = build_generator(g_name, dtype=dtype)
        d = build_discriminator(d_name, dtype=dtype)
    t_start = time.perf_counter()

    def mark(stage):
        # stage timing on stderr: the flagship attempt's wall cost is
        # dominated by init-blob load + executable load + the relay's
        # one-time session cost, not the timed steps — this shows where
        print(f"# t+{time.perf_counter() - t_start:7.1f}s {stage}",
              file=sys.stderr, flush=True)

    obj = get_objective("wganlazygpR2")
    # flat optimizer OOMs XLA layout-padding at flagship scale (see
    # Objective.make_optimizers docstring)
    g_tx, d_tx = obj.make_optimizers(flat=not use_flagship)
    image_size = (64, 64, 3)
    rng = jax.random.PRNGKey(0)
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)

    # Overlap the two dominant cold-start costs (BENCH_r03 stage marks:
    # init-blob load ~3 min, executable trace+load ~9 min over the relay,
    # strictly serialized there -> timeout): create_state runs in a
    # background thread while the main thread AOT-lowers/compiles the step
    # programs against an abstract state (train/state.abstract_state — no
    # real buffers needed). The AOT path produces the SAME cache key as
    # the jit dispatch path (verified live on a small program), so the
    # prewarmed executables load, not recompile.
    #
    # DEFAULT OFF: at flagship scale the two threads' CONCURRENT relay
    # calls (device_put/opt_init vs executable load) wedged the relay
    # session permanently (r4: CPU frozen 40+ min at the same tick, both
    # threads in socket wait — the same failure mode CLAUDE.md records
    # for concurrent axon processes). Until the relay tolerates it, the
    # safe win is smaller programs (split-step lever), not concurrency.
    overlap = os.environ.get("BENCH_OVERLAP", "0") == "1"
    aot_ok = False
    mark(f"start create_state ({g_name}+{d_name} b{batch_size} {dtype_name})"
         + (" [background]" if overlap else ""))
    if overlap:
        import threading

        from gan_tpu.train.state import abstract_state

        box = {}

        def _load_state():
            try:
                box["state"] = create_state(
                    rng, g, d, g_tx, d_tx, batch_size=batch_size,
                    image_size=image_size)
            except BaseException as e:  # surface in the main thread
                box["err"] = e

        th = threading.Thread(target=_load_state, daemon=True)
        th.start()
        try:
            ab = abstract_state(g, d, g_tx, d_tx, batch_size=batch_size,
                                image_size=image_size)
            b_aval = jax.ShapeDtypeStruct((batch_size, *image_size),
                                          jnp.float32)
            k_aval = jax.eval_shape(lambda: jax.random.PRNGKey(0))
            if step.parts_map:  # split-step lever: three sub-programs
                parts = {}
                for variant, fns in step.parts_map.items():
                    parts[variant] = {
                        nm: fn.lower(ab, b_aval, k_aval).compile()
                        for nm, fn in fns.items()
                    }
                    mark(f"{variant} split executables ready (AOT)")

                def _chain(d_fn, g_fn):
                    def run(s, bb, r):
                        s, dm = d_fn(s, bb, r)
                        s, gm = g_fn(s, bb, r)
                        return s, {**dm, **gm}

                    return run

                step = step._replace(
                    with_penalties=_chain(parts["pen"]["d"],
                                          parts["pen"]["g"]),
                    without_penalties=_chain(parts["nopen"]["d"],
                                             parts["nopen"]["g"]),
                )
            else:
                pen_l = step.with_penalties.lower(ab, b_aval, k_aval)
                mark("pen lowered (AOT)")
                pen_c = pen_l.compile()
                mark("pen executable ready (AOT)")
                nopen_l = step.without_penalties.lower(ab, b_aval, k_aval)
                mark("nopen lowered (AOT)")
                nopen_c = nopen_l.compile()
                mark("nopen executable ready (AOT)")
                step = step._replace(with_penalties=pen_c,
                                     without_penalties=nopen_c)
            aot_ok = True
        except Exception as e:
            print(f"# AOT overlap failed ({type(e).__name__}: {e}); "
                  "falling back to jit dispatch", file=sys.stderr)
        th.join()
        if "err" in box:
            raise box["err"]
        state = box["state"]
        if not aot_ok:  # rebuild untouched step pair (jit dispatch path)
            step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    else:
        state = create_state(rng, g, d, g_tx, d_tx, batch_size=batch_size,
                             image_size=image_size)
    mark("state ready")
    batch = jax.random.normal(rng, (batch_size, *image_size))

    # warmup/compile both variants. NOTE: jax.block_until_ready is NOT a
    # reliable completion barrier over the axon relay (measured: a 15 TFLOP
    # step "completes" in 0.067 s < peak-FLOP lower bound); a device->host
    # VALUE fetch is. Metrics chain through the donated state, so fetching
    # m proves every prior step executed.
    state, m = step(state, batch, jax.random.PRNGKey(1), 0)
    mark("pen step dispatched (compile/load)")
    state, m = step(state, batch, jax.random.PRNGKey(2), 1)
    mark("nopen step dispatched (compile/load)")
    jax.device_get(m)  # true barrier: drains compile/load + warmup steps
    mark("warmup fetched")

    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    # materialize per-step keys OUTSIDE the timed region: under the axon
    # relay every eager op (even a cached PRNGKey build) is a host->service
    # round trip that would otherwise serialize into the step loop
    debug = os.environ.get("BENCH_DEBUG") == "1"
    use_cadence = os.environ.get("BENCH_CADENCE") == "1"
    if use_cadence:
        # one dispatch per lazy interval: the k-step on-device cadence
        # program (train/step.py TrainStep.cadence)
        k = obj.lazy_interval
        n_calls = max(1, n_steps // k)
        n_steps = n_calls * k
        batches = jnp.stack([batch] * k)
        key_stacks = [jax.random.split(jax.random.PRNGKey(100 + j), k)
                      for j in range(n_calls)]
        jax.block_until_ready(key_stacks)
        try:
            # compile/load the cadence program (pen + scanned nopen body;
            # ~1.7x the single-step graph — may exceed the remote compile
            # helper's memory budget at flagship scale)
            state, ms = step.cadence(state, batches, jax.random.split(
                jax.random.PRNGKey(99), k))
            jax.device_get(ms)
        except Exception as e:
            print(f"# cadence compile failed ({type(e).__name__}); "
                  "falling back to per-step dispatch", file=sys.stderr)
            use_cadence = False
    if use_cadence:
        t0 = time.perf_counter()
        tprev = t0
        for j in range(n_calls):
            state, ms = step.cadence(state, batches, key_stacks[j])
            if debug:
                jax.device_get(ms)
                tnow = time.perf_counter()
                print(f"# cadence call {j} ({k} steps): {tnow - tprev:.3f}s",
                      file=sys.stderr)
                tprev = tnow
        jax.device_get(ms)  # value fetch = proof of completion
        dt = time.perf_counter() - t0
    else:
        keys = [jax.random.PRNGKey(3 + i) for i in range(n_steps)]
        jax.block_until_ready(keys)
        # one more fetched penalty step right before the timed region: the
        # first dispatch after warmup/eager-op batches pays a one-time
        # ~200s session cost on this relay (measured: timed step 0 took
        # 223 s with warm executables; every later pen step 1.1 s)
        state, m = step(state, batch, jax.random.PRNGKey(2**30), 0)
        jax.device_get(m)
        t0 = time.perf_counter()
        tprev = t0
        for i in range(n_steps):
            state, m = step(state, batch, keys[i], i)
            if debug:
                jax.device_get(m)
                tnow = time.perf_counter()
                print(f"# step {i} ({'pen' if i % 5 == 0 else 'nopen'}): "
                      f"{tnow - tprev:.3f}s", file=sys.stderr)
                tprev = tnow
        jax.device_get(m)  # value fetch = proof of completion of all steps
        dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    ips = batch_size * n_steps / dt / n_chips

    baseline = 0.0
    try:
        with open(os.path.join(_REPO, "BENCH_BASELINE.json")) as f:
            blob = json.load(f)
        # compare like with like: the flagship bench uses the measured
        # flagship (G13_5+D9_4) reference throughput when available
        # (tools/measure_reference.py flagship), else the fallback pair's
        if use_flagship:
            baseline = float(blob.get("reference_images_per_sec_flagship", 0.0))
        if baseline <= 0:
            baseline = float(blob.get("reference_images_per_sec", 0.0))
    except (OSError, ValueError):
        pass
    vs = ips / baseline if baseline > 0 else 0.0

    result = {
        "metric": f"images/sec/chip (64x64, {g_name}+{d_name} wganlazygpR2, "
                  f"batch {batch_size}, {dtype_name}"
                  f"{', cadence' if use_cadence else ''})",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(result))
    # NOTE: deliberately no warm-marker write here — a measurement tool
    # must not mutate the cache state it trusts (tools/prewarm_bench.py
    # owns the markers).
    return result


def _attempt(extra_env: dict, timeout_s: float):
    """Run the measurement child; return the parsed JSON dict or None."""
    import subprocess

    env = dict(os.environ)
    env.update(extra_env)
    env["BENCH_INNER"] = "1"
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=_REPO, timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as e:
        for s in (e.stderr, e.stdout):
            if s:
                txt = s.decode() if isinstance(s, bytes) else s
                sys.stderr.write(txt[-2000:])
        sys.stderr.write(f"\n# bench attempt timed out after {timeout_s:.0f}s\n")
        return None
    if res.stderr:
        sys.stderr.write(res.stderr[-4000:])
    if res.returncode != 0:
        sys.stderr.write(f"# bench attempt failed rc={res.returncode}\n")
        return None
    for line in reversed(res.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                pass
    return None


def _cache_entries():
    """The LARGE persistent-cache executables (>50 MB — flagship-scale
    programs; small test programs are irrelevant)."""
    import glob

    cache_dir = os.environ.get(
        "GAN_TPU_COMPILE_CACHE", os.path.join(_REPO, ".jax_cache"))
    return sorted(
        [os.path.basename(p), os.path.getsize(p)]
        for p in glob.glob(os.path.join(cache_dir, "jit_*"))
        if os.path.getsize(p) > 50_000_000
    )


def _cache_fingerprint() -> str:
    """Exact-set fingerprint (legacy; _load_measured_marker prefers the
    SUBSET check on the stored entries list — a new unrelated big program
    landing in the cache, e.g. entry()'s forward, must not invalidate a
    valid flagship number; only losing/replacing the executables that
    were present at measure time does)."""
    import hashlib

    return hashlib.sha256(repr([tuple(e) for e in _cache_entries()])
                          .encode()).hexdigest()[:16]


def _measured_marker_path() -> str:
    cache_dir = os.environ.get(
        "GAN_TPU_COMPILE_CACHE", os.path.join(_REPO, ".jax_cache"))
    return os.path.join(cache_dir, "BENCH_MEASURED.json")


def _load_measured_marker():
    """A prewarm-time measurement bench may fall back to when the live
    attempts blow the budget (relay session stalls of 183-950 s are a
    known mode, docs/evidence/). Only trusted when the cache fingerprint
    still matches — same executables, same code."""
    try:
        with open(_measured_marker_path()) as f:
            rec = json.load(f)
        ents = rec.get("entries")
        if ents is not None:
            current = {tuple(e) for e in _cache_entries()}
            if any(tuple(e) not in current for e in ents):
                return None
        elif rec.get("fingerprint") != _cache_fingerprint():
            return None
        out = rec["result"]
        out["metric"] += " [prewarm-time measurement; live attempt timed out]"
        return out
    except (OSError, ValueError, KeyError):
        return None


def main():
    if os.environ.get("BENCH_INNER") == "1":
        return _measure()
    budget = float(os.environ.get("BENCH_BUDGET", "1500"))
    t0 = time.monotonic()
    out = None
    try:
        # attempt 1: the default path (flagship if prewarmed). 0.8 share:
        # the warm flagship attempt costs ~those 1200 s end to end (2 GB
        # init blob + executable loads over the relay + the one-time
        # ~200 s first-dispatch session cost + 20 timed steps).
        out = _attempt({}, max(min(budget, 60.0), budget * 0.8))
        if out is None:
            # the flagship attempt can blow its share on relay slow modes
            # (measured: create_state 107 s one hour, 545 s the next —
            # docs/evidence/prewarm_classic_ab.log vs /tmp/v_bench.log).
            # A fingerprint-fresh prewarm-time FLAGSHIP measurement beats
            # a live small-pair number: same code, same cache, headline
            # model. Fall back to the small pair only when neither exists.
            out = _load_measured_marker()
        if out is None:
            # attempt 2: small warm pair, fewer steps, in what remains
            remaining = budget - (time.monotonic() - t0) - 10.0
            if remaining > 60.0:
                out = _attempt(
                    {"BENCH_FORCE_FALLBACK": "1",
                     "BENCH_STEPS": os.environ.get("BENCH_STEPS", "10")},
                    remaining,
                )
    except Exception as e:  # the supervisor itself must never die silently
        sys.stderr.write(f"# bench supervisor error: {type(e).__name__}: {e}\n")
    if out is None:
        out = _load_measured_marker()
        if out is not None:
            sys.stderr.write("# falling back to prewarm-time measured "
                             "marker (fingerprint-fresh)\n")
    if out is None:
        out = {
            "metric": "images/sec/chip (64x64, wganlazygpR2) — "
                      "bench budget exhausted, no measurement",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
