"""Summarize a JAX perfetto trace: device-kernel time by fusion family.

Usage:
    python tools/trace_breakdown.py /tmp/gan_tpu_trace
    python tools/trace_breakdown.py path/to/perfetto_trace.json.gz

Produces the table in docs/evidence/kernel_breakdown_bf16_b16.md: total
device kernel time, per-family aggregation (trailing .NN suffixes
stripped), and a duration histogram. Complements tools/profile_step.py
(cost analysis + wall timing) — SURVEY.md SS5.1's tracing subsystem.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "perfetto_trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no perfetto_trace.json.gz under {path} "
                         "(run profile_step with PROFILE_TRACE=1 "
                         "PROFILE_PERFETTO=1)")
    return hits[-1]


def main():
    path = find_trace(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gan_tpu_trace")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"] if isinstance(data, dict) else data

    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    kern = [e for e in ev if e.get("ph") == "X" and e.get("pid") in device_pids
            and e.get("dur", 0) < 500_000]  # exclude whole-step wrappers
    if not kern:
        raise SystemExit("no device kernel events found")

    total = sum(e["dur"] for e in kern) / 1e6
    print(f"device kernel time: {total:.3f}s over {len(kern)} kernels "
          f"({path})")

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in kern:
        base = re.sub(r"[.\d]+$", "", e["name"])
        agg[base] += e["dur"]
        cnt[base] += 1
    print(f"{'total':>10}  {'count':>7}  family")
    for name, d in agg.most_common(20):
        print(f"{d / 1e3:8.1f}ms  {cnt[name]:7d}  {name}")

    buckets = [(0, 50), (50, 500), (500, 10**9)]
    parts = []
    for lo, hi in buckets:
        sel = [e["dur"] for e in kern if lo <= e["dur"] < hi]
        parts.append(f"{lo}-{hi if hi < 10**9 else 'inf'}us: "
                     f"{sum(sel) / 1e6:.3f}s x{len(sel)}")
    print("histogram: " + "; ".join(parts))


if __name__ == "__main__":
    main()
