"""Pre-warm the persistent compile cache for bench.py's exact program.

Run this (once, possibly for hours) so the driver's bench.py invocation
hits the cache and finishes in minutes. Uses the same flagship, objective,
batch size, and step variants as bench.py.

Usage: BENCH_BATCH=16 python tools/prewarm_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("BENCH_STEPS", "2")
    import bench

    bench.main()


if __name__ == "__main__":
    main()
