"""Regenerate the flagship init blob for bench.py's exact seed path.

The driver's between-session cache sync can prune .jax_cache down to the
large executables, deleting the ~2 GB init_*.msgpack blob (observed at r3
round end: 21 entries survived, no blob). Without it, the first
create_state of the session pays the full ~15-30 min clean-CPU flagship
init inside whatever run needed it — e.g. the driver's own bench attempt.
This tool pays that cost up front, in a pure-CPU process that never
touches the TPU tunnel, producing the blob under the current cache key so
later create_state calls (bench, prewarm, train_run) are a file read +
one bulk device_put.

Usage: python tools/regen_init_blob.py [--batch 16] [--trainer-seed-too]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--trainer-seed-too", action="store_true",
                    help="also generate the Trainer-derived seed's blob "
                         "(tools/train_run.py path), not just bench's "
                         "PRNGKey(0)")
    args = ap.parse_args()

    import jax

    # pure host-side work; keep this process off the axon platform
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship
    from gan_tpu.train.state import ensure_init_blob, init_cache_info

    g, d, _, _ = _flagship(tiny=False, dtype=None)

    rngs = [("bench/create_state(PRNGKey(0))", jax.random.PRNGKey(0))]
    if args.trainer_seed_too:
        rngs.append(("Trainer(seed=0) init split",
                     jax.random.split(jax.random.PRNGKey(0), 3)[1]))

    failed = []
    for label, rng in rngs:
        import numpy as np

        key_arr = np.asarray(jax.random.key_data(rng))
        seed = int(key_arr.reshape(-1)[-1])
        _, cache_file, _, _ = init_cache_info(
            g, d, seed, args.batch, (64, 64, 3))
        if os.path.exists(cache_file):
            print(f"{label}: blob already present "
                  f"({os.path.basename(cache_file)}, "
                  f"{os.path.getsize(cache_file) / 2**30:.2f} GiB)")
            continue
        print(f"{label}: generating {os.path.basename(cache_file)} ...",
              flush=True)
        # generate-only: writes the cache file without deserializing the
        # ~2 GB blob back into numpy (ADVICE r3)
        got = ensure_init_blob(g, d, rng, args.batch, (64, 64, 3))
        if got is None:
            print(f"{label}: FAILED (init worker failed: nonzero exit, "
                  f"timeout, or error)", flush=True)
            failed.append(label)
            continue
        print(f"{label}: done — {os.path.basename(cache_file)} "
              f"{os.path.getsize(cache_file) / 2**30:.2f} GiB", flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
