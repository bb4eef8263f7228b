"""Adopt existing init blobs under the current cache-key scheme.

The init-blob key includes a module-config signature. The older scheme
hashed a full pickle of the module dataclasses, so ADDING a config field
(e.g. Generator13_5.style_bank) changed every key and orphaned the
2 GB flagship blob — and the old hash bytes cannot be recomputed once the
class has the new field. This tool finds orphaned blobs that deserialize
cleanly against the current flagship template and hardlinks them to the
current key (train/state.py init_cache_info).

Usage: python tools/rekey_init_blob.py [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=None,
                    help="init seed (default: derive like create_state from "
                         "PRNGKey(0) split — the Trainer/bench path)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import flax.serialization

    from gan_tpu.train.state import init_cache_info
    from __graft_entry__ import _flagship

    g, d, g_name, d_name = _flagship(tiny=False, dtype=None)
    if args.seed is None:
        # Trainer: rng=PRNGKey(seed=0); init_rng = split(rng, 3)[1];
        # create_state folds key_data[-1] into the scalar seed
        init_rng = jax.random.split(jax.random.PRNGKey(0), 3)[1]
        try:
            key_arr = np.asarray(jax.random.key_data(init_rng))
        except TypeError:
            key_arr = np.asarray(init_rng)
        seeds = [int(key_arr.reshape(-1)[-1])]
        # bench/create_state with PRNGKey(0) directly
        seeds.append(int(np.asarray(
            jax.random.key_data(jax.random.PRNGKey(0))).reshape(-1)[-1]))
    else:
        seeds = [args.seed]

    cache_dir = os.environ.get(
        "GAN_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    for seed in seeds:
        template, cache_file, _, _ = init_cache_info(
            g, d, seed, args.batch, (64, 64, 3))
        if os.path.exists(cache_file):
            print(f"seed {seed}: current key already present: "
                  f"{os.path.basename(cache_file)}")
            continue
        # candidate orphans: large blobs not under any current key
        found = False
        for name in sorted(os.listdir(cache_dir)):
            if not (name.startswith("init_") and name.endswith(".msgpack")):
                continue
            path = os.path.join(cache_dir, name)
            if os.path.getsize(path) < 2 ** 30:  # flagship blob is ~2 GB
                continue
            try:
                with open(path, "rb") as f:
                    blob = f.read()
                flax.serialization.from_bytes(template, blob)
            except Exception:
                continue
            os.link(path, cache_file)
            print(f"seed {seed}: adopted {name} -> "
                  f"{os.path.basename(cache_file)}")
            found = True
            break
        if not found:
            print(f"seed {seed}: no adoptable blob found "
                  f"(target {os.path.basename(cache_file)})")


if __name__ == "__main__":
    main()
