"""Export FID feature statistics for an image folder to a stats .npz.

The stats file uses the standard pytorch-fid key layout (mu/sigma), so
files produced here interoperate with stats produced elsewhere — and a
real-Inception stats file produced elsewhere drops into
gan_tpu.eval.fid.fid_from_npz directly (see docs/FID.md for the exact
external recipe).

Usage:
    python tools/export_fid_stats.py DATA_DIR OUT.npz \
        [--extractor-npz path.npz] [--batch 64] [--limit N]

Without --extractor-npz the fixed-seed RandomConvFeatures proxy is used
(stats then only compare against runs using the same proxy).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out")
    ap.add_argument("--extractor-npz", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    from gan_tpu.data import ImageFolderDataset, DataLoader
    from gan_tpu.eval import fid

    ds = ImageFolderDataset(args.data_dir)
    loader = DataLoader(ds, batch_size=args.batch, seed=0, drop_last=False)

    extractor = (fid.inception_extractor(args.extractor_npz)
                 if args.extractor_npz else fid.RandomConvFeatures())

    def batches():
        n = 0
        for raw in loader:
            x = np.asarray(raw, np.float32) / 255.0
            yield x
            n += x.shape[0]
            if args.limit and n >= args.limit:
                return

    mu, cov = fid.feature_stats(batches(), extractor)
    name = getattr(extractor, "name", "custom")
    fid.save_stats_npz(args.out, mu, cov, extractor_name=name, n=len(ds))
    print(f"wrote {args.out}: dim={len(mu)} extractor={name} n={len(ds)}")


if __name__ == "__main__":
    main()
