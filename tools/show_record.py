"""Record inspector — the reference's trainunits.test() analog
(/root/reference/train/trainunits.py:157-168): print a saved record's series.

Usage: python tools/show_record.py path/to/record.json [--plot out.png]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from gan_tpu.io.records import Recorder


def main(path, *rest):
    r = Recorder.load(path)
    print(f"epoch={r.epoch} i={r.i}")
    for key, series in r.record.items():
        head = ", ".join(f"{v:.4f}" for v in series[:5])
        print(f"{key}: n={len(series)} [{head}{', ...' if len(series) > 5 else ''}]")
    if rest and rest[0] == "--plot":
        out = rest[1] if len(rest) > 1 else "record_plot"
        r.plot(out.removesuffix(".png"), per_iteration=30)
        print(f"wrote {out if out.endswith('.png') else out + '.png'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
