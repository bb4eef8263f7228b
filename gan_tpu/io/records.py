"""Metrics records: in-memory series, append-only txt log, JSON snapshots,
and the 6-linestyle loss-curve plot.

Mirrors the reference's four channels (/root/reference/train/trainunits.py):
make_record (:28-32), write_record_to_txt (:34-38), save_record (:78-94,
pickles -> here JSON, framework-decoupled), draw_plt_record (:133-153 — a
16x9 figure, one line per key, preset dash patterns, dpi 960; we default to
dpi 240 to keep artifact sizes sane, configurable up to the reference's 960).
"""

import json
import os
from typing import Dict, List, Sequence, Tuple


class Recorder:
    def __init__(self, epoch: int = 0, i: int = 0):
        self.record: Dict[str, List[float]] = {}
        self.epoch = epoch
        self.i = i

    def add(self, record_set: Sequence[Tuple[str, float]]) -> None:
        for name, value in record_set:
            self.record.setdefault(name, []).append(float(value))

    def write_txt(self, file_name: str, record_set: Sequence[Tuple[str, float]]):
        with open(file_name + ".txt", "a", encoding="utf-8") as f:
            for name, value in record_set:
                f.write(f"{name} {value} ")
            f.write("\n")

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"epoch": self.epoch, "i": self.i, "record": self.record}, f)

    @classmethod
    def load(cls, path: str) -> "Recorder":
        with open(path) as f:
            blob = json.load(f)
        r = cls(blob.get("epoch", 0), blob.get("i", 0))
        r.record = blob["record"]
        return r

    def plot(self, name_png: str, per_iteration: int, dpi: int = 240) -> None:
        if not any(k not in ("epoch", "i") for k in self.record):
            # nothing recorded (e.g. a resume landed past the final step,
            # making the phase a no-op): don't overwrite a previous run's
            # plot with an empty chart
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        linestyles = [
            (0, (3, 3, 1, 2)),
            (0, (1, 1)),
            (0, (5, 5)),
            (0, (5, 3, 1, 2)),
            (0, (3, 1, 1, 1, 2, 1)),
            (0, (3, 4, 1, 2, 1, 2)),
        ]
        fig = plt.figure(num=name_png, figsize=(16, 9), clear=True)
        ax = fig.add_subplot(111)
        for i, (key, series) in enumerate(self.record.items()):
            if key in ("epoch", "i"):
                continue
            ax.plot(series, label=key, linewidth=1.0,
                    linestyle=linestyles[i % len(linestyles)])
        ax.legend(fontsize="x-large", loc=1)
        ax.set_xlabel(f"every {per_iteration} iterations")
        ax.set_ylabel("loss amount")
        fig.savefig(name_png + ".png", dpi=dpi)
        plt.close(fig)
