"""Render the training-progress animation from generated_images/ grids.

The reference ships a 47-epoch video built from fixed-noise grids saved
every N iterations (README.md:10-13). This renders the same artifact from
a run's generated_images/ directory: MP4 via ffmpeg when available,
animated GIF via PIL otherwise.

Usage: python tools/make_video.py [generated_images_dir] [out_basename]
"""

import os
import re
import shutil
import subprocess
import sys


def frame_sort_key(name):
    m = re.match(r"(\d+)-(\d+)\.png$", name)
    return (int(m.group(1)), int(m.group(2))) if m else (1 << 30, 0)


def main(img_dir="generated_images", out="training_progress", fps=10):
    frames = sorted(
        (f for f in os.listdir(img_dir) if f.endswith(".png")),
        key=frame_sort_key,
    )
    if not frames:
        print(f"no frames in {img_dir}")
        return 1
    paths = [os.path.join(img_dir, f) for f in frames]

    if shutil.which("ffmpeg"):
        list_file = out + "_frames.txt"
        with open(list_file, "w") as f:
            for p in paths:
                f.write(f"file '{os.path.abspath(p)}'\nduration {1.0 / fps}\n")
        subprocess.run(
            ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", list_file,
             "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2", "-pix_fmt", "yuv420p",
             out + ".mp4"],
            check=True,
        )
        os.remove(list_file)
        print(f"wrote {out}.mp4 ({len(paths)} frames)")
    else:
        from PIL import Image

        imgs = [Image.open(p).convert("P") for p in paths]
        imgs[0].save(
            out + ".gif", save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        print(f"wrote {out}.gif ({len(paths)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
