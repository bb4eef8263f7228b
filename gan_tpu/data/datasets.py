"""Host-side datasets.

Replaces the reference's torchvision ImageFolder/MNIST datasets
(/root/reference/units/dataloader.py:5-27). The target corpus (Kaggle
cats-faces-64x64, ~15.7k 64x64 images) fits trivially in host RAM, so the
TPU-first design is: decode everything once into a pinned uint8 NHWC array,
then feed the device raw bytes and do all float math (scale/flip/resize/
normalize) on-device (see gan_tpu.data.augment).
"""

import os
from typing import Optional, Sequence, Tuple

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm", ".tif", ".tiff"}


def _list_images(root: str) -> Sequence[str]:
    files = []
    for dirpath, _, filenames in os.walk(root):
        for f in sorted(filenames):
            if os.path.splitext(f)[1].lower() in _IMG_EXTS:
                files.append(os.path.join(dirpath, f))
    return files


class ImageFolderDataset:
    """Recursive image-folder dataset decoded to a uint8 NHWC array.

    Images are decoded at load time with PIL and stored at `load_size`
    (bicubic host resize only if the source size differs; the final resize
    to model resolution happens on-device to match the reference's
    ToTensor->flip->resize order).
    """

    def __init__(
        self,
        root: str,
        load_size: Optional[Tuple[int, int]] = (64, 64),
        use_native: bool = True,
    ):
        paths = _list_images(root)
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        h, w = load_size if load_size is not None else (64, 64)

        from gan_tpu.data import native

        if use_native and native.available():
            # C++ decode + bicubic resize (native/loader.cpp); the resize
            # matches the reference's tensor-path torch bicubic (no
            # antialias), not PIL's antialiased resample.
            imgs, ok = native.load_images(list(paths), h, w)
            if not ok.all():
                bad = [p for p, o in zip(paths, ok) if not o]
                imgs = imgs[ok]
                paths = [p for p, o in zip(paths, ok) if o]
                if not paths:
                    raise FileNotFoundError(f"no decodable images under {root}: {bad[:3]}")
            self.images = imgs
        else:
            from PIL import Image

            out = []
            for p in paths:
                with Image.open(p) as im:
                    im = im.convert("RGB")
                    if im.size != (w, h):
                        im = im.resize((w, h), Image.BICUBIC)
                    out.append(np.asarray(im, dtype=np.uint8))
            self.images = np.stack(out)  # (N, H, W, 3) uint8
        self.paths = paths

    def __len__(self) -> int:
        return len(self.images)


class SyntheticDataset:
    """Deterministic random uint8 images — benchmark / CI stand-in when no
    image corpus is mounted."""

    def __init__(self, n: int = 2048, size: Tuple[int, int] = (64, 64), seed: int = 0):
        rng = np.random.default_rng(seed)
        self.images = rng.integers(
            0, 256, size=(n, size[0], size[1], 3), dtype=np.uint8
        )

    def __len__(self) -> int:
        return len(self.images)
