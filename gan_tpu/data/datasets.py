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

    # reference transform stats (units/dataloader.py:7-12): ImageNet
    # normalize + random horizontal flip
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    flip = True
    channels = 3

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

    mean = ImageFolderDataset.mean
    std = ImageFolderDataset.std
    flip = True
    channels = 3

    def __init__(self, n: int = 2048, size: Tuple[int, int] = (64, 64), seed: int = 0):
        rng = np.random.default_rng(seed)
        self.images = rng.integers(
            0, 256, size=(n, size[0], size[1], 3), dtype=np.uint8
        )

    def __len__(self) -> int:
        return len(self.images)


def _read_idx(path: str) -> np.ndarray:
    """Parse an IDX-format file (the MNIST container format; spec at the
    bottom of Y. LeCun's MNIST page). Accepts .gz. No egress needed — this
    replaces torchvision's MNIST(download=True) with a local-file reader."""
    import gzip
    import struct

    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        data = f.read()
    zero, dtype_code, ndim = struct.unpack(">HBB", data[:4])
    if zero != 0:
        raise ValueError(f"{path}: bad IDX magic {data[:4]!r}")
    dtypes = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16,
              0x0C: np.int32, 0x0D: np.float32, 0x0E: np.float64}
    if dtype_code not in dtypes:
        raise ValueError(f"{path}: unknown IDX dtype 0x{dtype_code:02x}")
    dims = struct.unpack(f">{ndim}I", data[4 : 4 + 4 * ndim])
    arr = np.frombuffer(
        data, np.dtype(dtypes[dtype_code]).newbyteorder(">"),
        offset=4 + 4 * ndim)
    return arr.reshape(dims).astype(dtypes[dtype_code])


class MNISTDataset:
    """Local-file MNIST — parity with the reference's get_MNIST
    (/root/reference/units/dataloader.py:16-27): train split, NO flip,
    bicubic resize 28->64 and (0.5, 0.5) normalization, all of which run
    on-device via the mean/std/flip attributes (gan_tpu.data.augment).
    Single-channel images, stored (N, 28, 28, 1) uint8.

    Looks for IDX files (optionally .gz) under `root`, `root/MNIST/raw`
    (torchvision layout), or `root/raw`.
    """

    mean = (0.5,)
    std = (0.5,)
    flip = False  # the reference comments RandomHorizontalFlip out (:21)
    channels = 1

    _FILES = {True: "train-images-idx3-ubyte", False: "t10k-images-idx3-ubyte"}
    _LABELS = {True: "train-labels-idx1-ubyte", False: "t10k-labels-idx1-ubyte"}

    def __init__(self, root: str, train: bool = True):
        img_path = self._find(root, self._FILES[train])
        if img_path is None:
            raise FileNotFoundError(
                f"MNIST IDX file {self._FILES[train]}[.gz] not found under "
                f"{root} (searched ., MNIST/raw, raw)"
            )
        imgs = _read_idx(img_path)
        if imgs.ndim != 3:
            raise ValueError(f"{img_path}: expected (N,H,W), got {imgs.shape}")
        self.images = imgs[..., None]  # (N, 28, 28, 1) uint8
        lbl_path = self._find(root, self._LABELS[train])
        self.labels = _read_idx(lbl_path) if lbl_path is not None else None

    @staticmethod
    def _find(root: str, stem: str) -> Optional[str]:
        for sub in ("", os.path.join("MNIST", "raw"), "raw"):
            for ext in ("", ".gz"):
                p = os.path.join(root, sub, stem + ext)
                if os.path.isfile(p):
                    return p
        return None

    def __len__(self) -> int:
        return len(self.images)
