"""Sample-grid dumps.

Reproduces the reference artifact path: fixed-noise G forward ->
torchvision make_grid(padding=2, normalize=True) -> PNG named
"{epoch}-{i}.png" (/root/reference/train/trainunits.py:52-56).
normalize=True in torchvision is per-grid min-max to [0,1]; reproduced.
"""

import math
import os
from typing import Optional

import numpy as np


def make_grid(
    images: np.ndarray,
    nrow: Optional[int] = None,
    padding: int = 2,
    normalize: bool = True,
) -> np.ndarray:
    """NHWC float batch -> single HWC uint8 grid image."""
    images = np.asarray(images, dtype=np.float32)
    n, h, w, c = images.shape
    if nrow is None:
        nrow = int(math.ceil(math.sqrt(n)))
    ncol = nrow
    nrows = int(math.ceil(n / ncol))
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-12)
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return (np.clip(grid, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image_grid(images, path: str, nrow: Optional[int] = None) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = make_grid(np.asarray(images), nrow=nrow)
    Image.fromarray(grid.squeeze()).save(path)
