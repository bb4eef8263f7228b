"""ctypes bindings for the native C++ loader (native/loader.cpp).

Builds libganloader.so on first use (g++, libjpeg/libpng) and caches it.
Falls back cleanly: callers check `available()` and use the PIL path
otherwise.
"""

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "loader.cpp")
_SO = os.path.join(_REPO, "native", "libganloader.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO,
        "-ljpeg", "-lpng", "-lpthread", "-std=c++17",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ganloader_load_images.restype = ctypes.c_int
    lib.ganloader_load_images.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.ganloader_gather.restype = None
    lib.ganloader_gather.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_images(paths: Sequence[str], out_h: int, out_w: int,
                num_threads: int = 4):
    """Decode + bicubic-resize image files into a uint8 NHWC array.

    Returns (images (N,H,W,3) uint8, ok (N,) bool)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    n = len(paths)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(n, np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    dst = np.zeros((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib.ganloader_load_images(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out_h, out_w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return dst, ok.astype(bool)


def gather(src: np.ndarray, idx: np.ndarray, out: Optional[np.ndarray] = None):
    """Batch gather src[idx] -> out via memcpy (no numpy fancy-index temp)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, np.int64)
    item = int(np.prod(src.shape[1:])) * src.dtype.itemsize
    if out is None:
        out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    lib.ganloader_gather(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), item,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
