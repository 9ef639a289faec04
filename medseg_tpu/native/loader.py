"""ctypes bindings for the native C++ PNG decode/resize loader.

The reference's input pipeline is 4 CPU worker processes doing PIL decode +
Albumentations per sample per epoch (utils/trainer.py:153-160).  Our packed
cache makes decode a one-time cost, and this loader makes that one-time cost
fast: a C++ thread pool decodes PNGs with libpng and resizes (bilinear
half-pixel / nearest, matching ops/image.py) straight into the caller's
pre-allocated numpy buffer — no Python in the loop, no per-image allocations.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Sequence

import numpy as np

_LIB_PATH = Path(__file__).parent / "libmedseg_loader.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.decode_resize_batch.restype = ctypes.c_int
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,  # n
        ctypes.c_void_p,  # out buffer
        ctypes.c_int,  # out size (square)
        ctypes.c_int,  # channels (1 or 3)
        ctypes.c_int,  # letterbox flag
        ctypes.c_int,  # nearest flag
        ctypes.c_int,  # num threads
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(verbose: bool = False) -> bool:
    """Compile loader.cpp in place (g++ + libpng); returns success."""
    import subprocess

    src = Path(__file__).parent / "loader.cpp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(_LIB_PATH), "-lpng", "-lz", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose and res.returncode != 0:
            print(res.stderr)
        return res.returncode == 0
    except Exception:
        return False


def decode_resize_batch(paths: Sequence[str], size: int, *, letterbox: bool,
                        gray: bool, nearest: bool = False,
                        threads: int | None = None) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built; call loader.build()")
    n = len(paths)
    ch = 1 if gray else 3
    shape = (n, size, size) if gray else (n, size, size, 3)
    out = np.zeros(shape, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nthreads = threads or min(16, os.cpu_count() or 1)
    rc = lib.decode_resize_batch(
        arr, n, out.ctypes.data_as(ctypes.c_void_p), size, ch,
        int(letterbox), int(nearest), nthreads)
    if rc != 0:
        raise RuntimeError(f"native decode failed on {rc - 1}: {paths[rc - 1]}")
    return out
