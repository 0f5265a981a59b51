"""ctypes bindings for the native C++ data loader (dataloader.cc).

Compiles on first use (g++ -O3 -fopenmp, links libjpeg/libpng) and caches
the .so next to the source; every entry point degrades gracefully to the
NumPy/PIL path when the toolchain or libraries are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cc")
_SO = os.path.join(_HERE, "_dataloader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-ljpeg", "-lpng",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return _SO
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        err = getattr(e, "stderr", b"")
        if err:
            print(f"[native] build failed, using pure-python fallback:\n"
                  f"{err.decode(errors='replace')[:800]}")
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            so = _build()
        if so is None or not os.path.exists(so):
            return None
        lib = ctypes.CDLL(so)
        lib.assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p]
        lib.assemble_batch.restype = None
        lib.decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p]
        lib.decode_batch.restype = ctypes.c_int64
        lib.omp_thread_count.restype = ctypes.c_int
        _lib = lib
        return _lib


def assemble_batch(images: np.ndarray, indices: np.ndarray,
                   flip: np.ndarray) -> Optional[np.ndarray]:
    """(n,h,w,c) uint8 + indices + flip flags -> (b,h,w,c) float32 in [-1,1].

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    fl = np.ascontiguousarray(flip, dtype=np.uint8)
    b = len(idx)
    n, h, w, c = images.shape
    out = np.empty((b, h, w, c), dtype=np.float32)
    lib.assemble_batch(
        images.ctypes.data, n, h, w, c, idx.ctypes.data, fl.ctypes.data, b,
        out.ctypes.data)
    return out


def decode_batch(paths: Sequence[str], resolution: int) -> Optional[np.ndarray]:
    """Parallel decode+resize+crop of image files -> (b,res,res,3) uint8."""
    lib = get_lib()
    if lib is None:
        return None
    b = len(paths)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    out = np.empty((b, resolution, resolution, 3), dtype=np.uint8)
    failures = lib.decode_batch(arr, b, resolution, out.ctypes.data)
    if failures:
        return None  # let the PIL path handle odd files
    return out
