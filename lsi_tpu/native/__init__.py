"""ctypes binding + lazy build of the native data-loading runtime.

``load_batch(paths, h, w)`` decodes + resizes a batch of images on a C++
thread pool (libpng/libjpeg) directly into one float32 array — the native
replacement for the per-image PIL path. Falls back gracefully (returns
None) when the toolchain is unavailable; callers keep the PIL path as
fallback.

The shared library is built on first use with a single g++ invocation into
``~/.cache/lsi_tpu/`` (no pybind11 dependency — plain C ABI via ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "loader.cc")
_CACHE_DIR = os.environ.get(
    "LSI_TPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "lsi_tpu"))


def _build() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "liblsi_loader.so")
    src_mtime = os.path.getmtime(_SRC)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= src_mtime:
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", so_path, "-lpng", "-ljpeg", "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.lsi_load_batch.restype = ctypes.c_int
        lib.lsi_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.lsi_decode_image.restype = ctypes.c_int
        lib.lsi_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long]
        lib.lsi_decode_depth16.restype = ctypes.c_int
        lib.lsi_decode_depth16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_long]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _get_lib() is not None


def load_batch(paths: List[str], out_h: int, out_w: int,
               num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode+resize a batch; (N, H, W, 3) float32 in [0,1], or None if the
    native library is unavailable. Failed files decode to zeros."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.lsi_load_batch(arr, n, out_h, out_w,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       num_threads)
    return out


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode one image at native size to (H, W, 3) uint8, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if not lib.lsi_decode_image(path.encode(), ctypes.byref(h),
                                ctypes.byref(w), None, 0):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    ok = lib.lsi_decode_image(
        path.encode(), ctypes.byref(h), ctypes.byref(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    return out if ok else None


def decode_depth16(path: str) -> Optional[np.ndarray]:
    """Decode a 16-bit grayscale PNG to (H, W) uint16, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if not lib.lsi_decode_depth16(path.encode(), ctypes.byref(h),
                                  ctypes.byref(w), None, 0):
        return None
    out = np.empty((h.value, w.value), np.uint16)
    ok = lib.lsi_decode_depth16(
        path.encode(), ctypes.byref(h), ctypes.byref(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size)
    return out if ok else None
