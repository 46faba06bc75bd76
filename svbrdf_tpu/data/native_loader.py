"""ctypes binding for the native C++ PNG loader / prefetch pool.

The native library (native/svbrdf_loader.cpp) replaces the reference's
Python DataLoader workers (reference dataset.py:105-113, main.py:63) with
libpng decoding on background threads. Falls back to PIL transparently if
the shared library is missing or fails to build.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsvbrdf_loader.so"

_lib = None
_lib_tried = False


def _build_library() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native loader, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists() and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.sl_decode_png_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    lib.sl_decode_png_rgb8.restype = ctypes.c_int
    lib.sl_pool_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.sl_pool_create.restype = ctypes.c_void_p
    lib.sl_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.sl_pool_request.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_pool_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32)]
    lib.sl_pool_wait.restype = ctypes.c_int
    lib.sl_pool_image_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_pool_image_bytes.restype = ctypes.c_int64
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_library() is not None


def decode_png_rgb8(path: str) -> np.ndarray:
    """Decode a PNG to uint8 (H, W, 3) via the native library.

    Raises RuntimeError if the native library is unavailable or decoding
    fails (callers fall back to PIL).
    """
    lib = get_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.sl_decode_png_rgb8(path.encode(), None, 0,
                                ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"failed to read PNG header: {path}")
    buf = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.sl_decode_png_rgb8(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.nbytes, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"failed to decode PNG: {path}")
    return buf


class PrefetchPool:
    """Background decode pool over a fixed file list.

    Usage: pool.request(idx) ahead of time; pool.take(idx) blocks until the
    decoded uint8 (H, W, 3) array is ready.
    """

    def __init__(self, paths: Sequence[str], n_threads: int = 2,
                 capacity: int = 32):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._pool = lib.sl_pool_create(arr, len(self._paths), n_threads,
                                        capacity)
        if not self._pool:
            raise RuntimeError("failed to create native prefetch pool")

    def request(self, idx: int) -> None:
        self._lib.sl_pool_request(self._pool, idx)

    def take(self, idx: int) -> np.ndarray:
        nbytes = self._lib.sl_pool_image_bytes(self._pool, idx)
        if nbytes < 0:
            raise RuntimeError(f"bad sample index {idx}")
        buf = np.empty(nbytes, np.uint8)
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        rc = self._lib.sl_pool_wait(
            self._pool, idx,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
            ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise RuntimeError(f"native decode failed for index {idx}")
        return buf.reshape(h.value, w.value, 3)

    def close(self) -> None:
        if getattr(self, "_pool", None):
            self._lib.sl_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
