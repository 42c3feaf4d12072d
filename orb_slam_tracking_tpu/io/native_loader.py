"""ctypes binding for the native prefetching frame loader.

The C++ pipeline (``native/frameloader.cpp``) decodes PNG/JPEG frames and
converts to float32 grayscale in worker threads ahead of the consumer —
the host-side ingest half of the tracking loop, which otherwise serializes
Python decoding against device compute. Falls back transparently to the
PIL path (``io.images``) when the shared library has not been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["native_available", "build_native", "FrameLoader", "decode_gray"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libframeloader.so"))
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.frameloader_open.restype = ctypes.c_void_p
    lib.frameloader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.frameloader_next.restype = ctypes.c_int
    lib.frameloader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.frameloader_close.argtypes = [ctypes.c_void_p]
    lib.frameloader_decode.restype = ctypes.c_int
    lib.frameloader_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_native() -> bool:
    """Compile the shared library (idempotent). Returns availability."""
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return native_available()


_MAX_PIXELS = 4096 * 3072


def decode_gray(path: str) -> Optional[np.ndarray]:
    """Synchronous native decode; None if unavailable or failed."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(_MAX_PIXELS, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ok = lib.frameloader_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _MAX_PIXELS, ctypes.byref(h), ctypes.byref(w),
    )
    if not ok or h.value <= 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class FrameLoader:
    """Prefetching iterator over image files.

    Uses the native pipeline when built; otherwise falls back to
    synchronous PIL decoding so callers never need to branch.
    """

    def __init__(self, paths: List[str], n_threads: int = 2,
                 ring_capacity: int = 8):
        self._paths = list(paths)
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths]
            )
            self._handle = self._lib.frameloader_open(
                arr, len(self._paths), n_threads, ring_capacity
            )

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._handle is None:
            from .images import load_gray

            for p in self._paths:
                yield load_gray(p)
            return
        buf = np.empty(_MAX_PIXELS, np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        while True:
            got = self._lib.frameloader_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                _MAX_PIXELS, ctypes.byref(h), ctypes.byref(w),
            )
            if not got:
                return
            if h.value < 0:
                raise IOError("native frame decode failed")
            yield buf[: h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.frameloader_close(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
