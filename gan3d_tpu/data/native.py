"""ctypes binding for the native npz decoder (native/npz_loader.cc).

Builds the shared library with g++ on first use (cached under native/);
`available()` reports whether the toolchain/build succeeded so callers can
fall back to the numpy decoder transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "npz_loader.cc")
_SO = os.path.join(_NATIVE_DIR, "libnpz_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"native loader build failed: {e}", flush=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.isfile(_SO) or (
                os.path.isfile(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_decode.restype = ctypes.c_int
        lib.loader_decode.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_long]
        lib.loader_decode_batch.restype = ctypes.c_int
        lib.loader_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeNpzPool:
    """Thread-pooled batch decoder: paths -> float32 [n, *shape] in [-1, 1]."""

    def __init__(self, num_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native npz loader unavailable")
        self._lib = lib
        self._pool = lib.loader_create(num_threads)

    def decode_batch(self, paths: Sequence[str], sample_shape) -> np.ndarray:
        n = len(paths)
        per = int(np.prod(sample_shape))
        out = np.empty((n, per), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.loader_decode_batch(
            self._pool, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), per)
        if rc != 0:
            raise IOError(f"native npz decode failed (code {rc})")
        return out.reshape((n,) + tuple(sample_shape))

    def __del__(self):
        lib, pool = getattr(self, "_lib", None), getattr(self, "_pool", None)
        if lib is not None and pool:
            lib.loader_destroy(pool)
