"""ctypes bindings for the native npy loader (npy_loader.cpp).

Builds the shared library on first use with g++ (the image carries the
toolchain but no prebuilt artifact); every entry point falls back to a pure
numpy implementation when the compiler or library is unavailable, so the
framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "npy_loader.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _lib_path() -> str:
    """Where to build/load the .so: next to the source in a writable
    checkout, else a per-user cache dir — an installed wheel's
    site-packages may be read-only, and machine-built artifacts must not
    land inside the package (the wheel ships source only)."""
    if os.access(_DIR, os.W_OK):
        return os.path.join(_DIR, "libnpy_loader.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "uni_adapter_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libnpy_loader.so")


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        _LIB = _lib_path()
        if not os.path.exists(_LIB) or (os.path.getmtime(_SRC)
                                        > os.path.getmtime(_LIB)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", _LIB, "-lpthread"],
                    check=True, capture_output=True, timeout=120)
            except Exception as e:
                logging.info("native loader build failed (%s); "
                             "falling back to numpy", e)
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.ua_open.restype = ctypes.c_void_p
        lib.ua_open.argtypes = [ctypes.c_char_p]
        lib.ua_ndim.restype = ctypes.c_int
        lib.ua_ndim.argtypes = [ctypes.c_void_p]
        lib.ua_shape.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.ua_itemsize.restype = ctypes.c_int
        lib.ua_itemsize.argtypes = [ctypes.c_void_p]
        lib.ua_kind.restype = ctypes.c_char
        lib.ua_kind.argtypes = [ctypes.c_void_p]
        lib.ua_read_f32.restype = ctypes.c_int64
        lib.ua_read_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.ua_read_i64.restype = ctypes.c_int64
        lib.ua_read_i64.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64)]
        lib.ua_close.argtypes = [ctypes.c_void_p]
        lib.ua_prefetch_start.restype = ctypes.c_void_p
        lib.ua_prefetch_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ua_prefetch_get.restype = ctypes.c_int64
        lib.ua_prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_char_p]
        lib.ua_prefetch_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


class NativeNpy:
    """mmap-backed .npy reader with optional background prefetch ring.

    Drop-in data source for the TTA stream: `read_f32(i)` returns sample i
    (trailing dims) as float32; `read_i64(i)` for integer label archives.
    Transparently degrades to numpy memmap when the native path is out.
    """

    def __init__(self, path: str, prefetch: int = 0):
        self.path = path
        self._lib = _ensure_lib()
        self._pf = None
        if self._lib is not None:
            self._h = self._lib.ua_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is not None:
            nd = self._lib.ua_ndim(self._h)
            buf = (ctypes.c_int64 * nd)()
            self._lib.ua_shape(self._h, buf)
            self.shape = tuple(buf[:nd])
            if prefetch > 1:
                self._pf = self._lib.ua_prefetch_start(self._h, prefetch)
        else:
            self._np = np.load(path, mmap_mode="r")
            self.shape = tuple(self._np.shape)
        self._sample_elems = int(np.prod(self.shape[1:])) if len(
            self.shape) > 1 else 1

    def __len__(self) -> int:
        return self.shape[0]

    def read_f32(self, i: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(self._sample_elems, np.float32)
            n = self._lib.ua_read_f32(
                self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n < 0:
                raise ValueError(f"read failed at {i}")
            return out.reshape(self.shape[1:])
        return np.asarray(self._np[i], np.float32)

    def read_i64(self, i: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(self._sample_elems, np.int64)
            n = self._lib.ua_read_i64(
                self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            if n < 0:
                raise ValueError(f"read failed at {i}")
            return out.reshape(self.shape[1:]) if len(self.shape) > 1 else out[0]
        return np.asarray(self._np[i], np.int64)

    def close(self):
        if self._lib is not None and self._h:
            if self._pf:
                self._lib.ua_prefetch_stop(self._pf)
                self._pf = None
            self._lib.ua_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
