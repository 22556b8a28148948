"""ctypes binding + on-demand build for the native batcher."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["NativeBatcher", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_SO = os.path.join(_HERE, "libbatcher.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", _SO + ".tmp"],
                    check=True, capture_output=True)
                os.replace(_SO + ".tmp", _SO)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
        lib.batcher_total_batches.restype = ctypes.c_int64
        lib.batcher_total_batches.argtypes = [ctypes.c_void_p]
        lib.batcher_next.restype = ctypes.c_int
        lib.batcher_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBatcher:
    """Iterator over shuffled (images, labels) batches produced by the C++
    prefetch thread.  Keeps references to the source arrays alive for the
    batcher's lifetime (the C++ side borrows them)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int = 0, ring: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no g++?)")
        self._lib = lib
        self.images = np.ascontiguousarray(images, dtype=np.float32)
        self.labels = np.ascontiguousarray(labels, dtype=np.int32)
        n = self.images.shape[0]
        self.item_shape = self.images.shape[1:]
        item_floats = int(np.prod(self.item_shape))
        self.batch_size = batch_size
        self._handle = lib.batcher_create(
            self.images.ctypes.data_as(ctypes.c_void_p),
            self.labels.ctypes.data_as(ctypes.c_void_p),
            n, item_floats, batch_size, ring, seed + 1)
        self.total_batches = lib.batcher_total_batches(self._handle)

    def __iter__(self):
        try:
            while True:
                imgs = np.empty((self.batch_size,) + self.item_shape,
                                np.float32)
                labs = np.empty((self.batch_size,), np.int32)
                ok = self._lib.batcher_next(
                    self._handle,
                    imgs.ctypes.data_as(ctypes.c_void_p),
                    labs.ctypes.data_as(ctypes.c_void_p))
                if not ok:
                    return
                yield imgs, labs
        finally:
            self.close()

    def close(self):
        if self._handle is not None:
            self._lib.batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
