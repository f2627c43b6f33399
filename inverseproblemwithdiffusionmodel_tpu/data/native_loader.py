"""ctypes binding for the native prefetching batcher (native/batcher.cpp).

The .so is JIT-compiled with g++ on first use and cached next to the source;
`NativeBatchIterator` is a drop-in for `training.batch_iterator` with the
gather + shuffle running on a C++ worker thread (the reference's DataLoader
num_workers analog). Falls back cleanly: `native_available()` gates usage.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                    "batcher.cpp")
_SO = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                   "_batcher.so")
_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        def build():
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-pthread", src, "-o", so],
                check=True, capture_output=True, text=True)

        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                build()
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                # a pre-existing .so from another machine/arch (or with a
                # checkout-equal mtime) can fail to load — rebuild once
                # from source before giving up on the native path
                os.remove(so)
                build()
                lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int]
        lib.batcher_batches_per_epoch.restype = ctypes.c_int64
        lib.batcher_batches_per_epoch.argtypes = [ctypes.c_void_p]
        lib.batcher_next.restype = ctypes.c_int64
        lib.batcher_next.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBatchIterator:
    """Infinite shuffled batch stream over an in-memory float32 array with
    C++ worker-thread prefetch. Use `batches_per_epoch` to bound epochs."""

    def __init__(self, data: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, prefetch_depth: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native batcher unavailable: {_build_error}")
        self._lib = lib
        # keep a contiguous float32 copy alive for the C++ side
        self._data = np.ascontiguousarray(data, dtype=np.float32)
        n = self._data.shape[0]
        self._sample_shape = self._data.shape[1:]
        sample_size = int(np.prod(self._sample_shape))
        self.batch_size = batch_size
        self._handle = lib.batcher_create(
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, sample_size, batch_size, int(shuffle), seed, int(drop_last),
            prefetch_depth)
        if not self._handle:
            raise RuntimeError("batcher_create failed")
        self.batches_per_epoch = int(
            lib.batcher_batches_per_epoch(self._handle))
        self._out = np.empty((batch_size, sample_size), np.float32)

    def next(self) -> np.ndarray:
        count = self._lib.batcher_next(
            self._handle,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if count <= 0:
            raise StopIteration
        # count < batch_size only for the drop_last=False epoch tail -
        # a short batch, matching training.batch_iterator exactly
        return self._out[:count].reshape(int(count),
                                         *self._sample_shape).copy()

    def __iter__(self):
        return self

    def __next__(self):
        return self.next()

    def epoch_iter(self):
        """One epoch's worth of batches (for the fit() train_iter_fn API)."""
        for _ in range(self.batches_per_epoch):
            yield self.next()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_batch_iterator(data: np.ndarray, batch_size: int, **kw):
    """Factory matching training.batch_iterator's call contract:
    returns `make()` yielding one epoch of batches per call."""
    it = NativeBatchIterator(data, batch_size, **kw)

    def make():
        return it.epoch_iter()

    make.iterator = it
    return make
