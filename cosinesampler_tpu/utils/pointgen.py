"""Native (C++) collocation-point generator with a NumPy fallback.

The runtime analog of a data loader for PINN training: a C++ worker thread
produces deterministic Philox-based uniform batches into a ring buffer
(native/pointgen.cpp), overlapping host-side batch generation with device
steps — relevant on the single-core TPU hosts where Python-side RNG
competes with the driver.  Batches are pure functions of (seed, step), so
checkpoint/resume replays the exact point stream.

Build: compiled on first use with g++ into a cache dir; if no compiler is
available, a bit-exact NumPy Philox fallback takes over (same stream).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "pointgen.cpp"
_LIB_CACHE: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _LIB_CACHE, _BUILD_FAILED
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    if _BUILD_FAILED or not _SRC.exists():
        return None
    cache = pathlib.Path(
        os.environ.get("COSINESAMPLER_CACHE",
                       os.path.join(tempfile.gettempdir(),
                                    "cosinesampler_tpu")))
    cache.mkdir(parents=True, exist_ok=True)
    lib_path = cache / "libpointgen.so"
    if not lib_path.exists() or lib_path.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               str(_SRC), "-o", str(lib_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _BUILD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        _BUILD_FAILED = True
        return None
    lib.pointgen_create.restype = ctypes.c_void_p
    lib.pointgen_create.argtypes = [ctypes.c_int64, ctypes.c_int,
                                    ctypes.c_uint32, ctypes.c_float,
                                    ctypes.c_float, ctypes.c_int]
    lib.pointgen_destroy.argtypes = [ctypes.c_void_p]
    lib.pointgen_take.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_uint64]
    lib.pointgen_fill.argtypes = [ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_uint32, ctypes.c_uint64,
                                  ctypes.c_float, ctypes.c_float,
                                  ctypes.POINTER(ctypes.c_float)]
    _LIB_CACHE = lib
    return lib


def _philox2x32(counter: np.ndarray, key: np.uint32) -> np.ndarray:
    """Vectorized Philox-2x32-10 matching native/pointgen.cpp exactly."""
    mul = np.uint64(0xD256D193)
    weyl = np.uint32(0x9E3779B9)
    c0 = counter.astype(np.uint32)
    c1 = (counter >> np.uint64(32)).astype(np.uint32)
    k = np.uint32(key)
    for _ in range(10):
        prod = c0.astype(np.uint64) * mul
        hi = (prod >> np.uint64(32)).astype(np.uint32)
        lo = prod.astype(np.uint32)
        c0 = hi ^ np.uint32(k) ^ c1
        c1 = lo
        k = np.uint32((int(k) + int(weyl)) & 0xFFFFFFFF)
    return np.stack([c0, c1], axis=-1)


def _fill_numpy(batch_points: int, dim: int, seed: int, step: int,
                lo: float, hi: float) -> np.ndarray:
    values = batch_points * dim
    n_ctr = (values + 1) // 2
    base = np.uint64(step) * np.uint64(values)
    counters = base + np.arange(n_ctr, dtype=np.uint64)
    bits = _philox2x32(counters, np.uint32(seed)).reshape(-1)[:values]
    u = (bits >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / 16777216.0)
    return (lo + (hi - lo) * u).reshape(batch_points, dim)


class PointGenerator:
    """Deterministic per-step collocation batches (native when available)."""

    def __init__(self, batch_points: int, dim: int, seed: int = 0,
                 lo: float = -1.0, hi: float = 1.0, n_slots: int = 4,
                 force_numpy: bool = False):
        self.batch_points = int(batch_points)
        self.dim = int(dim)
        self.seed = int(seed) & 0xFFFFFFFF
        self.lo = float(lo)
        self.hi = float(hi)
        self._lib = None if force_numpy else _build_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.pointgen_create(
                self.batch_points, self.dim, self.seed,
                ctypes.c_float(self.lo), ctypes.c_float(self.hi),
                int(n_slots))

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def batch(self, step: int) -> np.ndarray:
        """The (batch_points, dim) float32 batch for training step ``step``."""
        if self._handle is not None:
            out = np.empty((self.batch_points, self.dim), dtype=np.float32)
            self._lib.pointgen_take(
                ctypes.c_void_p(self._handle),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_uint64(step))
            return out
        return _fill_numpy(self.batch_points, self.dim, self.seed, step,
                           self.lo, self.hi)

    def close(self):
        if self._handle is not None:
            self._lib.pointgen_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
