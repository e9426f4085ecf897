"""Timing + roofline reporting for the sampler kernels.

The reference ships no profiling (SURVEY.md section 5); its closest artifact
is CUDA_LAUNCH_BLOCKING for debuggability.  Here:

* ``time_fn``       — robust wall-clock timing of jitted callables.
* ``roofline``      — bytes-moved model for a sampler pass, so benchmarks
                      can report achieved HBM bandwidth percentage
                      (BASELINE.md target: HBM-bound on the big 3D sweep).
* ``trace``         — context manager around jax.profiler for Perfetto dumps.
"""

from __future__ import annotations

import contextlib
import math
import time
from typing import Tuple

import jax

# Peak numbers for TPU v5e (public spec): 819 GB/s HBM BW, 197 bf16 TFLOPs.
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def time_fn(fn, *args, iters: int = 10, warmup: int = 3) -> float:
    """Median-free simple timing: seconds per call after warmup."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sampler_bytes(n_cells: int, channels: int, spatial: Tuple[int, ...],
                  n_queries: int, dtype_bytes: int = 4,
                  shared_queries: bool = True, n_passes: int = 1) -> int:
    """Minimal HBM traffic for one blend pass: read cells + coords, write out.

    ``shared_queries``: queries broadcast across cells (the PINN layout)
    read once; otherwise per-cell.
    """
    cells = n_cells * channels * math.prod(spatial) * dtype_bytes
    dim = len(spatial)
    coords = n_queries * dim * dtype_bytes * (1 if shared_queries else n_cells)
    out = n_cells * channels * n_queries * dtype_bytes
    return (cells + coords + out) * n_passes


def roofline(seconds: float, bytes_moved: int,
             hbm_gbps: float = V5E_HBM_GBPS) -> dict:
    """Achieved bandwidth and % of peak for a measured pass."""
    achieved = bytes_moved / seconds / 1e9
    return {
        "seconds": seconds,
        "gbytes": bytes_moved / 1e9,
        "achieved_gbps": achieved,
        "hbm_pct": 100.0 * achieved / hbm_gbps,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
