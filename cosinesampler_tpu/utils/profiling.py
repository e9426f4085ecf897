"""Timing + roofline reporting for the sampler kernels.

The reference ships no profiling (SURVEY.md section 5); its closest artifact
is CUDA_LAUNCH_BLOCKING for debuggability.  Here:

* ``time_fn``       — scan-based device timing (one jitted lax.scan of
                      serialized repeats; Python-loop timing is invalid on
                      tunneled TPUs, see the function docstring).
* ``roofline``      — bytes-moved model for a sampler pass, so benchmarks
                      can report achieved HBM bandwidth percentage
                      (BASELINE.md target: HBM-bound on the big 3D sweep).
* ``mxu_roofline``  — MAC-count model: the one-hot-contraction kernels are
                      MXU-bound, not HBM-bound, so the meaningful
                      utilization number is achieved MACs vs the bf16 MXU
                      peak (the kernels contract in bf16 via the exact
                      3-pass split, mxu.py).
* ``fused_gather_macs`` — analytic MXU MAC counts per fused kernel
                      generation, for feeding mxu_roofline.
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
# 1 MAC = 2 FLOPs.
V5E_BF16_TMACS = V5E_BF16_TFLOPS / 2.0


def time_fn(fn, *args, iters: int = 50, warmup: int = 1) -> float:
    """Seconds per call of ``fn(*args)``: ONE jitted ``lax.scan`` of
    ``iters`` serialized applications, not a Python loop of jitted calls.

    A Python-loop timer is the wrong instrument on remote-TPU stacks:
    every dispatch pays a fixed round trip (~60 ms observed through the
    axon tunnel, scripts/time_floor.py) and the runtime can pipeline or
    replay repeated identical calls, so wall-clock around a loop measures
    dispatch, not device time.  Here the repeats run inside one device
    program, serialized by threading a tick derived from each iteration's
    first output leaf into the next iteration's first floating-point
    input leaf (so XLA cannot hoist or CSE the body), and the result is
    fetched by VALUE before the clock stops.

    ``fn`` must be jit-traceable and at least one argument leaf must be a
    floating-point array.  On shared/tunneled devices, take the min of a
    few calls on freshly perturbed inputs (see bench.py `_bench`).
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    try:
        idx = next(i for i, leaf in enumerate(leaves)
                   if hasattr(leaf, "dtype")
                   and jnp.issubdtype(leaf.dtype, jnp.inexact))
    except StopIteration:
        raise ValueError(
            "time_fn needs at least one floating-point array argument to "
            "serialize the timing scan through") from None

    @jax.jit
    def run(leaves):
        def body(tick, _):
            ls = list(leaves)
            ls[idx] = ls[idx] * (1.0 + tick).astype(ls[idx].dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, ls))
            first = jnp.asarray(jax.tree_util.tree_leaves(out)[0])
            return 1e-30 * first.ravel()[0].astype(jnp.float32), ()

        tick, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return tick

    out = None
    for _ in range(max(warmup, 1)):
        out = run(leaves)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(leaves)
    # a device->host VALUE fetch: block_until_ready alone can resolve
    # against a replayed future on tunneled devices
    float(out)
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


def mxu_roofline(seconds: float, macs: int,
                 peak_tmacs: float = V5E_BF16_TMACS) -> dict:
    """Achieved MXU MAC throughput and % of the bf16 peak."""
    achieved = macs / seconds / 1e12
    return {
        "seconds": seconds,
        "tmacs": macs / 1e12,
        "achieved_tmacs_per_sec": achieved,
        "mxu_pct": 100.0 * achieved / peak_tmacs,
    }


def fused_gather_macs(generation: str, n_cells: int, channels: int,
                      spatial: Tuple[int, ...], n_queries: int,
                      bf16_passes: int = 3) -> int:
    """MXU MACs issued by one fused blend pass of the given generation.

    Counts the one-hot contraction MACs as the MXU executes them
    (bf16_passes exact-split passes per panel, mxu.py); the per-query VPU
    weight blending is excluded.  Generations:

    * "v2_2d": 9 panels of (C*N, H*W) x (H*W, Q)         (fused2d.py)
    * "v2_3d": 27 panels of (C*N, D*H*W) x (D*H*W, Q)    (fused3d.py)
    * "v3":    27 panels of (C*N, H*W) x (H*W, Q)        (fused3s.py)
    * "v5":    9 panels of (3*C*N, K) x (K, Q), K = lane-aligned
               (rows x Wp) window                        (fused3w.py)
    * "v5_2d": 9 panels of (C*N, K) x (K, Q), K = lane-aligned
               (rows x Wp) window                        (fused2w.py)
    * "v4":    3 panels of (3*C*N*(gy+2), Wp) x (Wp, Q)  (fused3b.py)
    """
    m = n_cells * channels
    if generation == "v2_2d":
        k = spatial[0] * spatial[1]
        panels = 9
    elif generation == "v2_3d":
        k = math.prod(spatial)
        panels = 27
    elif generation == "v3":
        k = spatial[1] * spatial[2]
        panels = 27
    elif generation == "v5":
        from cosinesampler_tpu.ops.pallas.fused3w import (_npad, _win_rows,
                                                          _xpad)
        wp = _xpad(spatial[2])
        k = _win_rows(wp) * wp
        m = 3 * _npad(n_cells) * channels     # ensemble sublane-padded
        panels = 9
    elif generation == "v5_2d":
        from cosinesampler_tpu.ops.pallas.fused3w import _win_rows, _xpad
        wp = _xpad(spatial[1])
        k = _win_rows(wp) * wp
        panels = 9
    elif generation == "v4":
        from cosinesampler_tpu.ops.pallas.fused3b import (V3B_GY, _npad,
                                                          _wpad)
        k = _wpad(spatial[2])
        m = 3 * _npad(n_cells) * channels * (V3B_GY + 2)
        panels = 3
    else:
        raise ValueError(f"unknown generation {generation!r}")
    return panels * m * k * n_queries * bf16_passes


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
