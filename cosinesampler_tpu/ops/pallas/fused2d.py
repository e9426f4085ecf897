"""v2 fused 2D kernels: shared-support gather (the multicell structure win).

The PIXEL multicell trick shifts every cell's lattice by offset_n in [0, 1)
(modules_2d.py:24-27).  Consequence: for one query with base pixel coord
``b`` (before offsets), EVERY cell's floor index lies in {floor(b),
floor(b)+1}, so the corners of ALL N cells live in a single shared 3x3
texel patch.  That turns the gather into NINE one-hot matmuls shared by the
whole ensemble:

    V_ji[(n,c), q] = cells[(n,c), :] @ A_ji[:, q]      (M=N*C, K=H*W, N=Qb)

with full MXU utilization (v1 pays K=16 per cell: ~6%), while per-cell work
shrinks to VPU weight blending.  The fused transpose (bwd) uses the same
A_ji with the contraction flipped.

Scope: dim=2, padding_mode='zeros' (the only mode the reference exercises,
test_2d.py:24), shared query points, cells resident in VMEM.  Other
configurations fall back to the v1 kernels / XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SamplerConfig
from ..coords import multicell_offsets
from . import mxu
from .kernels import _valid_mask
from .prep import (FUSED_PADDING_MODES_WIDE, axis_transform, cell_weights,
                   n_shifts, npad as _npad, shift_lo)

# 256 is the sweet spot: 512 pushes the kernel's VMEM footprint past what
# Mosaic can double-buffer and throughput collapses ~20x.
V2_Q_BLOCK = 256

# output rows (kx, ky): value, jac_x, jac_y, hess_xx, hess_yy
_ROWS_2D = ((0, 0), (1, 0), (0, 1), (2, 0), (0, 2))


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int) -> bool:
    if cfg.dim != 2 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    n, c, h, w = cells_shape
    if (_npad(n) * c * h * w * 4 > vmem_budget or h * w * V2_Q_BLOCK * 4 >
            vmem_budget):
        return False
    return True


def _axis_prep(coord, size, cfg, off_col, q_block):
    """Shared base one-hots + per-cell shifted weights for one axis.

    Returns (hits, weights) where hits[j] is the (size, q_block) 0/1 row
    selector for shared row floor(base)+j, and weights[k][j] is the
    (N, q_block) order-k corner weight each cell contributes at shift j
    (see prep.py for the zeros/border coordinate transform).
    """
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    fb = jnp.floor(base)
    fbi = jnp.clip(fb, -3.0, float(size) + 2.0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, q_block), 0)
    lo = shift_lo(cfg)
    hits = [(iota == fbi + j).astype(jnp.float32)
            for j in range(lo, lo + n_shifts(cfg))]
    return hits, cell_weights(base, ixn, scale, cfg)


def _fused2_blend_kernel(x_ref, y_ref, valid_ref, off_ref, cells_ref,
                         out_ref, *, cfg, spatial, q_block, channels,
                         n_cells):
    h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)   # (1, q_block)
    off_col = off_ref[:, 0:1]                             # (N, 1)

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)

    # Split the resident cell stack into exact bf16 terms ONCE; each of the
    # 9 one-hot panels then contracts in EXACT_PASSES MXU passes instead of
    # HIGHEST's 6 (see mxu.py — the selector is exactly bf16-representable).
    cells_terms = mxu.data_terms(cells_ref[:], mxu.passes_for(cfg))  # (C*N, H*W)
    rows_acc = [jnp.zeros((c, q_block), jnp.float32) for _ in _ROWS_2D]
    for j in range(len(hy)):
        for i in range(len(hx)):
            a_ji = (hy[j][:, None, :] * hx[i][None, :, :]).reshape(
                h * w, q_block)
            v = mxu.onehot_dot_terms(
                cells_terms, a_ji, (((1,), (0,)), ((), ())))  # (C*N, Qb)
            # (C, N, Qb): the reduced/broadcast dims sit on the well-tiled
            # minor axes; (N, C, Qb) would pad C=4 sublanes to 8
            v = v.reshape(c, n, q_block)
            for r, (kx, ky) in enumerate(_ROWS_2D):
                coeff = wy[ky][j] * wx[kx][i]             # (N, Qb)
                rows_acc[r] = rows_acc[r] + jnp.sum(
                    coeff[None, :, :] * v, axis=1)
    out = jnp.concatenate(rows_acc, axis=0) * valid       # (5*C, Qb)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused2_blend(cells, points, cfg: SamplerConfig,
                        q_block: int = V2_Q_BLOCK, interpret: bool = False):
    """(5, C, Q) fused multicell value/jac/diag-Hessian (v2, 2D/zeros)."""
    n, c, h, w = cells.shape
    q = points.shape[0]
    npad = _npad(n)   # sublane-aligned ensemble: (C*N, Qb) reshapes free
    qp = pl.cdiv(q, q_block) * q_block

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(2)]
    valid = _valid_mask(q, qp, q_block)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 3)
    cells_flat = mxu.data_cast(cells_p, cfg).transpose(1, 0, 2, 3).reshape(
        c * npad, h * w)

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused2_blend_kernel, cfg=cfg, spatial=(h, w), q_block=q_block,
        channels=c, n_cells=npad)
    out = pl.pallas_call(
        kernel,
        grid=(qp // q_block,),
        in_specs=[
            coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad * c, h * w), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((5 * c, q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5 * c, qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, valid, offsets, cells_flat)
    return out[:, :q].reshape(5, c, q).astype(
        jnp.promote_types(cells.dtype, points.dtype))


def _fused2_bwd_kernel(x_ref, y_ref, valid_ref, first_ref, off_ref, g_ref,
                       out_ref, *, cfg, spatial, q_block, channels, n_cells):
    h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
    off_col = off_ref[:, 0:1]

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)

    g = g_ref[:].reshape(5, c, q_block)

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gv = [g[r] * valid for r in range(5)]                 # (C, Qb) each
    contrib = jnp.zeros((c * n, h * w), jnp.float32)
    for j in range(len(hy)):
        for i in range(len(hx)):
            a_ji = (hy[j][:, None, :] * hx[i][None, :, :]).reshape(
                h * w, q_block)
            p = jnp.zeros((c, n, q_block), jnp.float32)
            for r, (kx, ky) in enumerate(_ROWS_2D):
                coeff = wy[ky][j] * wx[kx][i]             # (N, Qb)
                p = p + coeff[None, :, :] * gv[r][:, None, :]
            contrib = contrib + mxu.onehot_dot(
                p.reshape(c * n, q_block), a_ji,
                (((1,), (1,)), ((), ())),
                passes=mxu.passes_for(cfg))                 # (C*N, H*W)
    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused2_bwd(g, points, in_spatial: Tuple[int, ...],
                      cfg: SamplerConfig, n_cells: int,
                      q_block: int = V2_Q_BLOCK, interpret: bool = False):
    """Cells-cotangent of pallas_fused2_blend: (N, C, H, W)."""
    h, w = in_spatial
    k_rows, c, q = g.shape
    n = n_cells
    npad = _npad(n)
    qp = pl.cdiv(q, q_block) * q_block

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(2)]
    valid = _valid_mask(q, qp, q_block)
    first = (jnp.arange(qp // q_block, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(qp // q_block, 1, 1)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    gq = jnp.pad(g.reshape(k_rows * c, q).astype(jnp.float32),
                 ((0, 0), (0, qp - q)))

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused2_bwd_kernel, cfg=cfg, spatial=(h, w), q_block=q_block,
        channels=c, n_cells=npad)
    acc = pl.pallas_call(
        kernel,
        grid=(qp // q_block,),
        in_specs=[
            coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows * c, q_block), lambda qi: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c * npad, h * w), lambda qi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c * npad, h * w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, valid, first, offsets, gq)
    return acc.reshape(c, npad, h, w)[:, :n].transpose(1, 0, 2, 3).astype(
        jnp.promote_types(g.dtype, points.dtype))
