"""v3 fused 3D kernels: z-binned queries + dynamic slab windows.

The v2 3D kernels (fused3d.py) gather through 27 one-hot contractions
against the WHOLE flattened volume (K = D*H*W = 4096 for 16^3), paying a
~16x FLOP redundancy for MXU-friendliness.  v3 removes that redundancy:

1. Host side (XLA, inside the same jit): queries are counting-sorted by
   ``fz = floor(base_z)`` — a cumsum over (Q, D+2) one-hots, no real sort —
   and each bin is padded to a multiple of the query block, so EVERY kernel
   block holds queries sharing one z-window [fz, fz+2].
2. Kernel side: the volume sits in VMEM as (D, C*N, H*W); each block
   dynamic-slices its 3 slabs and runs the 2D-style shared-support gather
   per slab: 27 matmuls at K = H*W = 256 instead of 4096.

The per-query scatter/gather permutations are pure XLA gathers (plus one
small int32 scatter for the inverse permutation).  Like fused2d/fused3d,
scope is padding_mode='zeros' + shared query points; other configs fall
back.  OOB queries bin into clamped edge bins and are zeroed by the
``fb == zfloor`` mask, reproducing the reference CUDA kernels'
bounds-check-to-zero semantics (cosine_sampler_3d_kernel.cu:343-369).
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
from .fused3d import _axis_prep, _ROWS_3D
from .prep import FUSED_PADDING_MODES, axis_transform, bin_base, cell_weights

V3S_Q_BLOCK = 256
# Below this many queries the bin padding (<= D+2 extra blocks) outweighs
# the 16x per-block FLOP saving over fused3d — route small clouds to v2.
V3S_MIN_Q = 2048
_ZLO = -2  # lowest fz with any in-bounds corner (fz = -2 -> corner at z=0)


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             n_queries: int | None = None) -> bool:
    if cfg.dim != 3 or cfg.padding_mode not in FUSED_PADDING_MODES:
        return False
    if n_queries is not None and n_queries < V3S_MIN_Q:
        return False
    n, c, d, h, w = cells_shape
    if n * c * d * h * w * 4 > vmem_budget:     # resident (D, C*N, H*W)
        return False
    if h * w * V3S_Q_BLOCK * 4 > vmem_budget:   # one (y,x) gather panel
        return False
    return True


def _z_weights(coord, size, cfg, off_col, zf):
    """Per-cell z corner weights for the block's slab window [zf, zf+2].

    Same shift/weight derivation as fused3d._axis_prep, but the slab index
    is implicit (the window), so no one-hot hits are built.  Returns
    (weights, zmask) with weights[k][slab] the (N, Qb) order-k weight of
    window slab ``slab`` and zmask the (1, Qb) flag fb == zf (queries from
    clamped OOB bins are zeroed).
    """
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    fb = jnp.floor(base)
    zmask = (fb == zf.astype(jnp.float32)).astype(jnp.float32)
    return cell_weights(base, ixn, scale, cfg), zmask


def _zbin(points, d: int, cfg: SamplerConfig, q_block: int):
    """Counting-sort queries by floor(base_z) with per-bin block padding.

    Returns (positions, inv, zfloor_block, valid, qp): ``positions[q]`` is
    query q's slot in the padded layout, ``inv`` the inverse map (-1 =
    padding slot), ``zfloor_block`` the per-block fz, ``valid`` the slot
    occupancy mask, ``qp`` the static padded length.
    """
    q = points.shape[0]
    nbins = d - _ZLO  # fz in [_ZLO, d-1]; anything outside contributes 0
    base = bin_base(points[:, 2].astype(jnp.float32), d, cfg)
    fb = jnp.floor(jax.lax.stop_gradient(base)).astype(jnp.int32)
    keys = jnp.clip(fb - _ZLO, 0, nbins - 1)
    onehot = (keys[:, None] == jnp.arange(nbins, dtype=jnp.int32)[None, :])
    counts = onehot.sum(axis=0, dtype=jnp.int32)
    padded = ((counts + q_block - 1) // q_block) * q_block
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    rank = jnp.cumsum(onehot, axis=0, dtype=jnp.int32) - 1
    rank_at = jnp.take_along_axis(rank, keys[:, None], axis=1)[:, 0]
    positions = offs[keys] + rank_at

    qp = (pl.cdiv(q, q_block) + nbins) * q_block  # static upper bound
    inv = jnp.full((qp,), -1, jnp.int32).at[positions].set(
        jnp.arange(q, dtype=jnp.int32), unique_indices=True)
    nblocks = qp // q_block
    start_blocks = offs // q_block
    bidx = jnp.arange(nblocks, dtype=jnp.int32)
    block_bin = (bidx[:, None] >= start_blocks[None, :]).sum(
        axis=1, dtype=jnp.int32) - 1
    zfloor_block = block_bin + _ZLO
    valid = inv >= 0
    return positions, inv, zfloor_block, valid, qp


def _fused3s_blend_kernel(x_ref, y_ref, z_ref, valid_ref, zf_ref, off_ref,
                          cells_ref, out_ref, *, cfg, spatial, q_block,
                          channels, n_cells):
    d, h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)   # (1, Qb)
    off_col = off_ref[:, 0:1]                             # (N, 1)
    zf = zf_ref[0, 0, 0]                                  # scalar int32

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)
    wz, zmask = _z_weights(z_ref[0], d, cfg, off_col, zf)

    # the 9 (y, x) panels are slab-invariant: build once
    panels = [
        (hy[j][:, None, :] * hx[i][None, :, :]).reshape(h * w, q_block)
        for j in range(3) for i in range(3)
    ]

    rows_acc = [jnp.zeros((c, q_block), jnp.float32) for _ in _ROWS_3D]
    for k in range(3):
        zq = jnp.clip(zf + k, 0, d - 1)
        kmask = ((zf + k >= 0) & (zf + k <= d - 1)).astype(jnp.float32)
        slab = cells_ref[pl.ds(zq, 1), :, :][0]            # (C*N, H*W)
        slab_terms = mxu.data_terms(slab, mxu.passes_for(cfg))
        for j in range(3):
            for i in range(3):
                v = mxu.onehot_dot_terms(
                    slab_terms, panels[3 * j + i],
                    (((1,), (0,)), ((), ())))              # (C*N, Qb)
                v = v.reshape(c, n, q_block)
                for r, (kx, ky, kz) in enumerate(_ROWS_3D):
                    coeff = (wz[kz][k] * kmask) * wy[ky][j] * wx[kx][i]
                    rows_acc[r] = rows_acc[r] + jnp.sum(
                        coeff[None, :, :] * v, axis=1)
    out = jnp.concatenate(rows_acc, axis=0) * (valid * zmask)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused3s_blend(cells, points, cfg: SamplerConfig,
                         q_block: int = V3S_Q_BLOCK, interpret: bool = False):
    """(7, C, Q) fused multicell value/jac/diag-Hessian (v3, z-binned)."""
    n, c, d, h, w = cells.shape
    q = points.shape[0]
    positions, inv, zfloor_block, valid, qp = _zbin(points, d, cfg, q_block)
    nblocks = qp // q_block

    pts_p = points.astype(jnp.float32)[jnp.maximum(inv, 0)]       # (QP, 3)
    axes = [pts_p[:, i].reshape(nblocks, 1, q_block) for i in range(3)]
    validf = valid.astype(jnp.float32).reshape(nblocks, 1, q_block)
    zf = zfloor_block.reshape(nblocks, 1, 1)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    cells_dcn = mxu.data_cast(cells, cfg).transpose(2, 1, 0, 3, 4).reshape(
        d, c * n, h * w)

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused3s_blend_kernel, cfg=cfg, spatial=(d, h, w), q_block=q_block,
        channels=c, n_cells=n)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, c * n, h * w), lambda qi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7 * c, q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7 * c, qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, validf, zf, offsets, cells_dcn)
    return out[:, positions].reshape(7, c, q).astype(
        jnp.promote_types(cells.dtype, points.dtype))


def _fused3s_bwd_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, zf_ref,
                        off_ref, g_ref, out_ref, *, cfg, spatial, q_block,
                        channels, n_cells):
    d, h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
    off_col = off_ref[:, 0:1]
    zf = zf_ref[0, 0, 0]

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)
    wz, zmask = _z_weights(z_ref[0], d, cfg, off_col, zf)

    panels = [
        (hy[j][:, None, :] * hx[i][None, :, :]).reshape(h * w, q_block)
        for j in range(3) for i in range(3)
    ]

    g = g_ref[:].reshape(7, c, q_block)
    gv = [g[r] * (valid * zmask) for r in range(7)]

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(3):
        zq = jnp.clip(zf + k, 0, d - 1)
        kmask = ((zf + k >= 0) & (zf + k <= d - 1)).astype(jnp.float32)
        contrib = jnp.zeros((c * n, h * w), jnp.float32)
        for j in range(3):
            for i in range(3):
                p = jnp.zeros((c, n, q_block), jnp.float32)
                for r, (kx, ky, kz) in enumerate(_ROWS_3D):
                    coeff = (wz[kz][k] * kmask) * wy[ky][j] * wx[kx][i]
                    p = p + coeff[None, :, :] * gv[r][:, None, :]
                contrib = contrib + mxu.onehot_dot(
                    p.reshape(c * n, q_block), panels[3 * j + i],
                    (((1,), (1,)), ((), ())),
                passes=mxu.passes_for(cfg))              # (C*N, H*W)
        out_ref[pl.ds(zq, 1), :, :] += contrib[None]


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused3s_bwd(g, points, in_spatial: Tuple[int, ...],
                       cfg: SamplerConfig, n_cells: int,
                       q_block: int = V3S_Q_BLOCK, interpret: bool = False):
    """Cells-cotangent of pallas_fused3s_blend: (N, C, D, H, W)."""
    d, h, w = in_spatial
    k_rows, c, q = g.shape
    n = n_cells
    positions, inv, zfloor_block, valid, qp = _zbin(points, d, cfg, q_block)
    nblocks = qp // q_block

    pts_p = points.astype(jnp.float32)[jnp.maximum(inv, 0)]
    axes = [pts_p[:, i].reshape(nblocks, 1, q_block) for i in range(3)]
    validf = valid.astype(jnp.float32).reshape(nblocks, 1, q_block)
    first = (jnp.arange(nblocks, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(nblocks, 1, 1)
    zf = zfloor_block.reshape(nblocks, 1, 1)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    gq = g.reshape(k_rows * c, q).astype(jnp.float32)[
        :, jnp.maximum(inv, 0)]                            # (7C, QP)

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused3s_bwd_kernel, cfg=cfg, spatial=(d, h, w), q_block=q_block,
        channels=c, n_cells=n)
    acc = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows * c, q_block), lambda qi: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, c * n, h * w), lambda qi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c * n, h * w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, validf, first, zf, offsets, gq)
    return acc.reshape(d, c, n, h, w).transpose(2, 1, 0, 3, 4).astype(
        jnp.promote_types(g.dtype, points.dtype))
