"""v7 per-cell binned kernels: blend/splat for big volumes, bin-sorted.

The slab route (slab.py) serves ANY over-VMEM volume but evaluates every
query against every slab of every cell — correctness-first, measured
1.34 Mpts/s at the 4x4x128^3 / 16k-point per-cell workload
(BENCHMARKS.md "Per-cell"), an ~8x cliff against the ensemble path.
This generation adds the missing binning (VERDICT r4 #4): each (cell,
query) pair touches exactly ONE cell and a 2-3-row z window, so

1. pairs are bin-sorted by ``(cell, floor(base_z) // dz)`` (the fused3b
   counting-sort machinery, per-bin block padding);
2. the padded volume is re-laid out as per-bin windows
   ``(nbins, C*(dz+2)*H, W)`` (H folded next to the window rows so both
   in-kernel splits are layout-free; dz chosen so dz+2 is a sublane
   multiple);
3. the BLEND reads each block's window through a scalar-prefetch-indexed
   input BlockSpec — consecutive blocks of one bin reuse the resident
   window, Mosaic pipelines the rest — and runs the v1 two-stage
   contraction (MXU over x at K=W, VPU reduces y then the z window);
4. the SPLAT accumulates into PRIVATE per-bin accumulator blocks via a
   scalar-prefetch-indexed OUTPUT BlockSpec (the ghost-accumulator
   pattern of fused3b — here the bin count is small, ~tens, so the XLA
   overlap-add fold is cheap, unlike the 128^3 fused case where it
   measured a net loss).

Work no longer multiplies with the slab count OR the ensemble size: a
query block touches one (cell, window) pair.  Serves the SAME seam as
slab.py (the per-order blend/splat family behind ops/sampler's
custom_vjp chain) for dim=3, all padding modes, any derivative order,
per-cell OR shared grids (shared grids expand to N x Q pairs — each
cell still needs its own offset lattice).

Reference bar: the shape-oblivious grid-stride kernel this route
matches, cosine_sampler_3d_kernel.cu:250-371, which never pays a
binning pass but reads HBM at random per thread.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SamplerConfig, effective_align
from ..coords import compute_source_coords, multicell_offsets
from .fused3b import _occ_mask, scatter_to_slots
from .kernels import _axis_onehot
from .prep import VMEM_BUDGET
from .slab import _slab_onehot

PC_Q_BLOCK = 128
_FP = 1            # z front pad: absorbs reflection's shift_lo = -1 corner
_MIN_PAIRS = 2048
_MIN_PAIRS_PER_BIN = 4
_ONEHOT_RANK_BYTES = 64 << 20


def _pick_dz(c: int, d: int, h: int, w: int, budget: int,
             q_block: int = PC_Q_BLOCK) -> Optional[int]:
    """Largest dz with rows = dz + 2 a sublane multiple and the window +
    kernel buffers inside budget/2; None -> no geometry (slab serves)."""
    best = None
    dz = 6                      # rows = 8
    while dz <= d + 8:
        rows = dz + _FP + 1
        if rows > d:            # windows must fit the raw volume (blend
            break               # clamps physical origins in-bounds)
        win = c * rows * h * w * 4
        t1 = c * rows * h * q_block * 4          # blend stage 1
        splat_p = c * w * q_block * 4
        r_outer = rows * h * q_block * 4
        acc = rows * h * c * w * 4               # splat out block
        if max(win, t1, splat_p, r_outer, acc) <= budget // 2:
            best = dz
        dz += 8
    return best


def supports(cfg: SamplerConfig, cells_shape, budget: int,
             n_pairs: int | None = None) -> bool:
    """True when the binned per-cell route serves this volume/cloud.

    ``n_pairs`` = N * queries-per-cell (the pair count the kernels see).
    Requires enough pairs to amortize the per-bin block padding; sparse
    clouds fall back to the slab route."""
    if cfg.dim != 3:
        return False
    n, c = cells_shape[:2]
    d, h, w = cells_shape[2:]
    dz = _pick_dz(c, d, h, w, budget)
    if dz is None or d < dz + _FP + 1:   # blend clamps windows in-bounds
        return False
    ns = -(-d // dz)
    nbins = n * ns
    if n_pairs is not None and n_pairs < max(_MIN_PAIRS,
                                             _MIN_PAIRS_PER_BIN * nbins):
        return False
    return True


def _bin_pairs(points, offsets, d: int, dz: int, ns: int, n: int,
               cfg: SamplerConfig, q_block: int):
    """Sort (cell, query) pairs by (cell, z slab) with per-bin block
    padding.  ``points``: (n, q, 3) per-cell coords (shared grids are
    pre-broadcast); ``offsets``: (n,) per-cell multicell offsets.

    Returns (positions (n*q,), occ (qp,), bix (nblocks,), origin
    (nblocks,), cell (nblocks,), qp).  The binning basis replicates the
    kernel's coordinate transform bit-for-bit (compute_source_coords on
    the z coord with the CELL's offset), so bin membership and the
    in-window one-hot rows always agree.
    """
    nq = points.shape[1]
    npairs = n * nq
    z = points[:, :, 2].astype(jnp.float32)
    base, _ = compute_source_coords(z, d, cfg.padding_mode,
                                    cfg.align_corners, cfg.multicell,
                                    offsets[:, None],
                                    strict=cfg.strict_reference)
    fz = jnp.floor(jax.lax.stop_gradient(base)).astype(jnp.int32)
    si = jnp.clip(fz // dz, 0, ns - 1)
    key = (jnp.arange(n, dtype=jnp.int32)[:, None] * ns + si
           ).reshape(npairs)
    nbins = n * ns
    qp = (pl.cdiv(npairs, q_block) + nbins) * q_block
    iota = jnp.arange(npairs, dtype=jnp.int32)

    if npairs * nbins * 4 <= _ONEHOT_RANK_BYTES:
        onehot = (key[:, None] == jnp.arange(nbins, dtype=jnp.int32)[None]
                  ).astype(jnp.int32)
        counts = onehot.sum(axis=0, dtype=jnp.int32)
        rank = ((jnp.cumsum(onehot, axis=0) - 1) * onehot).sum(axis=1)
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum = jnp.cumsum(padded).astype(jnp.int32)
        offs = cum - padded
        positions = offs[key] + rank
    else:
        skey, perm = jax.lax.sort_key_val(key, iota)
        edges = jnp.searchsorted(
            skey, jnp.arange(nbins + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = edges[1:] - edges[:-1]
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum = jnp.cumsum(padded).astype(jnp.int32)
        offs = cum - padded
        delta = offs - edges[:-1]
        ddelta = jnp.concatenate([delta[:1], delta[1:] - delta[:-1]])
        dstep = jnp.zeros((npairs,), jnp.int32).at[edges[:-1]].add(
            ddelta, mode="drop")
        spos = jnp.cumsum(dstep) + iota
        positions = jnp.zeros((npairs,), jnp.int32).at[perm].set(spos)

    from .fused3b import _step_starts

    nblocks = qp // q_block
    occ = _occ_mask(offs, counts, qp)
    bidx = jnp.arange(nblocks, dtype=jnp.int32)
    bix = jnp.minimum(_step_starts(offs, nblocks, granularity=q_block),
                      nbins - 1)
    hasv = (occ[bidx * q_block] > 0).astype(jnp.int32)
    # tail padding blocks: remap to the last REAL block's bin so a
    # revisited (splat) output block is never revisited non-consecutively
    last_real = bix[jnp.maximum(jnp.max(bidx * hasv), 0)]
    bix = jnp.where(hasv > 0, bix, last_real).astype(jnp.int32)
    # LOGICAL origin (uniform stride — the splat fold's band structure
    # relies on it) and PHYSICAL origin (clamped so [po, po+rows) stays
    # inside the raw volume — the blend DMAs windows straight from the
    # unpadded cells; corners outside the clamped window are upper-edge
    # cases whose weights are exactly zero (border/reflection) or
    # OOB-dropped (zeros))
    rows = dz + _FP + 1
    origin_log = (bix % ns) * dz - _FP
    origin_phys = jnp.clip(origin_log, 0, d - rows)
    cell = bix // ns
    return positions, occ, bix, origin_log, origin_phys, cell, hasv, qp


def _windows(vol_p, n, c, ns, dz, rows, h, w):
    """(N, C, Dp, H, W) padded volume -> (N*ns, C*rows*H, W) windows.

    H is folded BETWEEN the window rows and W (transpose) so the kernel's
    two sublane splits — (C*rows*H) -> (C*rows, H) for the y reduce and
    (C*rows) -> (C, rows) for the z reduce... — wait, the layout is
    (C, rows, H): split 1 peels H (multiple of the sublane tile for the
    volumes this route serves), split 2 peels rows (dz+2, a sublane
    multiple by _pick_dz construction)."""
    idx = jnp.arange(n * ns, dtype=jnp.int32)
    ni = idx // ns
    zi = (idx % ns) * dz
    zero = jnp.int32(0)

    def one(a, b):
        return jax.lax.dynamic_slice(vol_p, (a, zero, b, zero, zero),
                                     (1, c, rows, h, w))

    wins = jax.vmap(one)(ni, zi)
    return wins.reshape(n * ns, c * rows * h, w)


def _prep_host(shape, grid, cfg, q_block):
    """Shared host prep: broadcast shared grids to per-cell pairs, bin,
    slot-scatter the coords.  ``shape`` = (N, C, D, H, W)."""
    n, c, d, h, w = shape
    ng = grid.shape[0]
    qn = math.prod(grid.shape[1:-1])
    pts = grid.reshape(ng, qn, 3).astype(jnp.float32)
    if ng == 1 and n > 1:
        pts = jnp.broadcast_to(pts, (n, qn, 3))
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)
    dz = _pick_dz(c, d, h, w, VMEM_BUDGET, q_block)
    if dz is None:
        raise ValueError(
            f"percell: no window geometry for volume {(n, c, d, h, w)} at "
            f"q_block={q_block} (supports() would have rejected this — "
            "route through the dispatcher)")
    ns = -(-d // dz)
    positions, occ, bix, origin_log, origin_phys, cell, hasv, qp = \
        _bin_pairs(pts, offsets, d, dz, ns, n, cfg, q_block)
    pts_p = scatter_to_slots(pts.reshape(n * qn, 3), positions, qp)
    nblocks = qp // q_block
    xyv = jnp.concatenate([pts_p.T, occ[None]], axis=0).reshape(
        4, nblocks, q_block).transpose(1, 0, 2)
    return (qn, dz, ns, positions, occ, bix, origin_log, origin_phys,
            cell, hasv, qp, nblocks, xyv, offsets)


# blend DMA-chain metadata (int SMEM row per block)
(_B_NI, _B_PO, _B_HASV, _B_FIRST, _B_SBF, _B_NNI, _B_NPO, _B_NHAS,
 _B_PAR) = range(9)


def _blend_pc_kernel(xyv_ref, fmeta_ref, imeta_ref, vol_ref, out_ref,
                     scratch, sem, *, cfg, spatial, dz, q_block, channels,
                     orders):
    d, h, w = spatial
    c = channels
    rows = dz + _FP + 1
    ni = imeta_ref[0, 0, _B_NI]
    po = imeta_ref[0, 0, _B_PO]
    p = imeta_ref[0, 0, _B_PAR]

    # Double-buffered per-bin window DMA straight from the RAW volume
    # (fused3b super-brick chain): the first block of a bin waits its own
    # window (started a bin earlier) and starts the NEXT bin's into the
    # other slot.  An XLA window prebuild measured 4.24 ms of the 5.34 ms
    # forward at the smoke shape (scripts/ablate_percell.py) — the DMA
    # formulation deletes it (and the volume pad) entirely.
    def win_dma(slot, a, b):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(a, 1), :, pl.ds(b, rows)],
            scratch.at[pl.ds(slot, 1)], sem.at[slot])

    @pl.when(imeta_ref[0, 0, _B_HASV] > 0)
    def _():
        @pl.when(imeta_ref[0, 0, _B_FIRST] > 0)
        def _():
            win_dma(p, ni, po).start()

        @pl.when(imeta_ref[0, 0, _B_SBF] > 0)
        def _():
            win_dma(p, ni, po).wait()

        @pl.when((imeta_ref[0, 0, _B_SBF] > 0)
                 & (imeta_ref[0, 0, _B_NHAS] > 0))
        def _():
            win_dma(1 - p, imeta_ref[0, 0, _B_NNI],
                    imeta_ref[0, 0, _B_NPO]).start()

        valid = xyv_ref[0, 3] > 0.5
        off = fmeta_ref[0, 0, 0]
        origin = fmeta_ref[0, 0, 1]
        ox, oy, oz = orders      # family convention: per (x, y, z) axis
        rx = _axis_onehot(xyv_ref[0, 0], w, cfg, ox, off, valid, q_block)
        ry = _axis_onehot(xyv_ref[0, 1], h, cfg, oy, off, valid, q_block)
        rz = _slab_onehot(xyv_ref[0, 2], d, rows, origin, cfg, oz, off,
                          valid, q_block)
        a = scratch[pl.ds(p, 1)][0].reshape(c * rows * h, w)
        t1 = jax.lax.dot_general(a, rx, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        t1 = t1.reshape(c * rows, h, q_block)
        t2 = jnp.sum(t1 * ry[None], axis=1)            # (C*rows, Qb)
        t2 = t2.reshape(c, rows, q_block)
        out_ref[0] = jnp.sum(t2 * rz[None], axis=1)    # (C, Qb)

    @pl.when(imeta_ref[0, 0, _B_HASV] == 0)
    def _():
        out_ref[0] = jnp.zeros((c, q_block), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "orders", "q_block",
                                             "interpret"))
def pallas_blend_percell(input, grid, cfg: SamplerConfig,
                         orders: Tuple[int, ...],
                         q_block: int = PC_Q_BLOCK,
                         interpret: bool = False):
    """Binned per-cell blend (same contract as generic.blend, dim=3)."""
    if effective_align(cfg, orders) != cfg.align_corners:
        cfg = dataclasses.replace(cfg, align_corners=True)
    n, c = input.shape[:2]
    d, h, w = input.shape[2:]
    (qn, dz, ns, positions, occ, bix, origin_log, origin_phys, cell, hasv,
     qp, nblocks, xyv, offsets) = _prep_host((n, c, d, h, w), grid, cfg,
                                             q_block)
    rows = dz + _FP + 1
    fmeta = jnp.stack([offsets[cell], origin_phys.astype(jnp.float32)],
                      axis=1).reshape(nblocks, 1, 2)
    # next-bin DMA metadata (the fused3b segment machinery)
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    sbf = ((bi == 0) | (bix != jnp.roll(bix, 1))).astype(jnp.int32)
    first = (bi == 0).astype(jnp.int32)
    hn = jnp.roll(hasv, -1).at[-1].set(0)
    seg = jnp.cumsum(sbf) - 1
    is_last = (bix != jnp.roll(bix, -1)).at[-1].set(True)
    idx = jnp.where(is_last, seg, nblocks)
    ni_n = jnp.roll(cell, -1).at[-1].set(cell[-1])
    po_n = jnp.roll(origin_phys, -1).at[-1].set(origin_phys[-1])
    nni = jnp.zeros((nblocks,), jnp.int32).at[idx].set(
        ni_n, mode="drop")[seg]
    npo = jnp.zeros((nblocks,), jnp.int32).at[idx].set(
        po_n, mode="drop")[seg]
    nhas = jnp.zeros((nblocks,), jnp.int32).at[idx].set(
        hn, mode="drop")[seg]
    par = (seg % 2).astype(jnp.int32)
    imeta = jnp.stack(
        [cell, origin_phys, hasv, first, sbf, nni, npo, nhas, par],
        axis=1).astype(jnp.int32).reshape(nblocks, 1, 9)

    kernel = functools.partial(_blend_pc_kernel, cfg=cfg, spatial=(d, h, w),
                               dz=dz, q_block=q_block, channels=c,
                               orders=tuple(orders))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 9), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, c, q_block), lambda qi: (qi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, c, q_block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, rows, h, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyv, fmeta, imeta, input.astype(jnp.float32))
    out_q = out.transpose(1, 0, 2).reshape(c, qp)[:, positions]
    out_q = out_q.reshape(c, n, qn).transpose(1, 0, 2)
    out_dtype = jnp.promote_types(input.dtype, grid.dtype)
    return out_q.reshape(n, c, *grid.shape[1:-1]).astype(out_dtype)


def _splat_pc_kernel(bix_ref, xyv_ref, fmeta_ref, imeta_ref, g_ref,
                     out_ref, *, cfg, spatial, dz, q_block, channels,
                     orders):
    del bix_ref
    d, h, w = spatial
    c = channels
    rows = dz + _FP + 1
    valid = xyv_ref[0, 3] > 0.5
    off = fmeta_ref[0, 0, 0]
    origin = fmeta_ref[0, 0, 1]
    ox, oy, oz = orders

    @pl.when(imeta_ref[0, 0, _SP] == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(imeta_ref[0, 0, _HASV] > 0)
    def _():
        rx = _axis_onehot(xyv_ref[0, 0], w, cfg, ox, off, valid, q_block)
        ry = _axis_onehot(xyv_ref[0, 1], h, cfg, oy, off, valid, q_block)
        rz = _slab_onehot(xyv_ref[0, 2], d, rows, origin, cfg, oz, off,
                          valid, q_block)
        g = g_ref[0]                                    # (C, Qb)
        p = (g[:, None, :] * rx[None]).reshape(c * w, q_block)
        r_outer = (rz[:, None, :] * ry[None]).reshape(rows * h, q_block)
        contrib = jax.lax.dot_general(
            r_outer, p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # (rows*H, C*W)
        out_ref[0] = out_ref[0] + contrib


_SP, _HASV = range(2)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "orders",
                                             "q_block", "interpret"))
def pallas_splat_percell(gout, grid, in_spatial: Tuple[int, ...],
                         cfg: SamplerConfig, orders: Tuple[int, ...],
                         q_block: int = PC_Q_BLOCK,
                         interpret: bool = False):
    """Binned per-cell splat (transpose; same contract as generic.splat).

    Private per-bin accumulator blocks (scalar-prefetch-indexed output,
    zeroed at each bin's first block, Mosaic-pipelined writeback) + an
    XLA overlap-add over the z-window overlaps — cheap here (tens of
    bins) where the same pattern measured a net loss at the 128^3 fused
    scale (fused3b ghost notes)."""
    n, c = gout.shape[:2]
    d, h, w = in_spatial
    (qn, dz, ns, positions, occ, bix, origin_log, origin_phys, cell, hasv,
     qp, nblocks, xyv, offsets) = _prep_host((n, c, d, h, w), grid, cfg,
                                             q_block)
    rows = dz + _FP + 1
    nbins = n * ns
    fmeta = jnp.stack([offsets[cell], origin_log.astype(jnp.float32)],
                      axis=1).reshape(nblocks, 1, 2)
    gq = scatter_to_slots(
        gout.reshape(n, c, qn).transpose(0, 2, 1).reshape(n * qn, c)
        .astype(jnp.float32), positions, qp)
    gq = gq.reshape(nblocks, q_block, c).transpose(0, 2, 1)

    spg = (bix == jnp.roll(bix, 1)).astype(jnp.int32).at[0].set(0)
    visited = jnp.zeros((nbins,), jnp.int32).at[bix].max(1, mode="drop")
    imeta = jnp.stack([spg, hasv], axis=1).reshape(nblocks, 1, 2)

    kernel = functools.partial(_splat_pc_kernel, cfg=cfg, spatial=(d, h, w),
                               dz=dz, q_block=q_block, channels=c,
                               orders=tuple(orders))
    acc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, 4, q_block),
                             lambda qi, bix_ref: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda qi, bix_ref: (qi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2), lambda qi, bix_ref: (qi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, c, q_block),
                             lambda qi, bix_ref: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows * h, c * w),
                                   lambda qi, bix_ref: (bix_ref[qi], 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct((nbins, rows * h, c * w),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bix, xyv, fmeta, imeta, gq)

    # Fold (padded-band overlap-add, _scatter_windows2 pattern): window
    # row r of slab si is texel si*dz - _FP + r, i.e. shifted index
    # si*dz + r in a frame where texel t lives at index t + _FP.
    # Consecutive windows (stride dz, rows dz + _FP + 1) overlap by
    # _FP + 1 rows; split into a dz-row own band at [si*dz, ...) and the
    # spill rows zero-padded to a dz band at [si*dz + dz, ...).
    acc = jnp.where(visited[:, None, None] > 0, acc, 0.0)
    acc = acc.reshape(n, ns, rows, h, c, w)
    volp = jnp.zeros((n, ns * dz + dz, h, c, w), jnp.float32)
    own = acc[:, :, :dz].reshape(n, ns * dz, h, c, w)
    volp = volp.at[:, 0:ns * dz].add(own)
    spill = jnp.pad(acc[:, :, dz:], ((0, 0), (0, 0), (0, dz - _FP - 1),
                                     (0, 0), (0, 0), (0, 0)))
    volp = volp.at[:, dz:dz + ns * dz].add(
        spill.reshape(n, ns * dz, h, c, w))
    vol = volp[:, _FP:_FP + d]                   # back to texel frame
    out = vol.transpose(0, 3, 1, 2, 4)           # (N, C, D, H, W)
    return out.astype(jnp.promote_types(gout.dtype, grid.dtype))
