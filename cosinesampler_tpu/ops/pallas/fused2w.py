"""v5 windowed 2D fused kernels: the (y, x) gather window folded into K.

The v2 2D kernels (fused2d.py) are genuinely MXU-bound — measured ~74%
of the v5e bf16 MXU peak (bench.py extras) — so unlike the VPU-bound 3D
case, halving the contraction work translates ~directly into wall clock.
This generation applies the fused3w windowing to 2D:

1. Queries are binned by ``floor(base_y) // gy`` (a handful of bins for
   16^2 grids; dense counting sort like fused3s._zbin).
2. The zero-padded grid is re-laid out as per-bin windows
   ``(nbins, C*N, (gy+2)*Wp)`` with the (rows, x) window flattened onto
   the LANE dim host-side.
3. Each of the 9 corner pairs gathers in ONE one-hot matmul at
   K = (gy+2)*Wp (128 for 16^2) instead of K = H*W = 256: 2x fewer MXU
   MACs than fused2d.
4. Window DMA is double-buffered across grid steps; the gradient
   accumulates disjoint per-bin window cotangents with same-bin RMW
   elision, then an XLA overlap-add folds them back (fused3w pattern,
   minus the z axis).

Scope: dim=2, any padding mode (zeros / border / reflection), shared
query points.  Reflection uses the widened 4-shift patch: window rows
grow to gy + 3 and the per-axis corner loops run over 4 shifts
(prep.n_shifts), with binning on the FOLDED y coordinate.
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
from .fused2d import _ROWS_2D
from .fused3b import (_ONEHOT_RANK_BYTES, _occ_mask, _step_starts,
                      scatter_to_slots)
from .fused3w import _win_geom, _x_prep, _y_prep
from .prep import (FUSED_PADDING_MODES_WIDE, VMEM_BUDGET, bin_base,
                   front_pad, n_shifts, npad as _npad)

V2W_Q_BLOCK = 512
V2W_MIN_Q = 2048
_WIN_HBM_BUDGET = 1 << 30
_MIN_Q_PER_BIN = 8
# Largest-first: bigger blocks amortize per-block fixed cost; smaller ones
# shrink the (K, Qb) hit panel, which is what grows with W.  128 is the
# Mosaic lane tile, the useful minimum.
_QB_CANDIDATES = (V2W_Q_BLOCK, 256, 128)


def _resolve_qb(cfg, cells_shape, q_block):
    qb = q_block or pick_q_block(cfg, cells_shape)
    if qb is None:
        raise ValueError(
            f"fused2w: no q_block candidate fits VMEM for cells shape "
            f"{tuple(cells_shape)}; route through the dispatcher "
            "(supports() would have rejected this shape)")
    return qb


def _pad_super(occ, y0, hasv, pts_p, qp, q_block: int, sb: int):
    """Append all-padding blocks so the block count divides ``sb``.

    Sub-blocking (``sb`` consecutive q_block groups per Pallas grid step)
    amortizes the ~1.2-1.5 us/block fixed grid-step cost (BENCHMARKS.md
    ablations) WITHOUT coarsening the bin-padding granularity — padding
    stays per q_block, so the slot layout (and any precomputed plan) is
    sb-independent; only the grid geometry changes here."""
    nblocks = qp // q_block
    extra = -(-nblocks // sb) * sb - nblocks
    if extra:
        occ = jnp.pad(occ, (0, extra * q_block))
        pts_p = jnp.pad(pts_p, ((0, extra * q_block), (0, 0)))
        y0 = jnp.pad(y0, (0, extra), mode="edge")
        hasv = jnp.pad(hasv, (0, extra))
        qp += extra * q_block
    return occ, y0, hasv, pts_p, qp


def _geom2(h: int, gy: int, fp: int = 2):
    nby = -(-(h + 2) // gy)
    return nby, nby * gy + fp         # (nbins, padded H)


def _vmem_ok(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             q_block: int, sb: int = 1) -> bool:
    n, c, h, w = cells_shape
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    k = rows * wp
    cn = _npad(n) * c
    if 2 * cn * k * 4 > vmem_budget:                # double-buffer scratch
        return False
    if mxu.passes_for(cfg) * cn * k * 2 > vmem_budget:
        return False
    if k * q_block * 4 > vmem_budget:               # (K, Qb) hit panel
        return False
    # per-grid-step IO blocks scale with sb: (3, sb*Qb) coords + the
    # (5C, sb*Qb) out/cotangent block
    if (3 + 5 * c) * sb * q_block * 4 > vmem_budget:
        return False
    return True


def pick_q_block(cfg: SamplerConfig, cells_shape,
                 vmem_budget: int = VMEM_BUDGET) -> int | None:
    """Largest query-block candidate whose buffers fit the VMEM budget.

    K = rows * Wp grows with the grid width, so wide 2D grids (the
    reference accepts any H, W — cosine_sampler_2d.cpp:57 allocates from
    the grid shape) only fit with a smaller block; a fixed default would
    push them off the fast path entirely.  None when no candidate fits.
    """
    for qb in _QB_CANDIDATES:
        if _vmem_ok(cfg, cells_shape, vmem_budget, qb):
            return qb
    return None


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             n_queries: int | None = None,
             q_block: int | None = None, sb: int = 1) -> bool:
    if cfg.dim != 2 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    q_block = q_block or pick_q_block(cfg, cells_shape, vmem_budget)
    if q_block is None or not _vmem_ok(cfg, cells_shape, vmem_budget,
                                       q_block, sb):
        return False
    n, c, h, w = cells_shape
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    k = rows * wp
    cn = _npad(n) * c
    nby, hp = _geom2(h, gy, fp)
    if nby * cn * k * 4 > _WIN_HBM_BUDGET:
        return False
    if n_queries is not None and n_queries < max(
            V2W_MIN_Q, _MIN_Q_PER_BIN * nby):
        return False
    return True


def _ybin(points, h: int, cfg: SamplerConfig, q_block: int, gy: int):
    """Counting-sort queries by y row group with per-bin block padding.

    Same structure as fused3s._zbin (dense one-hot counting sort — the
    bin count is tiny); returns (positions, occ, y0_block, hasv, qp)
    with occ the (qp,) slot-occupancy mask (see fused3b._brick_bin).
    """
    q = points.shape[0]
    nby, _ = _geom2(h, gy)
    base = bin_base(points[:, 1].astype(jnp.float32), h, cfg)
    fy = jnp.floor(jax.lax.stop_gradient(base)).astype(jnp.int32)
    keys = jnp.clip((fy + 2) // gy, 0, nby - 1)
    qp = (pl.cdiv(q, q_block) + nby) * q_block
    iota = jnp.arange(q, dtype=jnp.int32)

    if q * nby * 4 <= _ONEHOT_RANK_BYTES:
        # Few bins: sort-free ranks via a (Q, nby) one-hot cumsum; own-bin
        # rank via mask-sum (take_along_axis is a per-row gather).
        onehot = (keys[:, None] == jnp.arange(nby, dtype=jnp.int32)[None, :]
                  ).astype(jnp.int32)
        counts = onehot.sum(axis=0, dtype=jnp.int32)
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum_padded = jnp.cumsum(padded).astype(jnp.int32)
        offs = cum_padded - padded
        rank = jnp.cumsum(onehot, axis=0, dtype=jnp.int32) - 1
        rank_at = (rank * onehot).sum(axis=1, dtype=jnp.int32)
        positions = offs[keys] + rank_at
    else:
        # Many bins (tall grids): the dense one-hot would be Q*nby ints;
        # sort + bin-boundary scatters instead (fused3b._brick_bin path).
        skey, perm = jax.lax.sort_key_val(keys, iota)
        edges = jnp.searchsorted(
            skey, jnp.arange(nby + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = edges[1:] - edges[:-1]
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum_padded = jnp.cumsum(padded).astype(jnp.int32)
        offs = cum_padded - padded
        delta = offs - edges[:-1]
        ddelta = jnp.concatenate([delta[:1], delta[1:] - delta[:-1]])
        dstep = jnp.zeros((q,), jnp.int32).at[edges[:-1]].add(
            ddelta, mode="drop")
        spos = jnp.cumsum(dstep) + iota
        positions = jnp.zeros((q,), jnp.int32).at[perm].set(spos)

    occ = _occ_mask(offs, counts, qp)
    nblocks = qp // q_block
    bidx = jnp.arange(nblocks, dtype=jnp.int32)
    block_bin = jnp.minimum(
        _step_starts(offs, nblocks, granularity=q_block), nby - 1)
    y0_block = block_bin * gy
    hasv = (occ[bidx * q_block] > 0).astype(jnp.int32)
    return positions, occ, y0_block, hasv, qp


def make_plan(points, in_spatial, cfg: SamplerConfig,
              q_block: int = V2W_Q_BLOCK, sb: int = 1):
    """Precompute the bin plan for a FIXED point set (fused3b.make_plan
    rationale): (positions, occ, y0, hasv, pts_p).

    A plan is only valid for the exact q_block the kernels will run with;
    the dispatcher (ops/pallas/__init__) resolves the adaptive/tuned block
    once and passes it to both this and the kernels.  ``sb`` is accepted
    for tuned-kwargs symmetry but does not affect the layout: sub-block
    padding is applied inside the kernels (_pad_super)."""
    del sb
    h, w = in_spatial
    gy = _win_geom(w, cfg)[2]
    positions, occ, y0, hasv, qp = _ybin(points, h, cfg, q_block, gy)
    pts_p = scatter_to_slots(points.astype(jnp.float32), positions, qp)
    return (positions, occ, y0, hasv, pts_p)


def _plan_or_bin2(points, h, cfg, q_block, gy, plan):
    if plan is None:
        positions, occ, y0, hasv, qp = _ybin(points, h, cfg, q_block, gy)
        pts_p = scatter_to_slots(points.astype(jnp.float32), positions, qp)
    else:
        positions, occ, y0, hasv, pts_p = plan
        qp = occ.shape[0]
    return positions, occ, y0, hasv, pts_p, qp


def _pad_grid(cells, h, w, hp, wp, fp=2, cfg=None):
    """(N,C,H,W) -> zero-padded (C*N, Hp, Wp) layout; texel row t sits at
    padded t + fp (fp = 3 absorbs reflection's shift_lo = -1 corner).
    bf16 cells keep their dtype (mxu.data_cast): half the window DMA
    bytes, single-pass MXU."""
    n, c = cells.shape[:2]
    cells_f = mxu.data_cast(cells, cfg).transpose(1, 0, 2, 3).reshape(
        c * n, h, w)
    return jnp.pad(cells_f, ((0, 0), (fp, hp - h - fp), (0, wp - w)))


def _windows2(vol, nby, gy, rows):
    cn, hp, wp = vol.shape
    zero = jnp.int32(0)
    by = jnp.arange(nby, dtype=jnp.int32) * gy

    def one(y0b):
        return jax.lax.dynamic_slice(vol, (zero, y0b, zero), (cn, rows, wp))

    wins = jax.vmap(one)(by)
    return wins.reshape(nby, cn, rows * wp)


def _scatter_windows2(wins, nby, gy, rows, cn, hp, wp, fp=2):
    """Overlap-add per-bin window cotangents back onto (C*N, Hp, Wp).
    The fp spill rows land in the next y group (gy >= fp by _win_geom)."""
    wins = wins.reshape(nby, cn, rows, wp)
    own = wins[:, :, :gy]
    ovf = wins[:, :, gy:]
    ext = nby * gy + gy
    out = jnp.zeros((cn, ext, wp), wins.dtype)
    out = out.at[:, :nby * gy].add(
        own.transpose(1, 0, 2, 3).reshape(cn, nby * gy, wp))
    ovf_p = jnp.pad(ovf, ((0, 0), (0, 0), (0, gy - fp), (0, 0)))
    out = out.at[:, gy:gy + nby * gy].add(
        ovf_p.transpose(1, 0, 2, 3).reshape(cn, nby * gy, wp))
    return out[:, :hp]


# Merged per-block inputs (fused3b/fused3w idiom: per-grid-step fixed cost
# scales with the BlockSpec count): one (1, 3, Qb) VMEM block carries
# x/y/valid, one SMEM int vector the block metadata.
_M_Y0, _M_HASV, _M_BBN, _M_FIRST, _M_HN, _M_PAR = range(6)
_MB_Y0, _MB_HASV, _MB_SP, _MB_SN = range(4)


def _fused2w_blend_kernel(xyv_ref, meta_ref, off_ref,
                          win_ref, out_ref, scratch, sem, *, cfg, spatial,
                          gy, q_block, sb, channels, n_cells, wp):
    h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)

    # Prefetch chain gated to the real-block prefix (_ybin packs real
    # blocks first); padding blocks skip the window DMA entirely.
    def win_dma(slot, b):
        return pltpu.make_async_copy(win_ref.at[pl.ds(b, 1)],
                                     scratch.at[pl.ds(slot, 1)], sem.at[slot])

    # sb consecutive q_block sub-groups per grid step (unrolled): the
    # per-grid-step fixed cost (~1.2-1.5 us) is paid once per sb groups
    # while bin padding stays q_block-granular.  meta/parity/prefetch
    # flags are per SUB-group (global block index), so the double-buffer
    # DMA chain is exactly the sb=1 chain, re-cut at a coarser grid.
    for s in range(sb):
        sl = slice(s * q_block, (s + 1) * q_block)
        y0 = meta_ref[0, s, _M_Y0]
        bbin = y0 // gy
        p = meta_ref[0, s, _M_PAR]

        @pl.when(meta_ref[0, s, _M_HASV] > 0)
        def _():
            @pl.when(meta_ref[0, s, _M_FIRST] > 0)
            def _():
                win_dma(p, bbin).start()

            win_dma(p, bbin).wait()

            @pl.when(meta_ref[0, s, _M_HN] > 0)
            def _():
                win_dma(1 - p, meta_ref[0, s, _M_BBN]).start()

            valid = (xyv_ref[0, 2, sl] > 0.5).astype(jnp.float32)
            off_col = off_ref[:, 0:1]
            px, wx = _x_prep(xyv_ref[0, 0:1, sl], w, cfg, off_col)
            ry, wy, ymask = _y_prep(xyv_ref[0, 1:2, sl], h, cfg, off_col,
                                    y0, gy)
            mask = valid * ymask
            terms = mxu.data_terms(scratch[pl.ds(p, 1)][0],
                                   mxu.passes_for(cfg))       # (C*N, K)
            rows_acc = [jnp.zeros((c, n, q_block), jnp.float32)
                        for _ in _ROWS_2D]
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)   # (K, Qb)
                    v = mxu.onehot_dot_terms(
                        terms, hit, (((1,), (0,)), ((), ())))  # (C*N, Qb)
                    v = v.reshape(c, n, q_block)
                    for r, (kx, ky) in enumerate(_ROWS_2D):
                        rows_acc[r] = rows_acc[r] + (
                            wy[ky][j] * wx[kx][i])[None] * v
            out = jnp.concatenate(
                [jnp.sum(acc, axis=1) for acc in rows_acc], axis=0)
            out_ref[:, sl] = out * mask

        @pl.when(meta_ref[0, s, _M_HASV] == 0)
        def _():
            out_ref[:, sl] = jnp.zeros((5 * c, q_block), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "sb",
                                              "interpret"))
def pallas_fused2w_blend_padded(cells, points, cfg: SamplerConfig,
                                q_block: int | None = None, sb: int = 1,
                                interpret: bool = False, plan=None):
    """Slot-resident variant: (out_p (5, C, QP), occ (QP,), positions (Q,)).

    Padding slots are zero and flagged by ``occ``; see
    fused3w.pallas_fused3w_blend_padded for the rationale.  ``sb``
    sub-blocks run per grid step (_pad_super); QP grows to the next
    multiple of sb*q_block, padding slots flagged as usual."""
    q_block = _resolve_qb(cfg, cells.shape, q_block)
    n, c, h, w = cells.shape
    q = points.shape[0]
    npad = _npad(n)   # sublane-aligned ensemble: (C*N, Qb) reshapes free
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, hp = _geom2(h, gy, fp)
    positions, occ, y0, hasv, pts_p, qp = _plan_or_bin2(
        points, h, cfg, q_block, gy, plan)
    occ, y0, hasv, pts_p, qp = _pad_super(occ, y0, hasv, pts_p, qp,
                                          q_block, sb)
    nblocks = qp // q_block
    nsuper = nblocks // sb

    xyv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(3, nsuper, sb * q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 3)
    wins = _windows2(_pad_grid(cells_p, h, w, hp, wp, fp, cfg), nby, gy,
                     rows)
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    bb = y0 // gy
    bbn = jnp.roll(bb, -1).at[-1].set(bb[-1])
    first = (bi == 0).astype(jnp.int32)
    hn = jnp.roll(hasv, -1).at[-1].set(0)   # next block is real -> prefetch
    parity = (bi % 2).astype(jnp.int32)
    meta = jnp.stack([y0, hasv, bbn, first, hn, parity],
                     axis=1).astype(jnp.int32).reshape(nsuper, sb, 6)

    kernel = functools.partial(
        _fused2w_blend_kernel, cfg=cfg, spatial=(h, w), gy=gy,
        q_block=q_block, sb=sb, channels=c, n_cells=npad, wp=wp)
    out = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, 3, sb * q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, 6), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((5 * c, sb * q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5 * c, qp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c * npad, rows * wp), wins.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyv, meta, offsets, wins)
    dtype = jnp.promote_types(cells.dtype, points.dtype)
    return out.reshape(5, c, qp).astype(dtype), occ, positions


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "sb",
                                              "interpret"))
def pallas_fused2w_blend(cells, points, cfg: SamplerConfig,
                         q_block: int | None = None, sb: int = 1,
                         interpret: bool = False):
    """(5, C, Q) fused multicell value/jac/diag-Hessian (v5, windowed 2D)."""
    c = cells.shape[1]
    q = points.shape[0]
    out_p, _, positions = pallas_fused2w_blend_padded(
        cells, points, cfg, q_block=q_block, sb=sb, interpret=interpret)
    qp = out_p.shape[-1]
    return out_p.reshape(5 * c, qp)[:, positions].reshape(5, c, q)


def _fused2w_bwd_kernel(xyv_ref, meta_ref, off_ref, g_ref, wins0_ref,
                        out_ref, scratch,
                        sem_in, sem_out, *, cfg, spatial, gy, q_block, sb,
                        channels, n_cells, wp):
    del wins0_ref  # aliased to out_ref; zero-initialized by XLA
    h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)

    # sb sub-groups per grid step (see _fused2w_blend_kernel).  The SP/SN
    # same-bin RMW-elision flags are per SUB-group over the global block
    # sequence, so the read/accumulate/writeback chain is the sb=1 chain
    # verbatim — a writeback of sub-group s is always waited before
    # sub-group s+1's read of a different bin starts.
    for s in range(sb):
        sl = slice(s * q_block, (s + 1) * q_block)
        y0 = meta_ref[0, s, _MB_Y0]
        bbin = y0 // gy

        @pl.when(meta_ref[0, s, _MB_HASV] > 0)
        def _():
            cp = pltpu.make_async_copy(out_ref.at[pl.ds(bbin, 1)], scratch,
                                       sem_in)

            @pl.when(meta_ref[0, s, _MB_SP] == 0)
            def _():
                cp.start()
            valid = (xyv_ref[0, 2, sl] > 0.5).astype(jnp.float32)
            off_col = off_ref[:, 0:1]
            px, wx = _x_prep(xyv_ref[0, 0:1, sl], w, cfg, off_col)
            ry, wy, ymask = _y_prep(xyv_ref[0, 1:2, sl], h, cfg, off_col,
                                    y0, gy)
            mask = valid * ymask

            g = g_ref[:, sl].reshape(5, c, q_block)
            gv = [g[r] * mask for r in range(5)]

            contrib = jnp.zeros((c * n, k_win), jnp.float32)
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)
                    pmat = jnp.zeros((c, n, q_block), jnp.float32)
                    for r, (kx, ky) in enumerate(_ROWS_2D):
                        pmat = pmat + (wy[ky][j] * wx[kx][i])[None] * \
                            gv[r][:, None, :]
                    contrib = contrib + mxu.onehot_dot(
                        pmat.reshape(c * n, q_block), hit,
                        (((1,), (1,)), ((), ())),
                passes=mxu.passes_for(cfg))            # (C*N, K)

            @pl.when(meta_ref[0, s, _MB_SP] == 0)
            def _():
                cp.wait()
            scratch[...] = scratch[...] + contrib[None]

            @pl.when(meta_ref[0, s, _MB_SN] == 0)
            def _():
                cp2 = pltpu.make_async_copy(scratch,
                                            out_ref.at[pl.ds(bbin, 1)],
                                            sem_out)
                cp2.start()
                cp2.wait()


def _bwd_from_slots2(gq, points, in_spatial, cfg: SamplerConfig,
                     n_cells: int, q_block: int, sb: int, interpret: bool,
                     out_dtype, plan=None):
    """Cells-cotangent given the cotangent already in slot space.

    ``gq``: (5*C, QP) f32, slot-ordered per the _ybin layout of ``points``
    (padding slots are masked in-kernel via occ); QP may be the plan's
    un-sb-padded size — the sub-block tail (hasv == 0) is zero-padded
    here."""
    h, w = in_spatial
    n = n_cells
    npad = _npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, hp = _geom2(h, gy, fp)
    positions, occ, y0, hasv, pts_p, qp = _plan_or_bin2(
        points, h, cfg, q_block, gy, plan)
    occ, y0, hasv, pts_p, qp = _pad_super(occ, y0, hasv, pts_p, qp,
                                          q_block, sb)
    k_rows = 5
    c = gq.shape[0] // k_rows
    if gq.shape[1] < qp:
        gq = jnp.pad(gq, ((0, 0), (0, qp - gq.shape[1])))
    nblocks = qp // q_block
    nsuper = nblocks // sb

    xyv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(3, nsuper, sb * q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    wins0 = jnp.zeros((nby, c * npad, rows * wp), jnp.float32)
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    hasv_next = jnp.roll(hasv, -1).at[-1].set(0)
    same = (y0 == jnp.roll(y0, -1))
    sn = (same & (hasv_next > 0) & (bi < nblocks - 1)).astype(jnp.int32)
    sp = jnp.roll(sn, 1).at[0].set(0)
    meta = jnp.stack([y0, hasv, sp, sn],
                     axis=1).astype(jnp.int32).reshape(nsuper, sb, 4)

    kernel = functools.partial(
        _fused2w_bwd_kernel, cfg=cfg, spatial=(h, w), gy=gy,
        q_block=q_block, sb=sb, channels=c, n_cells=npad, wp=wp)
    wins = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, 3, sb * q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, 4), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows * c, sb * q_block), lambda qi: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nby, c * npad, rows * wp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c * npad, rows * wp), jnp.float32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyv, meta, offsets, gq, wins0)
    acc = _scatter_windows2(wins, nby, gy, rows, c * npad, hp, wp, fp)
    acc = acc.reshape(c, npad, hp, wp)[:, :n, fp:fp + h, :w]
    return acc.transpose(1, 0, 2, 3).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "sb", "interpret"))
def pallas_fused2w_bwd(g, points, in_spatial: Tuple[int, ...],
                       cfg: SamplerConfig, n_cells: int,
                       q_block: int | None = None, sb: int = 1,
                       interpret: bool = False):
    """Cells-cotangent of pallas_fused2w_blend: (N, C, H, W)."""
    h, w = in_spatial
    k_rows, c, q = g.shape
    q_block = _resolve_qb(cfg, (n_cells, c, h, w), q_block)
    gy = _win_geom(w, cfg)[2]
    positions, occ, y0, hasv, qp = _ybin(points, h, cfg, q_block, gy)
    gq = scatter_to_slots(
        g.reshape(k_rows * c, q).astype(jnp.float32).T, positions, qp).T
    return _bwd_from_slots2(gq, points, in_spatial, cfg, n_cells, q_block,
                            sb, interpret,
                            jnp.promote_types(g.dtype, points.dtype))


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "sb", "interpret"))
def pallas_fused2w_bwd_padded(g_p, points, in_spatial: Tuple[int, ...],
                              cfg: SamplerConfig, n_cells: int,
                              q_block: int | None = None, sb: int = 1,
                              interpret: bool = False, plan=None):
    """Cells-cotangent taking the slot-space (5, C, QP) cotangent of
    pallas_fused2w_blend_padded directly — no scatter pass."""
    k_rows, c, qp = g_p.shape
    q_block = _resolve_qb(cfg, (n_cells, c, *in_spatial), q_block)
    gq = g_p.reshape(k_rows * c, qp).astype(jnp.float32)
    return _bwd_from_slots2(gq, points, in_spatial, cfg, n_cells, q_block,
                            sb, interpret,
                            jnp.promote_types(g_p.dtype, points.dtype),
                            plan=plan)
