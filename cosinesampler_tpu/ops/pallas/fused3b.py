"""v4 bricked 3D fused kernels for HBM-resident (large) volumes.

The v3 kernels (fused3s.py) keep the whole volume resident in VMEM, which
caps them near ~24^3 at the reference channel counts.  The 128^3 sweep
(BASELINE config 5) previously fell back to the XLA gather/scatter path:
the forward gather worked but was slow, and the scatter-add gradient
either overflowed HBM unchunked or tripped a TPU runtime fault chunked.
v4 removes the VMEM residency requirement:

1. Queries are sorted by a fused bin key ``(floor(base_z),
   floor(base_y) // GY)`` with one ``lax.sort_key_val`` (the dense
   one-hot counting sort of v3 does not scale to the ~8k bins this
   produces, and slot-level ``searchsorted`` is ~20x slower on TPU than
   the scatter+cumsum used here); each padded bin occupies whole query
   blocks, so every kernel block's queries share one 3-slab x
   (GY+2)-row "brick" of the volume.
2. The volume lives in HBM (``pl.ANY``), zero-padded by 2 texels on z
   and y so brick windows never clamp.  Bricks are fetched as SUPER-
   bricks — one (RB*GY + 2)-row DMA covering RB consecutive y bins of a
   z slab — because adjacent bins overlap their windows by the front-pad
   rows and, at the 128^3 sweep's ~8450 bins, the per-bin DMA chain
   dominated both passes (scripts/ablate_v4.py: 20.75 of 31 ms forward,
   21 of 42.6 ms backward).  Each block slices its bin's (GY+2)-row
   window from the resident super-brick at a dynamic row offset.
3. The 27-corner gather runs as a separable two-stage contraction:
   an MXU stage over x (3 one-hot matmuls at K=W against all
   3*(GY+2)*C*N brick rows) and a VPU stage over the (GY+2)-row window
   (one-hot row blend) — ~3x fewer MXU cycles than contracting 9
   whole-window (y,x) panels.
4. The gradient scatter is a sequential-grid read-modify-write of the
   same super-bricks (read once per super-bin, accumulate every block of
   its rb bins in VMEM, write back once on leaving it): TPU Pallas grid
   steps execute in order on the core, so accumulation is deterministic
   and race-free without atomics (the CUDA reference leans on
   fastAtomicAdd for this, cosine_sampler_3d_kernel.cu:506-523).

Out-of-bounds semantics match the reference CUDA bounds-check-to-zero
(cosine_sampler_3d_kernel.cu:343-369): the x axis via the one-hot hits,
y/z via bin-membership masks plus the cropped pad margins.  Scope is any
padding mode (zeros / border / reflection — the latter via the widened
4-shift patch, prep.n_shifts, with binning on the FOLDED coordinates) +
shared query points.  W is
lane-padded to a 128-multiple internally (Mosaic requires the brick DMA's
W slice to be 128-aligned); the zero pad columns are semantically inert.
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
from .fused3d import _ROW_FACTORS, _ROWS_3D, _XY_PAIRS
from .fused3s import _z_weights
from .prep import (FUSED_PADDING_MODES_WIDE, axis_transform, bin_base,
                   cell_weights, front_pad, n_shifts, npad as _npad)

V3B_Q_BLOCK = 128
V3B_GY = 2            # y rows per bin; brick window is GY + 2 rows
# y bins per SUPER-brick: consecutive bins in the sort order (same z-slab,
# adjacent y groups) overlap their bricks by the front-pad rows, so one
# taller DMA covering RB bins replaces RB overlapping per-bin bricks.
# Ablation at the 128^3 sweep (scripts/ablate_v4.py): the per-bin brick
# chain alone cost 20.75 ms of the 31 ms forward (the MXU stage is only
# ~6 ms), and the backward's serialized per-bin read-modify-write chain
# 21 ms of 42.6 — ~8450 bins each paying DMA issue+wait latency.  Super-
# bricks cut the chain ~RB x and the HBM traffic ~(gy+fp)*RB/(RB*gy+fp) x,
# while the per-block MXU/VPU work is untouched (each block still slices
# its own bin's wy_rows from the super-brick at a dynamic row offset).
V3B_RB = 8
# Sub-blocks (query blocks) per Pallas grid step.  The v4 grids run ~13k
# blocks at the 128^3 sweep and the ~1.3 us/block fixed grid-step cost is
# BOTH passes' floor (BENCHMARKS.md round-4 attribution; the bf16 forward
# sits exactly at the copy floor with all compute hidden).  Grouping sb
# consecutive blocks per grid step pays that cost once per sb while the
# bin padding stays q_block-granular (the fused2w._pad_super idiom —
# measured a WASH on the ~800-block v5 kernels, but v4's block count is
# 16x that).  Round-5 A/B at the 128^3 bf16 sweep (scripts/time_sb.py,
# one session): fwd 23.3 -> 21.6 ms, bwd 27.5 -> 26.7 ms at sb=8, full
# vol step 57.2 -> 55.9 ms — small (~2.3%) but consistent; the remaining
# per-block cost is therefore NOT grid-step overhead (sb would have
# removed it) but the per-block work/DMA latency itself.  The MODULE
# default stays 1 — an sb=8 default makes every interpret-mode (CPU CI)
# kernel ~8x slower to trace/run for a ~2% device win — and the shipped
# autotune entries carry sb=8 for the 128^3 signatures instead, so the
# flagship route gets the win without taxing the test matrix.
V3B_SB = 1
_HBM_BUDGET = 4 << 30  # bytes for the padded HBM-resident volume
# Below ~this many queries per bin the padding blocks dominate the brick
# kernels; small clouds on large volumes stay on the XLA path.  Kept LOW
# on purpose: a sparse cloud pads every occupied bin to a whole block
# (up to ~q_block/x padding overhead — a perf cost), but the alternative
# XLA chunked-scatter gradient has tripped a TPU runtime device fault at
# the 128^3 scale (BENCHMARKS.md), so mid-size clouds must stay on the
# deterministic brick path.  Availability beats throughput here.
_MIN_Q_PER_BIN = 2
# (Q, nbins) one-hot budget for the sort-free binning rank; above this the
# comparison-sort path takes over (large volumes: nbins ~8k at 128^3).
_ONEHOT_RANK_BYTES = 64 << 20


def _geom(d: int, h: int, gy: int, fp: int = 2, rb: int = 1):
    """(nby, nbz, nbins, padded H); ``fp`` is the front pad (prep.front_pad):
    the window spans gy + fp rows, so the padded height carries fp extra.
    ``rb`` > 1 rounds the padded height up to whole super-bricks of rb y
    bins each (the super-brick DMA slice must stay in bounds); the extra
    rows are zero pad, semantically inert, and do not change the binning
    (nby/nbins are rb-independent)."""
    nby = -(-(h + 2) // gy)
    nbz = d + 2
    return nby, nbz, nby * nbz, -(-nby // rb) * rb * gy + fp


def _wpad(w: int) -> int:
    """Width padded to the Mosaic lane tile (the brick DMA requires the W
    slice to be a 128-multiple).  Pad columns hold zeros: forward reads of
    them contribute nothing and backward scatters into them are cropped,
    so no masking is needed."""
    return max(-(-w // 128) * 128, 128)


# Double-buffered super-brick scratch budget.  Separate from the dispatch
# vmem_budget heuristic: the pallas_calls run with vmem_limit_bytes=100MB,
# and the scratch competes mainly with the stage-1 panel, so a generous
# cap here lets _rb_fit keep the full V3B_RB at the sweep shapes while
# degrading rb (not dropping the route) for wide-W volumes.
_SB_SCRATCH_BUDGET = 24 << 20


def _rb_fit(cfg: SamplerConfig, n: int, c: int, w: int, gy: int) -> int:
    """Largest rb in {V3B_RB, .., 1} whose double-buffered super-brick
    scratch fits the budget (halving so the row count stays DMA-friendly).
    """
    nsh = n_shifts(cfg)
    fp = front_pad(cfg)
    row_bytes = nsh * c * _npad(n) * _wpad(w) * 4
    rb = V3B_RB
    while rb > 1 and 2 * (rb * gy + fp) * row_bytes > _SB_SCRATCH_BUDGET:
        rb //= 2
    return rb


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             n_queries: int | None = None, q_block: int | None = None,
             gy: int | None = None, rb: int | None = None,
             sb: int | None = None) -> bool:
    q_block = q_block or V3B_Q_BLOCK
    gy = gy or V3B_GY
    sb = sb or V3B_SB
    if cfg.dim != 3 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    n, c, d, h, w = cells_shape
    n = _npad(n)
    w = _wpad(w)
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    wy = gy + fp
    if nsh * n * c * wy * w * 4 > vmem_budget:      # brick scratch
        return False
    if nsh * n * c * wy * q_block * 4 > vmem_budget:  # stage-1 panel
        return False
    # in-kernel x one-hot panels (nsh f32 (wpad, Qb)) + the bf16 split
    # copies of the brick rows: a degenerate very-wide-W volume can pass
    # the gates above yet blow VMEM at runtime (see ops/pallas/mxu.py).
    if nsh * w * q_block * 4 > vmem_budget:
        return False
    # per-grid-step IO blocks scale with sb: (4, sb*Qb) coords + the
    # (7C, sb*Qb) out / cotangent block
    if (4 + 7 * c) * sb * q_block * 4 > vmem_budget:
        return False
    if mxu.passes_for(cfg) * nsh * n * c * wy * w * 2 > vmem_budget:
        return False
    rb = rb or _rb_fit(cfg, cells_shape[0], c, cells_shape[4], gy)
    nby, _, nbins, hp = _geom(d, h, gy, fp, rb)
    if (d + fp + 2) * n * c * hp * w * 4 > _HBM_BUDGET:  # padded volume
        return False
    if n_queries is not None and n_queries < _MIN_Q_PER_BIN * nbins:
        return False
    return True


def _occ_mask(offs, counts, qp):
    """(qp,) 0/1 real-slot occupancy from the per-bin layout, without a
    per-query scatter: +1 at each bin's slot start, -1 one past its last
    real slot, running sum.  Replaces a Q-element random scatter (~5 ms
    at 1M queries) with two nbins-element scatters and one cumsum."""
    d = jnp.zeros((qp + 1,), jnp.int32)
    d = d.at[offs].add(1, mode="drop")
    d = d.at[offs + counts].add(-1, mode="drop")
    return jnp.cumsum(d)[:qp].astype(jnp.float32)


def _step_starts(offs, length, granularity=1):
    """bin index per position via scatter+cumsum (offs must be sorted).

    Equivalent to ``searchsorted(cum, pos, 'right')`` but ~20x faster on
    TPU: mark each bin's start position, running-sum the marks.
    Zero-width bins stack their marks on one slot; the cumsum then skips
    them, so each position lands on the LAST bin starting at or before it
    — exactly the owner, since earlier zero-width bins own no positions.
    """
    mark = jnp.zeros((length,), jnp.int32).at[offs // granularity].add(
        1, mode="drop")
    return jnp.cumsum(mark) - 1


def _brick_bin(points, d: int, h: int, cfg: SamplerConfig, q_block: int,
               gy: int):
    """Sort queries by (floor(base_z), floor(base_y) // gy) with per-bin
    block padding.

    Returns (positions, occ, z0, y0, hasv, qp): ``positions[q]`` is query
    q's slot in the padded layout, ``occ`` the (qp,) f32 slot-occupancy
    mask, ``z0``/``y0`` the per-block brick origin in the PADDED volume
    (z0 = fz + 2, y0 = group * gy), ``hasv`` whether the block has any
    real query, ``qp`` the static padded slot count.  Per-query payloads
    reach the kernel by SCATTERING into slots via ``positions``
    (scatter_to_slots); a slot->query inverse map is never materialized
    (each 1M-element random gather/scatter costs ~5-6 ms on TPU).
    """
    q = points.shape[0]
    nby, nbz, nbins, _ = _geom(d, h, gy)
    bz_f = bin_base(points[:, 2].astype(jnp.float32), d, cfg)
    by_f = bin_base(points[:, 1].astype(jnp.float32), h, cfg)
    fz = jnp.floor(jax.lax.stop_gradient(bz_f)).astype(jnp.int32)
    fy = jnp.floor(jax.lax.stop_gradient(by_f)).astype(jnp.int32)
    bz = jnp.clip(fz + 2, 0, nbz - 1)
    by = jnp.clip((fy + 2) // gy, 0, nby - 1)
    key = (bz * nby + by).astype(jnp.int32)
    qp = (pl.cdiv(q, q_block) + nbins) * q_block        # static upper bound
    iota = jnp.arange(q, dtype=jnp.int32)

    if q * nbins * 4 <= _ONEHOT_RANK_BYTES:
        # Small bin count: sort-free ranks via a (Q, nbins) one-hot cumsum
        # (the comparison sort alone measures ~6 ms at 100k queries on TPU;
        # this path is sub-ms).  Within-bin order is original query order.
        onehot = (key[:, None] == jnp.arange(nbins, dtype=jnp.int32)[None, :]
                  ).astype(jnp.int32)
        counts = onehot.sum(axis=0, dtype=jnp.int32)
        srank = ((jnp.cumsum(onehot, axis=0) - 1) * onehot).sum(axis=1)
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum_padded = jnp.cumsum(padded).astype(jnp.int32)
        offs = cum_padded - padded
        positions = offs[key] + srank
    else:
        skey, perm = jax.lax.sort_key_val(key, iota)
        edges = jnp.searchsorted(
            skey, jnp.arange(nbins + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = edges[1:] - edges[:-1]
        padded = ((counts + q_block - 1) // q_block) * q_block
        cum_padded = jnp.cumsum(padded).astype(jnp.int32)   # inclusive
        offs = cum_padded - padded                          # exclusive starts

        # Random-access 1M-element gathers/scatters measure ~5-6 ms EACH
        # on TPU, so the slot maps are built with ONE Q-element scatter
        # (positions): the per-rank slot delta is a step function that
        # changes only at bin-start ranks, so it comes from an
        # nbins-element boundary scatter + cumsum instead of delta[skey]
        # (a Q-element gather).
        delta = offs - edges[:-1]                   # bin slot - bin start
        ddelta = jnp.concatenate([delta[:1], delta[1:] - delta[:-1]])
        dstep = jnp.zeros((q,), jnp.int32).at[edges[:-1]].add(
            ddelta, mode="drop")
        spos = jnp.cumsum(dstep) + iota             # slot of sorted rank i
        positions = jnp.zeros((q,), jnp.int32).at[perm].set(spos)

    nblocks = qp // q_block
    bbin = jnp.minimum(_step_starts(offs, nblocks, granularity=q_block),
                       nbins - 1)
    z0 = bbin // nby
    y0 = (bbin % nby) * gy
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    occ = _occ_mask(offs, counts, qp)
    hasv = (occ[bi * q_block] > 0).astype(jnp.int32)
    return positions, occ, z0, y0, hasv, qp


def scatter_to_slots(arr, positions, qp):
    """Scatter per-query rows (Q, ...) into their padded slots (qp, ...).

    positions are unique; padding slots stay zero (callers mask by occ).
    """
    out = jnp.zeros((qp,) + arr.shape[1:], arr.dtype)
    return out.at[positions].set(arr, unique_indices=True)


def make_plan(points, in_spatial, cfg: SamplerConfig,
              q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
              rb: int | None = None, sb: int = 1):
    """Precompute the bin plan for a FIXED point set.

    At the 1M-point 128^3 sweep the binning (the lax.sort over 1M keys
    plus the slot scatters) costs ~12 ms standalone (post
    bin-boundary-scatter optimization, BENCHMARKS.md); the reference's own
    PINN workloads sample their collocation points ONCE (test_2d.py:23-26,
    test_3d.py:16-19), so a training loop over fixed points can hoist the
    plan out of the step.  What a given trainer shape actually saves is
    measured in ops/fused.py:make_fused_planned's docstring (XLA hoists
    the point-invariant binning out of a jitted lax.scan on its own).
    Returns ``(positions, occ, z0, y0, hasv, pts_p)`` — pass it back via
    the ``plan=`` kwarg of the padded kernels (or the public
    ``make_sample_plan`` / ``sample_features_padded`` API).  The plan is
    only valid for the exact (points, volume shape, cfg, q_block) it was
    built from.  ``rb`` (super-brick width) and ``sb`` (sub-blocks per
    grid step; padding is applied in the kernels) never affect the plan —
    they are accepted so autotune can pass one kwarg dict to plan and
    kernels.
    """
    del rb, sb
    d, h, _ = in_spatial
    positions, occ, z0, y0, hasv, qp = _brick_bin(points, d, h, cfg,
                                                  q_block, gy)
    pts_p = scatter_to_slots(points.astype(jnp.float32), positions, qp)
    return (positions, occ, z0, y0, hasv, pts_p)


def plan_or_bin(points, d, h, cfg, q_block, gy, plan):
    """(positions, occ, z0, y0, hasv, pts_p, qp): from ``plan`` when given
    (its shapes carry qp), else recomputed from ``points``."""
    if plan is None:
        positions, occ, z0, y0, hasv, qp = _brick_bin(points, d, h, cfg,
                                                      q_block, gy)
        pts_p = scatter_to_slots(points.astype(jnp.float32), positions, qp)
    else:
        positions, occ, z0, y0, hasv, pts_p = plan
        qp = occ.shape[0]
    return positions, occ, z0, y0, hasv, pts_p, qp


def _axis_prep_window(coord, size, cfg, off_col, q_block, start, gy):
    """Window-local y one-hots + per-cell weights + bin-membership mask.

    ``start`` is the block's brick origin in the padded volume; the padded
    row of corner j for a query with fy = floor(base) is fy + 2 + j for
    every padding mode (texel row fy + shift_lo + j, front pad 2 -
    shift_lo — the two cancel), so the window-local hit row is
    fy + 2 - start + j.  Queries whose fy is outside the block's y group
    (clipped far-OOB bins) are masked.
    """
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    fb = jnp.floor(base)
    loc = fb + 2.0 - start.astype(jnp.float32)          # (1, Qb)
    ymask = ((loc >= 0.0) & (loc <= float(gy - 1))).astype(jnp.float32)
    loci = jnp.clip(loc, 0.0, float(gy - 1)).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (gy + front_pad(cfg), q_block), 0)
    hits = [(iota == loci + j).astype(jnp.float32)
            for j in range(n_shifts(cfg))]
    return hits, cell_weights(base, ixn, scale, cfg), ymask


def _pad_volume(cells, d, h, w, hp, wp, fp: int = 2, cfg=None):
    """(N,C,D,H,W) -> zero-padded (D+fp+2, C*N, Hp, Wp) HBM layout.

    Texel (z, y) sits at padded (z + fp, y + fp); windows anchored at the
    shared floor reach shift_lo = 2 - fp texels back, so the front pad
    absorbs the widened reflection patch.  bf16 cells keep their dtype
    (mxu.data_cast): half the DMA bytes, single-pass MXU."""
    n, c = cells.shape[:2]
    cells_f = mxu.data_cast(cells, cfg).transpose(2, 1, 0, 3, 4).reshape(
        d, c * n, h, w)
    return jnp.pad(cells_f,
                   ((fp, 2), (0, 0), (fp, hp - h - fp), (0, wp - w)))


def _pad_volume_yzc(cells, d, h, w, hp, wp, fp: int = 2, cfg=None):
    """(N,C,D,H,W) -> zero-padded (Hp, D+fp+2, C*N, Wp) HBM layout.

    y outermost so a brick window slice (wy_rows, nsh, C*N, Wp) lands in
    VMEM with the window ROW as the leading scratch dim: the stage-2 row
    blend then slices the stage-1 panel at (nsh*C*N)-row granularity —
    tile-aligned — instead of reshaping to a 5D array whose (wy_rows, Wp)
    minor dims pad 4 sublanes to 8 (a full relayout per panel).  bf16
    cells keep their dtype (mxu.data_cast)."""
    n, c = cells.shape[:2]
    cells_f = mxu.data_cast(cells, cfg).transpose(3, 2, 1, 0, 4).reshape(
        h, d, c * n, w)
    return jnp.pad(cells_f,
                   ((fp, hp - h - fp), (fp, 2), (0, 0), (0, wp - w)))


def vol_layout(n: int, c: int, in_spatial, cfg: SamplerConfig,
               gy: int = V3B_GY, rb: int | None = None):
    """(rb, hp, wp, npad) geometry of the kernel-layout volume.

    The kernel layout is the zero-padded (Hp, D+fp+2, C*Npad, Wp) array
    the v4 kernels DMA from (see _pad_volume_yzc).  It is exposed so
    training loops can keep the cells IN this layout across steps: the
    query-ordered API re-transposes + pads the full volume on every
    forward and crops/transposes the gradient back on every backward —
    at the 128^3 sweep two ~0.6 GB relayouts per train step that can
    never be hoisted because the cells change every step (the v4 kernel
    itself is ~28.5 ms while the billed pass was 90 ms, VERDICT r2)."""
    d, h, w = in_spatial
    rb = rb or _rb_fit(cfg, n, c, w, gy)
    hp = _geom(d, h, gy, front_pad(cfg), rb)[3]
    return rb, hp, _wpad(w), _npad(n)


def cells_to_vol(cells, cfg: SamplerConfig, gy: int = V3B_GY,
                 rb: int | None = None):
    """(N, C, D, H, W) -> the kernel-layout volume (one-time, at the API
    boundary; see vol_layout)."""
    n, c, d, h, w = cells.shape
    rb, hp, wp, npad = vol_layout(n, c, (d, h, w), cfg, gy, rb)
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 4)
    return _pad_volume_yzc(cells_p, d, h, w, hp, wp, front_pad(cfg))


def vol_to_cells(vol, n: int, c: int, in_spatial, cfg: SamplerConfig):
    """Kernel-layout volume -> (N, C, D, H, W) (inverse of cells_to_vol)."""
    d, h, w = in_spatial
    fp = front_pad(cfg)
    hp, dfp, cn, wp = vol.shape
    npad = cn // c
    acc = vol.reshape(hp, dfp, c, npad, wp)[fp:fp + h, fp:fp + d, :, :n, :w]
    return acc.transpose(3, 2, 1, 0, 4)


def vol_pad_mask_mul(vol_bar, n: int, c: int, in_spatial,
                     cfg: SamplerConfig):
    """Zero the padding slots of a kernel-layout cotangent.

    The bwd kernel scatters out-of-bounds corner contributions into the
    pad rows/columns unconditionally and relies on the API-boundary crop
    to discard them (the CUDA reference instead bounds-checks each atomic,
    cosine_sampler_3d_kernel.cu:506-523).  A vol-resident training loop
    has no crop, so the vjp masks instead: pad slots must stay EXACTLY
    zero across steps or later forwards would read them as real texels.
    One fused elementwise pass (~1.3 GB of traffic at the 128^3 sweep vs
    the ~two 0.6 GB relayouts it replaces)."""
    d, h, w = in_spatial
    fp = front_pad(cfg)
    hp, dfp, cn, wp = vol_bar.shape
    npad = cn // c
    dt = vol_bar.dtype
    ay = jnp.arange(hp)
    az = jnp.arange(dfp)
    an = jnp.arange(cn)
    ax = jnp.arange(wp)
    m = (((ay >= fp) & (ay < fp + h)).astype(dt)[:, None, None, None]
         * ((az >= fp) & (az < fp + d)).astype(dt)[None, :, None, None]
         * ((an % npad) < n).astype(dt)[None, None, :, None]
         * (ax < w).astype(dt)[None, None, None, :])
    return vol_bar * m


def _axis_prep_wp(coord, size, wp, cfg, off_col, q_block):
    """fused3d._axis_prep with the one-hot hit rows spanning the
    lane-padded width ``wp`` >= size (pad rows never match in-bounds
    corner indices, so they read zeros / receive cropped scatters)."""
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    lo = 2 - front_pad(cfg)
    fb = jnp.floor(base)
    fbi = jnp.clip(fb, -4.0, float(size) + 3.0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (wp, q_block), 0)
    hits = [(iota == fbi + (lo + j)).astype(jnp.float32)
            for j in range(n_shifts(cfg))]
    return hits, cell_weights(base, ixn, scale, cfg)


# SMEM metadata vector layout of the blend kernel: per-block scalars are
# shipped as ONE (1, 1, 10) int32 row instead of ten (1, 1, 1) inputs —
# each BlockSpec input is a separate per-grid-step copy with its own issue
# overhead, and at the 128^3 sweep's ~16k blocks the per-block fixed cost
# is the forward's floor (scripts/ablate_v4.py: 20.9 ms "copy" stage with
# the MXU stage only ~6 ms).  Same motive for packing x/y/z/valid into one
# (1, 4, q_block) VMEM block.
_B_Z0, _B_Y0, _B_YS, _B_HASV, _B_NZ0, _B_NYS, _B_FIRST, _B_SBF, \
    _B_NHAS, _B_PAR = range(10)


def _fused3b_blend_kernel(xyzv_ref, meta_ref, off_ref, vol_ref,
                          out_ref, scratch, sem,
                          *, cfg, spatial, gy, rb, q_block, sb, channels,
                          n_cells, wpad):
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    wy_rows = gy + front_pad(cfg)
    rows_s = rb * gy + front_pad(cfg)

    # Double-buffered SUPER-brick prefetch across grid steps: one DMA per
    # rb consecutive y bins (rb*gy + fp rows — consecutive bins in the
    # sort order overlap their bricks by the fp front-pad rows, so the
    # tall copy dedupes that traffic too).  The first block of a super-bin
    # (sbf) waits for the copy started a whole super-bin earlier, then
    # immediately starts the NEXT super-bin's copy into the other slot —
    # safe, because that slot's last reader was the super-bin that just
    # ended — so every copy has a full super-bin of compute to hide
    # behind; every other block just slices the resident scratch.
    # Scratch / semaphores persist across the sequential TPU grid, and
    # the chain runs only over the real-block PREFIX (_brick_bin packs
    # every real block before every padding block).
    #
    # ``sb`` consecutive query blocks run per grid step (round-5): the
    # per-grid-step fixed cost (~1.3 us/block measured at the 128^3
    # sweep's ~13k blocks — the forward's floor, BENCHMARKS.md) is paid
    # once per sb blocks.  The meta/parity/prefetch flags are per
    # SUB-block over the GLOBAL block sequence, so the double-buffer DMA
    # chain is exactly the sb=1 chain re-cut at a coarser grid (the
    # fused2w._pad_super idiom).
    cn3 = nsh * c * n

    def sbrick_dma(slot, zz, yy):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(yy, rows_s), pl.ds(zz, nsh)],
            scratch.at[pl.ds(rows_s * slot, rows_s)], sem.at[slot])

    for s in range(sb):
        z0 = meta_ref[s, 0, _B_Z0]
        y0 = meta_ref[s, 0, _B_Y0]
        ys = meta_ref[s, 0, _B_YS]
        p = meta_ref[s, 0, _B_PAR]

        @pl.when(meta_ref[s, 0, _B_HASV] > 0)
        def _():
            @pl.when(meta_ref[s, 0, _B_FIRST] > 0)
            def _():
                sbrick_dma(p, z0, ys).start()

            @pl.when(meta_ref[s, 0, _B_SBF] > 0)
            def _():
                sbrick_dma(p, z0, ys).wait()

            @pl.when((meta_ref[s, 0, _B_SBF] > 0)
                     & (meta_ref[s, 0, _B_NHAS] > 0))
            def _():
                sbrick_dma(1 - p, meta_ref[s, 0, _B_NZ0],
                           meta_ref[s, 0, _B_NYS]).start()

            valid = (xyzv_ref[s, 3] > 0.5).astype(jnp.float32)
            off_col = off_ref[:, 0:1]
            hx, wx = _axis_prep_wp(xyzv_ref[s, 0:1], w, wpad, cfg, off_col,
                                   q_block)
            hyl, wyw, ymask = _axis_prep_window(xyzv_ref[s, 1:2], h, cfg,
                                                off_col, q_block, y0, gy)
            wz, zmask = _z_weights(xyzv_ref[s, 2:3], d, cfg, off_col,
                                   z0 - 2)
            mask = valid * ymask * zmask
            # stage 1 (MXU): contract x against every row of this block's
            # bin window — wy_rows rows sliced from the super-brick at the
            # bin's dynamic row offset.  M order is (window row, slab, c,
            # n) — the brick DMA's row-major landing — so stage 2 slices
            # rows at cn3 granularity, tile-aligned.
            rows = scratch[pl.ds(rows_s * p + (y0 - ys), wy_rows)].reshape(
                wy_rows * cn3, wpad)
            terms = mxu.data_terms(rows, mxu.passes_for(cfg))
            b1 = [
                mxu.onehot_dot_terms(terms, hx[i],
                                     (((1,), (0,)), ((), ())))
                for i in range(nsh)
            ]                                             # (wy_rows*cn3, Qb)
            rows_acc = [jnp.zeros((c, n, q_block), jnp.float32)
                        for _ in _ROWS_3D]
            for j in range(nsh):
                for i in range(nsh):
                    # stage 2 (VPU): one-hot row blend over the y window,
                    # (1, Qb) row factors broadcast over aligned 2D slices
                    # hyl[j] hits row = loci + j with loci in [0, gy-1]:
                    # only rows j..j+gy-1 can be non-zero one-hots, so the
                    # blend skips the identically-zero window rows.
                    v = jnp.zeros((cn3, q_block), jnp.float32)
                    for row in range(j, j + gy):
                        v = v + (b1[i][row * cn3:(row + 1) * cn3]
                                 * hyl[j][row][None, :])
                    v = v.reshape(nsh, c, n, q_block)     # layout-free
                    # factored blend (see fused3d._ROW_FACTORS): z-reduce
                    # the nsh slabs once per z-order, share the 5 (kx, ky)
                    # pair products — ~3x fewer VPU-wide ops than per-row
                    # FMAs
                    zv = [sum(v[k] * wz[kz][k][None] for k in range(nsh))
                          for kz in range(3)]
                    pair = [(wyw[ky][j] * wx[kx][i])[None]
                            for (kx, ky) in _XY_PAIRS]      # (1, N, Qb)
                    for r, (pi, kz) in enumerate(_ROW_FACTORS):
                        rows_acc[r] = rows_acc[r] + pair[pi] * zv[kz]
            out = jnp.concatenate(
                [jnp.sum(acc, axis=1) for acc in rows_acc], axis=0)
            out_ref[s] = out * mask

        @pl.when(meta_ref[s, 0, _B_HASV] == 0)
        def _():
            out_ref[s] = jnp.zeros((7 * c, q_block), jnp.float32)


def _blend3b_call(vol, pts_p, occ, z0, y0, hasv, qp, cfg: SamplerConfig,
                  spatial, q_block: int, gy: int, rb: int, c: int,
                  npad: int, n_real: int, interpret: bool, sb: int = 1):
    """Shared pallas_call tail of the padded/vol blend entries: per-block
    metadata + kernel launch over an already-kernel-layout volume.
    Returns the (7, C, QP) f32 slot-ordered output."""
    d, h, w = spatial
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    nby = _geom(d, h, gy, fp, rb)[0]
    wp = vol.shape[-1]
    nblocks = qp // q_block

    xyzv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(4, nblocks, q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n_real, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n_real), (0, 0)))
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    # Super-bin metadata: sbk identifies the block's super-brick (rb
    # consecutive y bins of one z slab — consecutive in the sort order),
    # ys its row origin.  sbf: first block of its super-bin — it waits on
    # its own super-brick's DMA and immediately starts the NEXT super-
    # bin's into the other slot, so that copy is in flight for the whole
    # current super-bin (prefetching at the LAST block instead left only
    # one block of compute to hide it behind, a measurable stall at ~1k
    # super-bins).  The next super-bin's origin is a per-segment value:
    # the (z0n, ysn, hn) at the segment's LAST block, broadcast back to
    # every block of the segment via a drop-scatter over segment ordinals
    # + gather.  parity alternates the scratch slot per super-bin.
    ybin = y0 // gy
    sbk = z0 * nby + (ybin // rb) * rb
    ys = (ybin // rb) * (rb * gy)
    z0n = jnp.roll(z0, -1).at[-1].set(z0[-1])
    ysn = jnp.roll(ys, -1).at[-1].set(ys[-1])
    first = (bi == 0).astype(jnp.int32)
    sbf = ((bi == 0) | (sbk != jnp.roll(sbk, 1))).astype(jnp.int32)
    hn = jnp.roll(hasv, -1).at[-1].set(0)   # next block is real
    seg = jnp.cumsum(sbf) - 1               # super-bin ordinal per block
    is_last = (sbk != jnp.roll(sbk, -1)).at[-1].set(True)
    idx = jnp.where(is_last, seg, nblocks)
    nz0 = jnp.zeros((nblocks,), z0.dtype).at[idx].set(
        z0n, mode="drop")[seg]
    nys = jnp.zeros((nblocks,), ys.dtype).at[idx].set(
        ysn, mode="drop")[seg]
    nhas = jnp.zeros((nblocks,), hn.dtype).at[idx].set(
        hn, mode="drop")[seg]
    parity = (seg % 2).astype(jnp.int32)

    meta = jnp.stack(
        [z0, y0, ys, hasv, nz0, nys, first, sbf, nhas, parity],
        axis=1).astype(jnp.int32).reshape(nblocks, 1, 10)
    # sub-blocking (sb blocks per grid step): pad the block count to a
    # multiple of sb with inert tail blocks (hasv = 0, edge meta so the
    # in-bounds invariants hold); the slot layout/plan is sb-independent
    nsuper = -(-nblocks // sb)
    extra = nsuper * sb - nblocks
    if extra:
        xyzv = jnp.pad(xyzv, ((0, extra), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, extra), (0, 0), (0, 0)), mode="edge")
        meta = meta.at[nblocks:, :, _B_HASV].set(0)
    kernel = functools.partial(
        _fused3b_blend_kernel, cfg=cfg, spatial=(d, h, w), gy=gy, rb=rb,
        q_block=q_block, sb=sb, channels=c, n_cells=npad, wpad=wp)
    out = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((sb, 4, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, 1, 10), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # block-contiguous output: (nblocks, 7C, Qb) makes every block's
        # writeback ONE linear 14 KB DMA instead of 7C strided 512 B rows
        # of a (7C, QP) array — at ~13k grid blocks the strided descriptor
        # latency was a per-block floor.  The query-major layout is
        # restored host-side (one cheap XLA transpose).
        out_specs=pl.BlockSpec((sb, 7 * c, q_block), lambda qi: (qi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsuper * sb, 7 * c, q_block),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * (rb * gy + fp), nsh, c * npad, wp),
                       vol.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyzv, meta, offsets, vol)
    return out[:nblocks].transpose(1, 0, 2).reshape(7, c, qp)


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "gy", "rb",
                                             "sb", "interpret"))
def pallas_fused3b_blend_padded(cells, points, cfg: SamplerConfig,
                                q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                                rb: int | None = None, sb: int = V3B_SB,
                                interpret: bool = False, plan=None):
    """Slot-resident variant: (out_p (7, C, QP), occ (QP,), positions (Q,)).

    At the 1M-point sweep the query-ordered API's output gather and
    cotangent scatter cost ~5-6 ms each (see _brick_bin); slot-resident
    consumers (models/pinn.py slot_resident=True) skip both.  ``plan``
    (from make_plan, for fixed point sets) hoists the binning itself —
    ~12 ms standalone at that scale (see make_plan for what each trainer
    shape actually saves).  NOTE: this entry re-lays-out the whole volume
    per call (_pad_volume_yzc); training loops should keep the cells in
    the kernel layout instead (pallas_fused3b_blend_vol)."""
    n, c, d, h, w = cells.shape
    rb, hp, wp, npad = vol_layout(n, c, (d, h, w), cfg, gy, rb)
    positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
        points, d, h, cfg, q_block, gy, plan)
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 4)
    vol = _pad_volume_yzc(cells_p, d, h, w, hp, wp, front_pad(cfg), cfg)
    out = _blend3b_call(vol, pts_p, occ, z0, y0, hasv, qp, cfg, (d, h, w),
                        q_block, gy, rb, c, npad, n, interpret, sb=sb)
    dtype = jnp.promote_types(cells.dtype, points.dtype)
    return out.astype(dtype), occ, positions


@functools.partial(jax.jit, static_argnames=("cfg", "n_cells", "channels",
                                             "in_spatial", "q_block", "gy",
                                             "rb", "sb", "interpret"))
def pallas_fused3b_blend_vol(vol, points, cfg: SamplerConfig, n_cells: int,
                             channels: int, in_spatial: Tuple[int, ...],
                             q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                             rb: int | None = None, sb: int = V3B_SB,
                             interpret: bool = False, plan=None):
    """Slot-resident blend over a KERNEL-LAYOUT volume (see vol_layout).

    Same contract as pallas_fused3b_blend_padded, but ``vol`` is the
    (Hp, D+fp+2, C*Npad, Wp) array from cells_to_vol — no per-call volume
    relayout.  Pad slots of ``vol`` must be exactly zero (cells_to_vol
    guarantees it; the matching bwd keeps it true via vol_pad_mask_mul)."""
    d, h, w = in_spatial
    rb, hp, wp, npad = vol_layout(n_cells, channels, in_spatial, cfg, gy, rb)
    expect = (hp, d + front_pad(cfg) + 2, channels * npad, wp)
    if tuple(vol.shape) != expect:
        raise ValueError(
            f"vol has shape {tuple(vol.shape)}; the kernel layout for "
            f"N={n_cells}, C={channels}, spatial={tuple(in_spatial)} is "
            f"{expect} (build it with cells_to_vol)")
    positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
        points, d, h, cfg, q_block, gy, plan)
    out = _blend3b_call(mxu.data_cast(vol, cfg), pts_p, occ, z0, y0, hasv,
                        qp, cfg, (d, h, w), q_block, gy, rb, channels, npad,
                        n_cells, interpret, sb=sb)
    dtype = jnp.promote_types(vol.dtype, points.dtype)
    return out.astype(dtype), occ, positions


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "gy", "rb",
                                             "sb", "interpret"))
def pallas_fused3b_blend(cells, points, cfg: SamplerConfig,
                         q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                         rb: int | None = None, sb: int = V3B_SB,
                         interpret: bool = False):
    """(7, C, Q) fused multicell value/jac/diag-Hessian (v4, bricked)."""
    c = cells.shape[1]
    q = points.shape[0]
    out_p, _, positions = pallas_fused3b_blend_padded(
        cells, points, cfg, q_block=q_block, gy=gy, rb=rb, sb=sb,
        interpret=interpret)
    qp = out_p.shape[-1]
    return out_p.reshape(7 * c, qp)[:, positions].reshape(7, c, q)


# SMEM metadata vector layout of the bwd kernel (see the blend kernel's
# packing note).
_BW_Z0, _BW_Y0, _BW_YS, _BW_HASV, _BW_SP, _BW_SN = range(6)


def _bwd3b_block_contrib(xyzv_ref, off_ref, g_ref, s, *, cfg, spatial, gy,
                         q_block, channels, n_cells, wpad, y0, z0):
    """One query block's window cotangent (wy_rows, nsh, C*N, Wp).

    The factored transpose of the blend — stage 1 spreads the weighted
    cotangents over the window rows on the VPU, stage 2 scatters over x
    via the one-hot transpose on the MXU.  Shared verbatim by the
    serialized-RMW and ghost-accumulator backward kernels (they differ
    only in how this contribution reaches HBM)."""
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    wy_rows = gy + front_pad(cfg)
    cn3 = nsh * c * n
    valid = (xyzv_ref[s, 3] > 0.5).astype(jnp.float32)
    off_col = off_ref[:, 0:1]
    hx, wx = _axis_prep_wp(xyzv_ref[s, 0:1], w, wpad, cfg, off_col,
                           q_block)
    hyl, wyw, ymask = _axis_prep_window(xyzv_ref[s, 1:2], h, cfg, off_col,
                                        q_block, y0, gy)
    wz, zmask = _z_weights(xyzv_ref[s, 2:3], d, cfg, off_col, z0 - 2)
    mask = valid * ymask * zmask

    g = g_ref[s].reshape(7, c, q_block)
    gv = [g[r] * mask for r in range(7)]

    contrib = jnp.zeros((wy_rows * cn3, wpad), jnp.float32)
    for i in range(nsh):
        # stage 1 (VPU): spread the weighted cotangents over the window
        # rows with the one-hot row blend, in the row-major (window row,
        # slab, c, n) M order of the brick scratch
        rows_u = [jnp.zeros((cn3, q_block), jnp.float32)
                  for _ in range(wy_rows)]
        for j in range(nsh):
            # factored cotangent panel (transpose of the fwd blend):
            # 5 pair products + 7 row FMAs + 3*nsh z-spread FMAs
            # instead of nsh slabs x 21 per-row coefficient FMAs
            pair = [(wyw[ky][j] * wx[kx][i]) for (kx, ky) in _XY_PAIRS]
            s = [jnp.zeros((c, n, q_block), jnp.float32)
                 for _ in range(3)]
            for r, (pi, kz) in enumerate(_ROW_FACTORS):
                s[kz] = s[kz] + pair[pi][None] * gv[r][:, None, :]
            ps = [s[0] * wz[0][k][None] + s[1] * wz[1][k][None]
                  + s[2] * wz[2][k][None] for k in range(nsh)]
            pk = jnp.stack(ps, axis=0).reshape(cn3, q_block)
            # only rows j..j+gy-1 can hit (see the blend kernel)
            for row in range(j, j + gy):
                rows_u[row] = rows_u[row] + pk * hyl[j][row][None, :]
        u = jnp.concatenate(rows_u, axis=0)        # (wy_rows*cn3, Qb)
        # stage 2 (MXU): scatter over x via the one-hot transpose
        contrib = contrib + mxu.onehot_dot(
            u, hx[i], (((1,), (1,)), ((), ())),
            passes=mxu.passes_for(cfg))            # (rows, W)
    return contrib.reshape(wy_rows, nsh, c * n, wpad)


def _fused3b_bwd_kernel(xyzv_ref, meta_ref, off_ref, g_ref,
                        vol0_ref, out_ref, scratch, sem_in, sem_out, *, cfg,
                        spatial, gy, rb, q_block, sb, channels, n_cells,
                        wpad):
    del vol0_ref  # aliased to out_ref; zero-initialized by XLA
    c = channels
    wy_rows = gy + front_pad(cfg)
    rows_s = rb * gy + front_pad(cfg)
    nsh = n_shifts(cfg)

    # ``sb`` sub-blocks per grid step (see the blend kernel): the SP/SN
    # same-super-bin RMW-elision flags are per SUB-block over the global
    # block sequence, so the read/accumulate/writeback chain is the sb=1
    # chain verbatim — a writeback of sub-block s is always waited before
    # sub-block s+1's read of a different super-brick starts.
    for s in range(sb):
        z0 = meta_ref[s, 0, _BW_Z0]
        y0 = meta_ref[s, 0, _BW_Y0]
        ys = meta_ref[s, 0, _BW_YS]

        @pl.when(meta_ref[s, 0, _BW_HASV] > 0)
        def _():
            # Same-SUPER-bin RMW elision: the scatter accumulates into a
            # rb-bin-tall super-brick held in scratch.  When the previous
            # block already holds this super-brick (sp), skip the read;
            # when the next block continues it (sn), defer the writeback.
            # Each block adds its contribution at its bin's dynamic row
            # offset inside the super-brick.  Ablation motivation
            # (ablate_v4.py, 128^3 / 1M pts): the per-bin read-modify-
            # write chain was 21 ms of the 42.6 ms backward; super-bricks
            # cut the chain ~rb x and dedupe the fp-row overlap traffic
            # between adjacent bins.  Bins pad to whole blocks with real
            # blocks first, so a deferring block's successor always
            # computes (hasv folded into sn host-side).  Correctness of
            # overlapping reads (adjacent super-bricks share fp rows;
            # z-adjacent slabs overlap too): grid steps run sequentially
            # and the writeback is synchronous, so a read always sees
            # every earlier writeback.
            cp = pltpu.make_async_copy(
                out_ref.at[pl.ds(ys, rows_s), pl.ds(z0, nsh)],
                scratch, sem_in)

            @pl.when(meta_ref[s, 0, _BW_SP] == 0)
            def _():
                cp.start()
            contrib = _bwd3b_block_contrib(
                xyzv_ref, off_ref, g_ref, s, cfg=cfg, spatial=spatial,
                gy=gy, q_block=q_block, channels=c, n_cells=n_cells,
                wpad=wpad, y0=y0, z0=z0)
            @pl.when(meta_ref[s, 0, _BW_SP] == 0)
            def _():
                cp.wait()
            dy = y0 - ys
            scratch[pl.ds(dy, wy_rows)] = (
                scratch[pl.ds(dy, wy_rows)] + contrib)

            @pl.when(meta_ref[s, 0, _BW_SN] == 0)
            def _():
                cp2 = pltpu.make_async_copy(
                    scratch,
                    out_ref.at[pl.ds(ys, rows_s), pl.ds(z0, nsh)],
                    sem_out)
                cp2.start()
                cp2.wait()


# Ghost-accumulator metadata (the ghost kernel needs no ys/sn: the block
# index IS the super-brick, Mosaic handles the writeback).
_GW_Z0, _GW_Y0, _GW_YS, _GW_HASV, _GW_SP = range(5)

# HBM budget for the private ghost-accumulator array; above it the
# serialized-RMW kernel serves the shape instead (~1.4 GB at the 128^3
# sweep: nbz * ceil(nby/rb) super-bricks x a (rb*gy+fp, nsh, C*N, Wp)
# f32 brick each).
_GHOST_HBM_BUDGET = 6 << 30


def _fused3b_bwd_ghost_kernel(sbi_ref, xyzv_ref, meta_ref, off_ref, g_ref,
                              out_ref, *, cfg, spatial, gy, rb,
                              q_block, channels, n_cells, wpad):
    """Ghost-accumulator gradient: every super-brick owns a PRIVATE
    accumulator block, so the serialized read+writeback chain of
    _fused3b_bwd_kernel disappears.

    The scalar-prefetched ``sbi`` drives the OUTPUT BlockSpec's index
    map: blocks of one super-brick are consecutive in the sorted grid,
    so Mosaic keeps the (1, rows_s, nsh, C*N, Wp) block resident across
    them and double-buffers the writeback against the next super-brick's
    compute — the chain that measured 21.4 ms at the 128^3 sweep (only
    3.4 ms of it bytes, BENCHMARKS.md) becomes pipelined stores.  There
    are NO reads: private accumulators never overlap, unlike the shared
    volume layout whose adjacent super-bricks share fp pad rows and
    nsh-1 z slabs (the reason the RMW kernel had to read + write back
    synchronously).  Super-bricks with no queries are never written (the
    fold drops them via the host-computed ``visited`` mask); an XLA
    overlap-add (_fold_bricks) folds the ghosts onto the shared volume
    layout afterwards.

    Reference bar: the atomic scatter this whole family replaces,
    cosine_sampler_3d_kernel.cu:506-523.
    """
    y0 = meta_ref[0, 0, _GW_Y0]
    ys = meta_ref[0, 0, _GW_YS]
    z0 = meta_ref[0, 0, _GW_Z0]
    wy_rows = gy + front_pad(cfg)

    @pl.when(meta_ref[0, 0, _GW_SP] == 0)
    def _():
        # first block of this super-brick: initialize the resident block
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(meta_ref[0, 0, _GW_HASV] > 0)
    def _():
        contrib = _bwd3b_block_contrib(
            xyzv_ref, off_ref, g_ref, 0, cfg=cfg, spatial=spatial, gy=gy,
            q_block=q_block, channels=channels, n_cells=n_cells, wpad=wpad,
            y0=y0, z0=z0)
        dy = y0 - ys
        out_ref[0, pl.ds(dy, wy_rows)] = (
            out_ref[0, pl.ds(dy, wy_rows)] + contrib)


def _fold_bricks(acc, visited, nbz, nysb, rows_s, nsh, cn, wp, gy, rb, fp,
                 hp, dz):
    """Overlap-add the private ghost bricks onto the shared volume layout
    (Hp, D+fp+2, C*N, Wp).

    Brick sbi = ysb*nbz + z0 covers rows [ysb*rb*gy, ysb*rb*gy + rows_s)
    x slabs [z0, z0+nsh).  The Y-MAJOR brick numbering makes the fold
    transpose-free: reshaped (nysb, nbz, rows, nsh, cn, wp), merging
    (nysb, rows) IS the volume's y axis, so each z shift is one
    contiguous band add (the y overlap — fp spill rows into the next
    super-brick — folds via the padded-band trick of fused2w/3w).
    ``visited`` (nsb,) flags bricks some block actually wrote; the rest
    hold uninitialized memory (the kernel is alias-free on purpose — a
    1.4 GB zeros init per call costs more than this select) and are
    where'd to zero, not multiplied (garbage bytes can encode inf/nan).
    """
    own_rows = rb * gy
    a = jnp.where(visited[:, None, None, None, None] > 0, acc, 0.0)
    a = a.reshape(nysb, nbz, rows_s, nsh, cn, wp)
    # over-padded target: y by own_rows (the last spill band), z by nsh-1
    vol = jnp.zeros((hp + own_rows, dz + nsh - 1, cn, wp), acc.dtype)
    own = a[:, :, :own_rows]                     # (nysb, nbz, rb*gy, ...)
    spill = a[:, :, own_rows:]                   # (nysb, nbz, fp, ...)
    spill = jnp.pad(spill, ((0, 0), (0, 0), (0, own_rows - fp),
                            (0, 0), (0, 0), (0, 0)))
    ny = nysb * own_rows
    own = own.transpose(0, 2, 1, 3, 4, 5).reshape(ny, nbz, nsh, cn, wp)
    spill = spill.transpose(0, 2, 1, 3, 4, 5).reshape(ny, nbz, nsh, cn, wp)
    for zi in range(nsh):
        vol = vol.at[0:ny, zi:zi + nbz].add(own[:, :, zi])
        vol = vol.at[own_rows:own_rows + ny, zi:zi + nbz].add(
            spill[:, :, zi])
    return vol[:hp, :dz]


def _bwd3b_from_slots(gq, points, in_spatial, cfg: SamplerConfig,
                      n_cells: int, q_block: int, gy: int, interpret: bool,
                      out_dtype, rb: int | None = None, plan=None,
                      crop: bool = True, ghost: bool | None = None,
                      sb: int = 1):
    """Cells-cotangent given the cotangent already in slot space.

    ``gq``: (7*C, QP) f32, slot-ordered per the _brick_bin layout of
    ``points`` (padding slots are masked in-kernel via occ).
    ``crop=False`` keeps the accumulator in the kernel layout — the RMW
    kernel's native output — with the pad-slot garbage zeroed via
    vol_pad_mask_mul instead of cropped (the vol-resident training path:
    no per-step 0.6 GB crop+transpose)."""
    d, h, w = in_spatial
    n = n_cells
    npad = _npad(n)
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    k_rows = 7
    c = gq.shape[0] // k_rows
    rb = rb or _rb_fit(cfg, n, c, w, gy)
    nby, _, _, hp = _geom(d, h, gy, fp, rb)
    wp = _wpad(w)
    positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
        points, d, h, cfg, q_block, gy, plan)
    nblocks = qp // q_block

    xyzv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(4, nblocks, q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    ybin = y0 // gy
    ys = (ybin // rb) * (rb * gy)

    nbz = d + 2                        # z0 range (see _brick_bin)
    nysb = -(-nby // rb)
    rows_s = rb * gy + fp
    cn = c * npad
    acc_bytes = nbz * nysb * rows_s * nsh * cn * wp * 4
    if ghost is None:
        # OPT-IN: the ghost path measured a net LOSS at the 128^3 sweep
        # (kernel 22.5 ms vs 28.2 serialized, but the XLA fold epilogue
        # costs ~39 ms — scripts/time_ghost.py, BENCHMARKS.md round 5).
        # Kept as the measured answer to "fewer serialized DMAs": the
        # chain itself is only ~6 ms of the backward; the floor is
        # per-block fixed cost, which de-serialization cannot touch.
        ghost = False
    if ghost and acc_bytes > _GHOST_HBM_BUDGET:
        ghost = False

    if ghost:
        # private-accumulator path: no reads, Mosaic-pipelined writebacks.
        # Y-MAJOR brick numbering so the fold epilogue's y-merge is one
        # block-strided transpose, not a full-volume relayout.
        sbi = (ybin // rb) * nbz + z0
        # All-padding blocks sit only in the static-bound TAIL of the
        # layout (_brick_bin pads per bin; every present bin's blocks end
        # with its own partial block).  They inherit the LAST bin's
        # z0/y0, whose super-brick may be an earlier-visited one — remap
        # them to the last REAL block's sbi so a visited output block is
        # never revisited non-consecutively (which would re-write it).
        last_real = sbi[jnp.maximum(jnp.max(bi * hasv), 0)]
        sbi = jnp.where(hasv > 0, sbi, last_real).astype(jnp.int32)
        spg = (sbi == jnp.roll(sbi, 1)).astype(jnp.int32).at[0].set(0)
        # bricks actually written; the rest hold uninitialized memory
        # (no zeros init / aliasing on purpose) and are dropped in the
        # fold — see _fold_bricks
        visited = jnp.zeros((nbz * nysb,), jnp.int32).at[sbi].max(
            1, mode="drop")
        gmeta = jnp.stack([z0, y0, ys, hasv, spg],
                          axis=1).astype(jnp.int32).reshape(nblocks, 1, 5)
        gqb = gq.reshape(k_rows * c, nblocks, q_block).transpose(1, 0, 2)
        gkernel = functools.partial(
            _fused3b_bwd_ghost_kernel, cfg=cfg, spatial=(d, h, w), gy=gy,
            rb=rb, q_block=q_block, channels=c, n_cells=npad, wpad=wp)
        bricks = pl.pallas_call(
            gkernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[
                    pl.BlockSpec((1, 4, q_block),
                                 lambda qi, sbi_ref: (qi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 5),
                                 lambda qi, sbi_ref: (qi, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((npad, 1), lambda qi, sbi_ref: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, k_rows * c, q_block),
                                 lambda qi, sbi_ref: (qi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, rows_s, nsh, cn, wp),
                    lambda qi, sbi_ref: (sbi_ref[qi], 0, 0, 0, 0)),
                scratch_shapes=[],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nbz * nysb, rows_s, nsh, cn, wp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sbi, xyzv, gmeta, offsets, gqb)
        acc = _fold_bricks(bricks, visited, nbz, nysb, rows_s, nsh, cn,
                           wp, gy, rb, fp, hp, d + fp + 2)
        if not crop:
            return vol_pad_mask_mul(acc, n, c, in_spatial,
                                    cfg).astype(out_dtype)
        acc = acc.reshape(hp, d + fp + 2, c, npad,
                          wp)[fp:fp + h, fp:fp + d, :, :n, :w]
        return acc.transpose(3, 2, 1, 0, 4).astype(out_dtype)

    vol0 = jnp.zeros((hp, d + fp + 2, c * npad, wp), jnp.float32)
    sbk = z0 * nby + (ybin // rb) * rb
    hasv_next = jnp.roll(hasv, -1).at[-1].set(0)
    same = sbk == jnp.roll(sbk, -1)
    sn = (same & (hasv_next > 0) & (bi < nblocks - 1)).astype(jnp.int32)
    sp = jnp.roll(sn, 1).at[0].set(0)
    meta = jnp.stack([z0, y0, ys, hasv, sp, sn],
                     axis=1).astype(jnp.int32).reshape(nblocks, 1, 6)
    # block-contiguous cotangent: each block reads ONE linear 14 KB slab
    # instead of 7C strided 512 B rows (see the blend kernel's out note)
    gq = gq.reshape(k_rows * c, nblocks, q_block).transpose(1, 0, 2)

    # sub-blocking (see _blend3b_call): inert tail blocks to an sb multiple
    nsuper = -(-nblocks // sb)
    extra = nsuper * sb - nblocks
    if extra:
        xyzv = jnp.pad(xyzv, ((0, extra), (0, 0), (0, 0)))
        gq = jnp.pad(gq, ((0, extra), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, extra), (0, 0), (0, 0)), mode="edge")
        meta = meta.at[nblocks:, :, _BW_HASV].set(0)

    kernel = functools.partial(
        _fused3b_bwd_kernel, cfg=cfg, spatial=(d, h, w), gy=gy, rb=rb,
        q_block=q_block, sb=sb, channels=c, n_cells=npad, wpad=wp)
    acc = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((sb, 4, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, 1, 6), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, k_rows * c, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((hp, d + fp + 2, c * npad, wp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb * gy + fp, nsh, c * npad, wp), jnp.float32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyzv, meta, offsets, gq, vol0)
    if not crop:
        return vol_pad_mask_mul(acc, n, c, in_spatial, cfg).astype(out_dtype)
    acc = acc.reshape(hp, d + fp + 2, c, npad,
                      wp)[fp:fp + h, fp:fp + d, :, :n, :w]
    return acc.transpose(3, 2, 1, 0, 4).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "gy", "rb",
                                             "interpret", "ghost", "sb"))
def pallas_fused3b_bwd(g, points, in_spatial: Tuple[int, ...],
                       cfg: SamplerConfig, n_cells: int,
                       q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                       rb: int | None = None, interpret: bool = False,
                       ghost: bool | None = None, sb: int = V3B_SB):
    """Cells-cotangent of pallas_fused3b_blend: (N, C, D, H, W)."""
    d, h, w = in_spatial
    k_rows, c, q = g.shape
    positions, occ, z0, y0, hasv, qp = _brick_bin(points, d, h, cfg,
                                                  q_block, gy)
    gq = scatter_to_slots(
        g.reshape(k_rows * c, q).astype(jnp.float32).T, positions, qp).T
    return _bwd3b_from_slots(gq, points, in_spatial, cfg, n_cells, q_block,
                             gy, interpret,
                             jnp.promote_types(g.dtype, points.dtype),
                             rb=rb, ghost=ghost, sb=sb)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "gy", "rb",
                                             "interpret", "ghost", "sb"))
def pallas_fused3b_bwd_padded(g_p, points, in_spatial: Tuple[int, ...],
                              cfg: SamplerConfig, n_cells: int,
                              q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                              rb: int | None = None,
                              interpret: bool = False, plan=None,
                              ghost: bool | None = None, sb: int = V3B_SB):
    """Cells-cotangent taking the slot-space (7, C, QP) cotangent of
    pallas_fused3b_blend_padded directly — no scatter pass."""
    k_rows, c, qp = g_p.shape
    gq = g_p.reshape(k_rows * c, qp).astype(jnp.float32)
    return _bwd3b_from_slots(gq, points, in_spatial, cfg, n_cells, q_block,
                             gy, interpret,
                             jnp.promote_types(g_p.dtype, points.dtype),
                             rb=rb, plan=plan, ghost=ghost, sb=sb)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "gy", "rb",
                                             "interpret", "ghost", "sb"))
def pallas_fused3b_bwd_vol(g_p, points, in_spatial: Tuple[int, ...],
                           cfg: SamplerConfig, n_cells: int,
                           q_block: int = V3B_Q_BLOCK, gy: int = V3B_GY,
                           rb: int | None = None,
                           interpret: bool = False, plan=None,
                           ghost: bool | None = None, sb: int = V3B_SB):
    """Volume-cotangent of pallas_fused3b_blend_vol, IN the kernel layout
    (Hp, D+fp+2, C*Npad, Wp) f32, pad slots exactly zero.

    vol_to_cells(result) == pallas_fused3b_bwd_padded(same args): the RMW
    kernel natively accumulates in this layout; this entry just skips the
    crop+transpose and masks the pad garbage instead (vol_pad_mask_mul).
    """
    k_rows, c, qp = g_p.shape
    gq = g_p.reshape(k_rows * c, qp).astype(jnp.float32)
    return _bwd3b_from_slots(gq, points, in_spatial, cfg, n_cells, q_block,
                             gy, interpret, jnp.float32, rb=rb, plan=plan,
                             crop=False, ghost=ghost, sb=sb)
