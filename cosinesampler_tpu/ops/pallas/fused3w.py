"""v5 windowed 3D fused kernels: the (y, x) gather window folded into K.

Round-1's v3 kernels (fused3s.py) bin queries by z-slab and pay 27 one-hot
contractions at K = H*W per query block.  This generation folds BOTH the
3-slab z window and a (gy+2)-row y window into the contraction dimension:

1. Queries are binned by ``(floor(base_z), floor(base_y) // gy)`` (the v4
   brick sort, fused3b._brick_bin), so each kernel block's queries share one
   (3 slab) x (gy+2 row) x W texel window.
2. The padded volume is re-laid out XLA-side as a per-bin window array
   ``(nbins, 3*C*N, (gy+2)*Wp)`` with the window texels contiguous on the
   LANE dimension — Mosaic cannot merge (sublane, lane) dims in-kernel, so
   the (rows, x) flattening has to happen host-side.
3. Per corner pair (j, i) the gather is ONE one-hot matmul against a fused
   (y, x)-window selector of K = (gy+2)*Wp:

       v_kji[(slab k, c, n), q] = window[(k, c, n), :] @ onehot_ji[:, q]

   with all 3 z-slabs stacked along M.  For 16^3 (Wp = 16, rows = 8) that
   is 9 matmuls of (3*C*N, 128) x (128, Qb) per block, vs v3's 27 of
   (C*N, 256) x (256, Qb): ~2.4x fewer MXU tiles, and K = 128 exactly fills
   the MXU depth.  This supersedes the planned literal backport of the v4
   two-stage separable contraction (MXU over x + VPU row blend): fusing the
   row blend INTO the matmul removes the VPU stage as well and needs no
   in-kernel reshape.
4. The window array lives in HBM; each block DMAs its (1, 3*C*N, K) window
   into VMEM scratch (bin index is data-dependent, so a BlockSpec index_map
   cannot express it).  The volume itself never needs to be VMEM-resident,
   so v5 also covers mid-size volumes (~32^3-64^3) that v3 rejects; only
   the window-array duplication factor (~3 * rows/gy) gates the top end,
   where the v4 bricked kernels take over.
5. The gradient is the exact transpose: per-block window cotangents
   accumulate into the window array via sequential-grid read-modify-write
   (deterministic, atomic-free — the design replacing the CUDA reference's
   fastAtomicAdd scatters, cosine_sampler_3d_kernel.cu:506-523), then an
   XLA-side overlap-add folds the windows back onto the padded volume.

Out-of-bounds semantics match the reference CUDA bounds-check-to-zero
(cosine_sampler_3d_kernel.cu:343-369): x corners via masked one-hot
positions, y/z via the zero pad margins plus bin-membership masks.  Scope
is any padding mode (zeros / border / reflection) + shared query points;
reflection uses the widened 4-shift patch (prep.n_shifts): the window
grows to 4 z-slabs x (gy+3) rows, the per-axis corner loops run over 4
shifts, and binning is on the FOLDED coordinates (prep.bin_base).
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
from .fused3b import (_brick_bin, _geom, _pad_volume, make_plan as
                      _make_plan_3b, plan_or_bin, scatter_to_slots)
from .fused3d import _ROW_FACTORS, _ROWS_3D, _XY_PAIRS
from .fused3s import _z_weights
from .prep import (FUSED_PADDING_MODES_WIDE, axis_transform, cell_weights,
                   front_pad, n_shifts, npad as _npad)

# 128 measured fastest on v5e once the blend ran relayout-free (5.7/6.2/
# 7.3/8.4 ms at 128/256/512/1024 on the reference 3D workload,
# scripts/tune_v5.py): per-query MXU work is block-size-invariant, so the
# smallest block minimizes per-bin padding queries (<= nbins * q_block
# slots).  The earlier 512 tuning predates the sublane-pad fix.
V3W_Q_BLOCK = 128
# The ensemble dim is sublane-padded HOST-SIDE (prep.npad) so the
# in-kernel reshapes between the (3*C*N, Qb) matmul layout and the
# (3, C, N, Qb) blend layout are layout-free: with an unaligned N (the
# reference 3D workload has N=50, which tiles pad to 56) every such reshape
# is a full relayout of the panel output, 9x per query block — measured as
# the gap between the 2D kernel's 74% MXU occupancy (N=96, aligned) and the
# 3D kernel's ~10%.  Padded cells carry zero volume, so they gather and
# scatter zeros; the bwd crops them before returning.
V3W_MIN_Q = 2048
# HBM budget for the per-bin window array (it duplicates the volume by
# ~3 * rows/gy); above this the v4 bricked kernels take over.
_WIN_HBM_BUDGET = 1 << 30
# Below ~this many queries per bin the padded bin blocks dominate.
_MIN_Q_PER_BIN = 8


def _xpad(w: int) -> int:
    """x size padded so K = rows * wp is lane-aligned: the next power of
    two up to 128, then 128-multiples.  Pad columns hold zeros (inert)."""
    if w > 128:
        return -(-w // 128) * 128
    p = 1
    while p < w:
        p *= 2
    return p


def _win_rows(wp: int) -> int:
    """Rows per window: >= 4 (3 corner rows + 1 so gy >= 2) and enough to
    make K = rows * wp at least one full 128-lane tile."""
    return max(4, 128 // wp) if wp <= 128 else 4


def _win_geom(w: int, cfg: SamplerConfig):
    """(wp, rows, gy, nsh, fp) for the window layout under ``cfg``.

    Window rows = gy + fp (the fp extra rows hold the corner spill past
    the bin's own gy rows; fp = 3 for reflection's widened patch, which
    also needs gy >= fp for the backward overlap-add, hence rows >= 2*fp).
    """
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    wp = _xpad(w)
    rows = max(_win_rows(wp), 2 * fp)
    return wp, rows, rows - fp, nsh, fp


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             n_queries: int | None = None,
             q_block: int | None = None) -> bool:
    q_block = q_block or V3W_Q_BLOCK
    if cfg.dim != 3 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    n, c, d, h, w = cells_shape
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    k = rows * wp
    cn3 = nsh * _npad(n) * c
    if cn3 * k * 4 > vmem_budget:                   # window scratch
        return False
    # bf16 split copies of the window + the (K, Qb) hit panels
    if mxu.passes_for(cfg) * cn3 * k * 2 > vmem_budget:
        return False
    if k * q_block * 4 > vmem_budget:
        return False
    nby, nbz, nbins, hp = _geom(d, h, gy, fp)
    if nbins * cn3 * k * 4 > _WIN_HBM_BUDGET:       # window array
        return False
    if n_queries is not None and n_queries < max(
            V3W_MIN_Q, _MIN_Q_PER_BIN * nbins):
        return False
    return True


def make_plan(points, in_spatial, cfg: SamplerConfig,
              q_block: int = V3W_Q_BLOCK):
    """Precompute the bin plan for a FIXED point set (fused3b.make_plan
    semantics, with this generation's window-derived y group size)."""
    d, h, w = in_spatial
    gy = _win_geom(w, cfg)[2]
    return _make_plan_3b(points, in_spatial, cfg, q_block=q_block, gy=gy)


def _x_prep(coord, size, cfg, off_col):
    """Per-corner x window positions (-1 = out of bounds) + cell weights.

    Corner i sits at texel floor(base) + shift_lo + i (shift_lo = -1 for
    reflection's widened patch, 0 otherwise), matching the cell_weights
    entry order."""
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    lo = 2 - front_pad(cfg)
    fb = jnp.floor(base)
    fbi = jnp.clip(fb, -4.0, float(size) + 3.0).astype(jnp.int32)
    px = []
    for i in range(n_shifts(cfg)):
        ci = fbi + (lo + i)
        ok = (ci >= 0) & (ci <= size - 1)
        px.append(jnp.where(ok, ci, -1))
    return px, cell_weights(base, ixn, scale, cfg)


def _y_prep(coord, size, cfg, off_col, y0, gy):
    """Window-local y corner rows + cell weights + bin-membership mask.

    Corner j's padded row is floor(base) + 2 + j for every padding mode:
    the texel row is fb + shift_lo + j and the volume's front pad is
    2 - shift_lo, so the two cancel.  Window-local row = that - y0."""
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    fb = jnp.floor(base)
    loc = fb + 2.0 - y0.astype(jnp.float32)
    ymask = ((loc >= 0.0) & (loc <= float(gy - 1))).astype(jnp.float32)
    loci = jnp.clip(loc, 0.0, float(gy - 1)).astype(jnp.int32)
    ry = [loci + j for j in range(n_shifts(cfg))]
    return ry, cell_weights(base, ixn, scale, cfg), ymask


def _windows(vol, nbins, nby, gy, rows, nsh):
    """(D+fp+2, C*N, Hp, Wp) -> per-bin (nbins, nsh*C*N, rows*Wp) windows.

    The (rows, x) flattening onto lanes happens here because Mosaic cannot
    merge a (sublane, lane) pair in-kernel.
    """
    d4, cn, hp, wp = vol.shape
    idx = jnp.arange(nbins, dtype=jnp.int32)
    bz = idx // nby
    by = (idx % nby) * gy

    zero = jnp.int32(0)

    def one(z0b, y0b):
        return jax.lax.dynamic_slice(vol, (z0b, zero, y0b, zero),
                                     (nsh, cn, rows, wp))

    wins = jax.vmap(one)(bz, by)
    return wins.reshape(nbins, nsh * cn, rows * wp)


def _scatter_windows(wins, nbz, nby, gy, rows, cn, hp, wp, nsh, fp):
    """Overlap-add the per-bin window cotangents back onto the padded
    volume layout (D+fp+2, C*N, Hp, Wp).  Fully vectorized: nsh shifted
    adds for the z overlap, own-rows + padded-overflow adds for the y
    overlap (the fp spill rows land in the next y group; gy >= fp by
    _win_geom construction)."""
    d4 = nbz + fp
    wins = wins.reshape(nbz, nby, nsh, cn, rows, wp)
    accz = jnp.zeros((d4, nby, cn, rows, wp), wins.dtype)
    for k in range(nsh):         # slab k of window bz lands at padded z=bz+k
        accz = accz.at[k:k + nbz].add(wins[:, :, k])
    own = accz[:, :, :, :gy]     # rows owned by the bin
    ovf = accz[:, :, :, gy:]     # fp rows spilling into the next y group
    ext = nby * gy + gy
    out = jnp.zeros((d4, cn, ext, wp), wins.dtype)
    out = out.at[:, :, :nby * gy].add(
        own.transpose(0, 2, 1, 3, 4).reshape(d4, cn, nby * gy, wp))
    ovf_p = jnp.pad(ovf, ((0, 0), (0, 0), (0, 0), (0, gy - fp), (0, 0)))
    out = out.at[:, :, gy:gy + nby * gy].add(
        ovf_p.transpose(0, 2, 1, 3, 4).reshape(d4, cn, nby * gy, wp))
    return out[:, :, :hp]


# Merged per-block inputs (the v4 lesson, fused3b.py: per-grid-step fixed
# cost scales with the BlockSpec count, measured -0.3 us/block): one
# (1, 4, Qb) VMEM block carries x/y/z/valid and one SMEM int vector the
# block metadata, instead of 4 + 7 separate specs.
_M_Z0, _M_Y0, _M_HASV, _M_BBN, _M_FIRST, _M_HN, _M_PAR = range(7)
_MB_Z0, _MB_Y0, _MB_HASV, _MB_SP, _MB_SN = range(5)


def _fused3w_blend_kernel(xyzv_ref, meta_ref, off_ref, win_ref, out_ref,
                          scratch, sem,
                          *, cfg, spatial, gy, q_block, channels, n_cells,
                          wp, nby):
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    z0 = meta_ref[0, 0, _M_Z0]
    y0 = meta_ref[0, 0, _M_Y0]
    bbin = z0 * nby + y0 // gy
    p = meta_ref[0, 0, _M_PAR]

    # Double-buffered window prefetch across grid steps (see fused3b):
    # wait the DMA the previous block started, start the next block's.
    # Gated to the real-block prefix (_brick_bin packs real blocks first):
    # padding blocks skip the serialized window copies entirely — at the
    # flagship 3D workload they are ~1/5 of the grid.
    def win_dma(slot, b):
        return pltpu.make_async_copy(win_ref.at[pl.ds(b, 1)],
                                     scratch.at[pl.ds(slot, 1)], sem.at[slot])

    @pl.when(meta_ref[0, 0, _M_HASV] > 0)
    def _():
        @pl.when(meta_ref[0, 0, _M_FIRST] > 0)
        def _():
            win_dma(p, bbin).start()

        win_dma(p, bbin).wait()

        @pl.when(meta_ref[0, 0, _M_HN] > 0)
        def _():
            win_dma(1 - p, meta_ref[0, 0, _M_BBN]).start()

        valid = (xyzv_ref[0, 3] > 0.5).astype(jnp.float32)
        off_col = off_ref[:, 0:1]
        px, wx = _x_prep(xyzv_ref[0, 0:1], w, cfg, off_col)
        ry, wy, ymask = _y_prep(xyzv_ref[0, 1:2], h, cfg, off_col, y0, gy)
        wz, zmask = _z_weights(xyzv_ref[0, 2:3], d, cfg, off_col, z0 - 2)
        mask = valid * ymask * zmask
        terms = mxu.data_terms(scratch[pl.ds(p, 1)][0],
                               mxu.passes_for(cfg))           # (nsh*C*N, K)
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)
        # The VPU weight blend is the 3D bottleneck (the MXU gather runs at
        # ~10% occupancy while the 2D kernel hits ~74%), so the per-panel
        # work is factored: z-reduce the nsh slabs once per z-order, apply
        # the 5 shared (kx, ky) pair products, and defer the ensemble
        # reduction to ONE sum per row after the panel loops.
        rows_acc = [jnp.zeros((c, n, q_block), jnp.float32) for _ in _ROWS_3D]
        for j in range(nsh):
            rb = ry[j] * wp
            for i in range(nsh):
                pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                hit = (iota == pos).astype(jnp.float32)       # (K, Qb)
                v = mxu.onehot_dot_terms(
                    terms, hit, (((1,), (0,)), ((), ())))     # (nsh*C*N, Qb)
                v = v.reshape(nsh, c, n, q_block)
                zv = [sum(v[k] * wz[kz][k][None] for k in range(nsh))
                      for kz in range(3)]
                pair = [(wy[ky][j] * wx[kx][i])[None]
                        for (kx, ky) in _XY_PAIRS]            # (1, N, Qb)
                for r, (pi, kz) in enumerate(_ROW_FACTORS):
                    rows_acc[r] = rows_acc[r] + pair[pi] * zv[kz]
        out = jnp.concatenate(
            [jnp.sum(acc, axis=1) for acc in rows_acc], axis=0)
        out_ref[:] = out * mask

    @pl.when(meta_ref[0, 0, _M_HASV] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused3w_blend_padded(cells, points, cfg: SamplerConfig,
                                q_block: int = V3W_Q_BLOCK,
                                interpret: bool = False, plan=None):
    """Slot-resident variant: (out_p (7, C, QP), occ (QP,), positions (Q,)).

    ``out_p[:, :, positions] == pallas_fused3w_blend(...)``; padding slots
    are zero and flagged by ``occ``.  Consumers that keep the whole
    training step in slot space (models/pinn.py slot_resident=True) skip
    the per-step (7*C, Q) output gather here AND the matching cotangent
    scatter in the backward — two of the large random-access passes a
    100k-point step otherwise pays (1M-element random gathers measure
    ~5-6 ms each on TPU; see fused3b._brick_bin)."""
    n, c, d, h, w = cells.shape
    q = points.shape[0]
    npad = _npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, nbz, nbins, hp = _geom(d, h, gy, fp)
    positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
        points, d, h, cfg, q_block, gy, plan)
    nblocks = qp // q_block

    xyzv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(4, nblocks, q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 4)
    vol = _pad_volume(cells_p, d, h, w, hp, wp, fp, cfg)
    wins = _windows(vol, nbins, nby, gy, rows, nsh)
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    bb = z0 * nby + y0 // gy
    bbn = jnp.roll(bb, -1).at[-1].set(bb[-1])
    first = (bi == 0).astype(jnp.int32)
    hn = jnp.roll(hasv, -1).at[-1].set(0)   # next block is real -> prefetch
    parity = (bi % 2).astype(jnp.int32)
    meta = jnp.stack([z0, y0, hasv, bbn, first, hn, parity],
                     axis=1).astype(jnp.int32).reshape(nblocks, 1, 7)

    kernel = functools.partial(
        _fused3w_blend_kernel, cfg=cfg, spatial=(d, h, w), gy=gy,
        q_block=q_block, channels=c, n_cells=npad, wp=wp, nby=nby)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 7), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((7 * c, q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7 * c, qp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nsh * c * npad, rows * wp), wins.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyzv, meta, offsets, wins)
    dtype = jnp.promote_types(cells.dtype, points.dtype)
    return out.reshape(7, c, qp).astype(dtype), occ, positions


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused3w_blend(cells, points, cfg: SamplerConfig,
                         q_block: int = V3W_Q_BLOCK, interpret: bool = False):
    """(7, C, Q) fused multicell value/jac/diag-Hessian (v5, windowed)."""
    c = cells.shape[1]
    q = points.shape[0]
    out_p, _, positions = pallas_fused3w_blend_padded(
        cells, points, cfg, q_block=q_block, interpret=interpret)
    qp = out_p.shape[-1]
    return out_p.reshape(7 * c, qp)[:, positions].reshape(7, c, q)


def _fused3w_bwd_kernel(xyzv_ref, meta_ref, off_ref, g_ref, wins0_ref,
                        out_ref, scratch, sem_in, sem_out, *, cfg, spatial,
                        gy, q_block, channels, n_cells, wp, nby):
    del wins0_ref  # aliased to out_ref; zero-initialized by XLA
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    z0 = meta_ref[0, 0, _MB_Z0]
    y0 = meta_ref[0, 0, _MB_Y0]
    bbin = z0 * nby + y0 // gy

    @pl.when(meta_ref[0, 0, _MB_HASV] > 0)
    def _():
        # Same-bin RMW elision (see fused3b): a bin's first block reads its
        # window, continuation blocks accumulate in scratch, and only the
        # bin's last computing block writes back — at the flagship workload
        # (~7 blocks/bin) this cuts the serialized window DMA ~7x.
        cp = pltpu.make_async_copy(out_ref.at[pl.ds(bbin, 1)], scratch,
                                   sem_in)

        @pl.when(meta_ref[0, 0, _MB_SP] == 0)
        def _():
            cp.start()
        valid = (xyzv_ref[0, 3] > 0.5).astype(jnp.float32)
        off_col = off_ref[:, 0:1]
        px, wx = _x_prep(xyzv_ref[0, 0:1], w, cfg, off_col)
        ry, wy, ymask = _y_prep(xyzv_ref[0, 1:2], h, cfg, off_col, y0, gy)
        wz, zmask = _z_weights(xyzv_ref[0, 2:3], d, cfg, off_col, z0 - 2)
        mask = valid * ymask * zmask

        g = g_ref[:].reshape(7, c, q_block)
        gv = [g[r] * mask for r in range(7)]

        iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)
        contrib = jnp.zeros((nsh * c * n, k_win), jnp.float32)
        for j in range(nsh):
            rb = ry[j] * wp
            for i in range(nsh):
                pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                hit = (iota == pos).astype(jnp.float32)
                # Factored cotangent panel (transpose of the fwd blend):
                # group the 7 output rows by their shared (kx, ky) pair
                # product, then by z-order — 5 + 7 + 3*nsh VPU-wide ops
                # instead of the naive nsh slabs x 21 coefficient FMAs.
                pair = [(wy[ky][j] * wx[kx][i]) for (kx, ky) in _XY_PAIRS]
                s = [jnp.zeros((c, n, q_block), jnp.float32)
                     for _ in range(3)]
                for r, (pi, kz) in enumerate(_ROW_FACTORS):
                    s[kz] = s[kz] + pair[pi][None] * gv[r][:, None, :]
                ps = [s[0] * wz[0][k][None] + s[1] * wz[1][k][None]
                      + s[2] * wz[2][k][None] for k in range(nsh)]
                pk = jnp.stack(ps, axis=0).reshape(nsh * c * n, q_block)
                contrib = contrib + mxu.onehot_dot(
                    pk, hit, (((1,), (1,)), ((), ())),
                passes=mxu.passes_for(cfg))        # (nsh*C*N, K)
        @pl.when(meta_ref[0, 0, _MB_SP] == 0)
        def _():
            cp.wait()
        scratch[...] = scratch[...] + contrib[None]

        @pl.when(meta_ref[0, 0, _MB_SN] == 0)
        def _():
            cp2 = pltpu.make_async_copy(scratch, out_ref.at[pl.ds(bbin, 1)],
                                        sem_out)
            cp2.start()
            cp2.wait()


def _bwd_from_slots(gq, points, in_spatial, cfg: SamplerConfig, n_cells: int,
                    q_block: int, interpret: bool, out_dtype, plan=None):
    """Cells-cotangent given the cotangent already in slot space.

    ``gq``: (K_rows*C, QP) f32, slot-ordered per the _brick_bin layout of
    ``points`` (padding slots are masked in-kernel via occ)."""
    d, h, w = in_spatial
    n = n_cells
    npad = _npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, nbz, nbins, hp = _geom(d, h, gy, fp)
    positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
        points, d, h, cfg, q_block, gy, plan)
    k_rows_c = gq.shape[0]
    c = k_rows_c // 7
    k_rows = 7
    nblocks = qp // q_block

    xyzv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(4, nblocks, q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    wins0 = jnp.zeros((nbins, nsh * c * npad, rows * wp), jnp.float32)
    bi = jnp.arange(nblocks, dtype=jnp.int32)
    hasv_next = jnp.roll(hasv, -1).at[-1].set(0)
    same = (z0 == jnp.roll(z0, -1)) & (y0 == jnp.roll(y0, -1))
    sn = (same & (hasv_next > 0) & (bi < nblocks - 1)).astype(jnp.int32)
    sp = jnp.roll(sn, 1).at[0].set(0)
    meta = jnp.stack([z0, y0, hasv, sp, sn],
                     axis=1).astype(jnp.int32).reshape(nblocks, 1, 5)

    kernel = functools.partial(
        _fused3w_bwd_kernel, cfg=cfg, spatial=(d, h, w), gy=gy,
        q_block=q_block, channels=c, n_cells=npad, wp=wp, nby=nby)
    wins = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 5), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows * c, q_block), lambda qi: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nbins, nsh * c * npad, rows * wp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, nsh * c * npad, rows * wp), jnp.float32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyzv, meta, offsets, gq, wins0)
    acc = _scatter_windows(wins, nbz, nby, gy, rows, c * npad, hp, wp,
                           nsh, fp)
    acc = acc.reshape(nbz + fp, c, npad, hp, wp)[fp:fp + d, :, :n,
                                                 fp:fp + h, :w]
    return acc.transpose(2, 1, 0, 3, 4).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused3w_bwd(g, points, in_spatial: Tuple[int, ...],
                       cfg: SamplerConfig, n_cells: int,
                       q_block: int = V3W_Q_BLOCK, interpret: bool = False):
    """Cells-cotangent of pallas_fused3w_blend: (N, C, D, H, W)."""
    d, h, w = in_spatial
    k_rows, c, q = g.shape
    gy = _win_geom(w, cfg)[2]
    positions, occ, z0, y0, hasv, qp = _brick_bin(points, d, h, cfg,
                                                  q_block, gy)
    gq = scatter_to_slots(
        g.reshape(k_rows * c, q).astype(jnp.float32).T, positions, qp).T
    return _bwd_from_slots(gq, points, in_spatial, cfg, n_cells, q_block,
                           interpret,
                           jnp.promote_types(g.dtype, points.dtype))


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused3w_bwd_padded(g_p, points, in_spatial: Tuple[int, ...],
                              cfg: SamplerConfig, n_cells: int,
                              q_block: int = V3W_Q_BLOCK,
                              interpret: bool = False, plan=None):
    """Cells-cotangent taking the slot-space (7, C, QP) cotangent of
    pallas_fused3w_blend_padded directly — no scatter pass."""
    k_rows, c, qp = g_p.shape
    gq = g_p.reshape(k_rows * c, qp).astype(jnp.float32)
    return _bwd_from_slots(gq, points, in_spatial, cfg, n_cells, q_block,
                           interpret,
                           jnp.promote_types(g_p.dtype, points.dtype),
                           plan=plan)
