"""Slab-decomposed v1 kernels: blend/splat for volumes larger than VMEM.

The v1 kernels (kernels.py) keep one cell's whole volume in VMEM, which
caps them at roughly 6 MB per cell.  The reference's CUDA kernels have no
such cap — a grid-stride thread reads any volume straight from global
memory (cosine_sampler_3d_kernel.cu:250-371) — and before this module the
over-VMEM surface fell back to the XLA gather/scatter path, whose 3D legs
are known to fault the TPU worker when iterated under ``lax.scan``
(BENCHMARKS.md "Per-cell" caveat).  This closes VERDICT r3 missing #1
with a real TPU route.

Design: partition the volume's FIRST spatial axis (D in 3D, H in 2D) into
``dz``-row slabs and give the pallas grid a slab dimension.

* Coordinates are computed against the FULL axis size, so every padding
  mode (zeros / border / reflection folds) is bit-identical to v1; the
  slab's one-hot rows are then built locally (``iota == floor(x) - z0``),
  and corners outside the slab simply match no row — the same
  OOB-drop-to-zero mechanism v1 uses for out-of-bounds queries.
* blend: out[c, q] accumulates over the slab grid dimension (zero-init on
  the first slab via an indexed flag input — no ``pl.program_id``, which
  would break grad-of-grad re-tracing; see kernels._valid_mask).
* splat: each (cell, slab) pair owns a disjoint accumulator block, so
  slabs never race; query blocks accumulate into it exactly like v1.

Work does NOT multiply with slab count: the stage-1 contraction
(cells @ Rx) is row-partitioned across slabs, so total MXU MACs equal
unslabbed v1; only the per-slab R-matrix builds and reductions repeat.

Every query is still evaluated against every slab (queries are not
binned), so this route is for correctness + capability at any volume
size; the binned v4 generation (fused3b.py) remains the throughput path
for the fused ensemble op at scale.

Perf caveat (ADVICE r4): the in-kernel sublane-dim merges
((c,dz)->c*dz, (dz,h)->dz*h, (c,w)->c*w) are layout-free only when the
merged trailing factor is a multiple of 8 (CLAUDE.md Mosaic rules); dz
is always a multiple of 8 (_MIN_DZ), but arbitrary H/W force per-block
relayouts on real hardware.  Accepted for this correctness-first route —
volumes big enough to land here have H, W >= 128 in practice, and padding
them host-side would double the resident volume this route exists to
avoid holding.
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
from ..interpolants import corner_weights
from .kernels import _axis_onehot, _valid_mask

SLAB_Q_BLOCK = 128
_MIN_DZ = 8   # sublane tile: keeps the in-kernel (c*dz*…, w) reshapes
#               layout-free (CLAUDE.md Mosaic rules)


def _slab_onehot(coord_block, full_size, rows, origin, cfg: SamplerConfig,
                 order, offset, valid, q_block):
    """One-hot corner weights for the slab axis, slab-local rows.

    Identical math to kernels._axis_onehot except the row index is
    shifted by the slab origin: coordinates (and reflection/border folds,
    and the OOB mask) use ``full_size``; the iota compare uses the local
    ``rows``.  Corners outside [origin, origin+rows) match no row.
    """
    x, mult = compute_source_coords(
        coord_block, full_size, cfg.padding_mode, cfg.align_corners,
        cfg.multicell, offset, strict=cfg.strict_reference)
    fx = jnp.floor(x)
    t = x - fx
    w0, w1 = corner_weights(cfg.kernel, t, order, precise_trig=True)
    if order > 0:
        scale = mult**order
        w0 = w0 * scale
        w1 = w1 * scale
    w0 = jnp.where(valid, w0, 0.0)
    w1 = jnp.where(valid, w1, 0.0)
    oob = (fx < -1.5) | (fx > float(full_size) + 0.5)
    w0 = jnp.where(oob, 0.0, w0)
    w1 = jnp.where(oob, 0.0, w1)
    fxl = fx - origin
    fxi = jnp.clip(fxl, -2.0, float(rows) + 1.0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, q_block), 0)
    return (jnp.where(iota == fxi, w0, 0.0)
            + jnp.where(iota == fxi + 1, w1, 0.0))


def _pick_geom(c: int, spatial: Tuple[int, ...], budget: int,
               q_block: int = SLAB_Q_BLOCK) -> Optional[Tuple[int, int]]:
    """(dz, c_chunk) so every big kernel buffer fits budget/2.

    Prefers whole channels with the fattest slab (fewest slab iterations);
    splits channels only when even dz=8 overflows.  None: no geometry —
    the caller falls back to XLA.  Budgeted buffers: the cell/accumulator
    block (blend in / splat out), the blend stage-1 (C*dz*rest, Qb)
    intermediate, the splat's p = (C*W, Qb) panel and its 3D
    r_outer = (dz*rest, Qb) — the last two are dz-independent /
    channel-split-sensitive, so a wide last axis (e.g. 2D 4x1024x8192)
    now forces a channel split or returns None instead of committing to
    a geometry whose splat overflows Mosaic VMEM (ADVICE r4).
    """
    rows_rest = math.prod(spatial[1:-1]) if len(spatial) > 1 else 1
    w = spatial[-1]
    half = budget // 2

    def fits(dz, cc):
        cell = cc * dz * rows_rest * w * 4
        stage1 = cc * dz * rows_rest * q_block * 4
        splat_p = cc * w * q_block * 4
        r_outer = dz * rows_rest * q_block * 4
        return max(cell, stage1, splat_p, r_outer) <= half

    for cc in range(c, 0, -1):
        if not fits(_MIN_DZ, cc):
            continue
        dz = _MIN_DZ
        while dz * 2 <= spatial[0] and fits(dz * 2, cc):
            dz *= 2
        return min(dz, -(-spatial[0] // _MIN_DZ) * _MIN_DZ), cc
    return None


def supports(cfg: SamplerConfig, cells_shape, budget: int) -> bool:
    """True if the slab route can serve this volume (dims 2/3, f32/bf16
    handled by the dispatcher's f64 gate; any padding mode/orders)."""
    c = cells_shape[1]
    spatial = tuple(cells_shape[2:])
    return (cfg.dim in (2, 3) and spatial[0] >= _MIN_DZ
            and _pick_geom(c, spatial, budget) is not None)


# ---------------------------------------------------------------------------
# blend
# ---------------------------------------------------------------------------

def _blend_slab_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, org_ref,
                       off_ref, cells_ref, out_ref, *, cfg, orders, spatial,
                       full0, q_block, channels, dz):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    off = off_ref[0, 0, 0]
    org = org_ref[0, 0, 0]
    # grid coord i addresses input spatial axis dim-1-i (x->W, y->H, z->D);
    # the slab axis is spatial[0], i.e. coord index dim-1.
    refs = (x_ref, y_ref, z_ref)[:dim]
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim - 1))
    rs = [
        _axis_onehot(refs[i][0, 0], sizes[i], cfg, orders[i], off, valid,
                     q_block)
        for i in range(dim - 1)
    ]
    r_slab = _slab_onehot(refs[dim - 1][0, 0], full0, dz, org, cfg,
                          orders[dim - 1], off, valid, q_block)
    c = channels
    if dim == 2:
        w = spatial[-1]
        a = cells_ref[:].reshape(c * dz, w)
        t1 = jax.lax.dot_general(
            a, rs[0], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (C*dz, Q)
        t1 = t1.reshape(c, dz, q_block)
        out = jnp.sum(t1 * r_slab[None, :, :], axis=1)    # (C, Q)
    else:
        h, w = spatial[1], spatial[2]
        a = cells_ref[:].reshape(c * dz * h, w)
        t1 = jax.lax.dot_general(
            a, rs[0], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (C*dz*H, Q)
        t1 = t1.reshape(c * dz, h, q_block)
        t2 = jnp.sum(t1 * rs[1][None, :, :], axis=1)      # (C*dz, Q)
        t2 = t2.reshape(c, dz, q_block)
        out = jnp.sum(t2 * r_slab[None, :, :], axis=1)    # (C, Q)

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += out[None]


@functools.partial(jax.jit, static_argnames=("cfg", "orders", "q_block",
                                             "dz", "interpret"))
def _blend_chunk(input, grid, cfg: SamplerConfig, orders, q_block, dz,
                 interpret):
    """One channel-chunk of the slabbed blend (same contract as
    kernels.pallas_blend)."""
    dim = cfg.dim
    n, c = input.shape[:2]
    spatial = tuple(input.shape[2:])
    full0 = spatial[0]
    ns = -(-full0 // dz)
    d_pad = ns * dz
    out_spatial = tuple(grid.shape[1:-1])
    q = math.prod(out_spatial)
    qp = pl.cdiv(q, q_block) * q_block

    ng = grid.shape[0]
    gf = grid.reshape(ng, q, dim).astype(jnp.float32)
    gf = jnp.pad(gf, ((0, 0), (0, qp - q), (0, 0)))
    axes = [gf[:, :, i].reshape(ng, qp // q_block, 1, q_block)
            for i in range(dim)]
    while len(axes) < 3:
        axes.append(jnp.zeros((ng, qp // q_block, 1, q_block), jnp.float32))
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32).reshape(n, 1, 1)
    # zero-pad the slab axis to a slab multiple: padded rows only ever meet
    # the upper-edge corner floor+1 == full0, which v1 maps to "no row";
    # here it reads an explicit zero — identical contribution.
    vol = input.astype(jnp.float32)
    if d_pad != full0:
        pad = [(0, 0)] * vol.ndim
        pad[2] = (0, d_pad - full0)
        vol = jnp.pad(vol, pad)

    if ng == 1:
        coord_index = lambda ni, qi, si: (0, qi, 0, 0)
    else:
        coord_index = lambda ni, qi, si: (ni, qi, 0, 0)
    coord_spec = pl.BlockSpec((1, 1, 1, q_block), coord_index,
                              memory_space=pltpu.VMEM)
    valid = _valid_mask(q, qp, q_block)
    first = (jnp.arange(ns, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(ns, 1, 1)
    origins = (jnp.arange(ns, dtype=jnp.float32) * dz).reshape(ns, 1, 1)
    kernel = functools.partial(
        _blend_slab_kernel, cfg=cfg, orders=orders, spatial=spatial,
        full0=full0, q_block=q_block, channels=c, dz=dz)
    out = pl.pallas_call(
        kernel,
        grid=(n, qp // q_block, ns),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda ni, qi, si: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi, si: (si, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi, si: (si, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi, si: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, dz) + spatial[1:],
                         lambda ni, qi, si: (ni, 0, si) + (0,) * (dim - 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, q_block), lambda ni, qi, si: (ni, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, qp), jnp.float32),
        interpret=interpret,
    )(*axes, valid, first, origins, offsets, vol)
    out_dtype = jnp.promote_types(input.dtype, grid.dtype)
    return out[:, :, :q].reshape(n, c, *out_spatial).astype(out_dtype)


def pallas_blend_slab(input, grid, cfg: SamplerConfig,
                      orders: Tuple[int, ...], q_block: int = SLAB_Q_BLOCK,
                      budget: Optional[int] = None, interpret: bool = False):
    """Slabbed blend for over-VMEM volumes (same contract as generic.blend).

    Channel-chunks when even an 8-row slab of all channels overflows the
    VMEM budget; chunks are independent (blend is per-channel), so outputs
    concatenate."""
    from .prep import VMEM_BUDGET

    if effective_align(cfg, orders) != cfg.align_corners:
        cfg = dataclasses.replace(cfg, align_corners=True)
    c = input.shape[1]
    geom = _pick_geom(c, tuple(input.shape[2:]), budget or VMEM_BUDGET,
                      q_block)
    if geom is None:
        raise ValueError(f"no slab geometry for {input.shape}")
    dz, cc = geom
    if cc == c:
        return _blend_chunk(input, grid, cfg, orders, q_block, dz, interpret)
    outs = [_blend_chunk(input[:, lo:lo + cc], grid, cfg, orders, q_block,
                         dz, interpret)
            for lo in range(0, c, cc)]
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# splat
# ---------------------------------------------------------------------------

def _splat_slab_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, org_ref,
                       off_ref, g_ref, out_ref, *, cfg, orders, spatial,
                       full0, q_block, channels, dz):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    off = off_ref[0, 0, 0]
    org = org_ref[0, 0, 0]
    refs = (x_ref, y_ref, z_ref)[:dim]
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim - 1))
    rs = [
        _axis_onehot(refs[i][0, 0], sizes[i], cfg, orders[i], off, valid,
                     q_block)
        for i in range(dim - 1)
    ]
    r_slab = _slab_onehot(refs[dim - 1][0, 0], full0, dz, org, cfg,
                          orders[dim - 1], off, valid, q_block)
    c = channels
    g = g_ref[:].reshape(c, q_block)
    w = spatial[-1]
    p = (g[:, None, :] * rs[0][None, :, :]).reshape(c * w, q_block)
    if dim == 2:
        # (dz, Q) @ (Q, C*W) -> (dz, C*W); row = slab-local h, col = (c, x)
        contrib = jax.lax.dot_general(
            r_slab, p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        h = spatial[1]
        # R_outer[(z_local, y), q] = Rz_slab[z,q] * Ry[y,q]
        r_outer = (r_slab[:, None, :] * rs[1][None, :, :]).reshape(
            dz * h, q_block)
        contrib = jax.lax.dot_general(
            r_outer, p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib[None]


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "orders",
                                             "q_block", "dz", "interpret"))
def _splat_chunk(gout, grid, in_spatial, cfg: SamplerConfig, orders, q_block,
                 dz, interpret):
    dim = cfg.dim
    n, c = gout.shape[:2]
    full0 = in_spatial[0]
    ns = -(-full0 // dz)
    q = math.prod(gout.shape[2:])
    qp = pl.cdiv(q, q_block) * q_block

    ng = grid.shape[0]
    gf = grid.reshape(ng, q, dim).astype(jnp.float32)
    gf = jnp.pad(gf, ((0, 0), (0, qp - q), (0, 0)))
    axes = [gf[:, :, i].reshape(ng, qp // q_block, 1, q_block)
            for i in range(dim)]
    while len(axes) < 3:
        axes.append(jnp.zeros((ng, qp // q_block, 1, q_block), jnp.float32))
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32).reshape(n, 1, 1)
    gq = jnp.pad(gout.reshape(n, c, q).astype(jnp.float32),
                 ((0, 0), (0, 0), (0, qp - q)))

    if ng == 1:
        coord_index = lambda ni, si, qi: (0, qi, 0, 0)
    else:
        coord_index = lambda ni, si, qi: (ni, qi, 0, 0)
    coord_spec = pl.BlockSpec((1, 1, 1, q_block), coord_index,
                              memory_space=pltpu.VMEM)
    # accumulator: one disjoint (dz*rows_rest, C*W) block per (cell, slab) —
    # slabs never race; the slab axis is cropped from ns*dz to full0 after.
    w_sz = in_spatial[-1]
    rows_rest = math.prod(in_spatial[1:-1]) if dim == 3 else 1
    acc_rows = dz * rows_rest
    acc_shape = (n, ns * acc_rows, c * w_sz)
    valid = _valid_mask(q, qp, q_block)
    first = (jnp.arange(qp // q_block, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(qp // q_block, 1, 1)
    origins = (jnp.arange(ns, dtype=jnp.float32) * dz).reshape(ns, 1, 1)
    kernel = functools.partial(
        _splat_slab_kernel, cfg=cfg, orders=orders,
        spatial=tuple(in_spatial), full0=full0, q_block=q_block, channels=c,
        dz=dz)
    acc = pl.pallas_call(
        kernel,
        grid=(n, ns, qp // q_block),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda ni, si, qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, si, qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, si, qi: (si, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, si, qi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, q_block), lambda ni, si, qi: (ni, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, acc_rows, c * w_sz),
                               lambda ni, si, qi: (ni, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(acc_shape, jnp.float32),
        interpret=interpret,
    )(*axes, valid, first, origins, offsets, gq)
    if dim == 2:
        acc = acc.reshape(n, ns * dz, c, w_sz)[:, :full0]
        out = acc.transpose(0, 2, 1, 3)            # (N, C, H, W)
    else:
        acc = acc.reshape(n, ns * dz, rows_rest, c, w_sz)[:, :full0]
        out = acc.transpose(0, 3, 1, 2, 4)         # (N, C, D, H, W)
    return out.astype(jnp.promote_types(gout.dtype, grid.dtype))


def pallas_splat_slab(gout, grid, in_spatial: Tuple[int, ...],
                      cfg: SamplerConfig, orders: Tuple[int, ...],
                      q_block: int = SLAB_Q_BLOCK,
                      budget: Optional[int] = None, interpret: bool = False):
    """Slabbed splat (transpose of pallas_blend_slab; same contract as
    generic.splat).  NOTE: no strict-mode align hardcode here — the
    reference's backward kernels honor the real flag (kernels.pallas_splat
    has the same asymmetry)."""
    from .prep import VMEM_BUDGET

    c = gout.shape[1]
    geom = _pick_geom(c, tuple(in_spatial), budget or VMEM_BUDGET, q_block)
    if geom is None:
        raise ValueError(f"no slab geometry for {in_spatial}")
    dz, cc = geom
    if cc == c:
        return _splat_chunk(gout, grid, tuple(in_spatial), cfg, orders,
                            q_block, dz, interpret)
    outs = [_splat_chunk(gout[:, lo:lo + cc], grid, tuple(in_spatial), cfg,
                         orders, q_block, dz, interpret)
            for lo in range(0, c, cc)]
    return jnp.concatenate(outs, axis=1)
