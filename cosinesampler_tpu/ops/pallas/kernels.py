"""Pallas TPU kernels for the blend/splat family.

TPU-first design (NOT a translation of the CUDA kernels):

* The CUDA reference gives each query point a thread that does 4/8 random
  global loads and atomic scatter-adds (cosine_sampler_2d_kernel.cu:297-354,
  467-473).  TPUs have neither per-lane random access nor atomics, so both
  gather and scatter are reformulated as *factorized one-hot contractions*:
  for each axis we build a sparse corner-weight matrix

      R_ax[i, q] = W_0(t_q) [i == floor(coord_q)] + W_1(t_q) [i == floor+1]

  with texels on sublanes and queries on lanes.  Then

      blend:  out[c,q]      = sum_y Ry[y,q] * (cells[(c,y),:] @ Rx)[.,q]
      splat:  g_in[(y|z..),(c,x)] = (R_outer @ (g x Rx)^T)        (MXU)

  One-hot rows are built with broadcasted_iota compares; out-of-bounds
  corners simply match no row, which reproduces the CUDA kernels'
  bounds-check-to-zero semantics (kernel.cu:342-353) for free.

* The scatter transpose becomes a dense matmul accumulated over query
  blocks — deterministic and atomic-free (the CUDA fastAtomicAdd races are
  designed out, SURVEY.md section 5).

* The whole cell block lives in VMEM; queries stream through the pallas
  grid.  Coordinate math (coords.py) and interpolant weights
  (interpolants.py) are shared with the XLA backend — one source of truth
  for semantics.

Derivative orders are static parameters: the same two kernels implement the
reference's forward, backward, double- and triple-backward weight tables
(8 CUDA kernels) at every order.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SamplerConfig, effective_align
from ..coords import compute_source_coords, multicell_offsets
from ..interpolants import corner_weights

DEFAULT_Q_BLOCK = 512


def _axis_onehot(coord_block, size, cfg: SamplerConfig, order, offset, valid,
                 q_block):
    """Build R_ax (size, q_block): one-hot corner weights for one grid axis.

    ``coord_block``: (1, q_block) normalized coords; ``offset``: per-cell
    scalar; ``valid``: (1, q_block) mask for query padding.
    """
    x, mult = compute_source_coords(
        coord_block, size, cfg.padding_mode, cfg.align_corners,
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
    # int compare: OOB corners match no row -> zero contribution, the CUDA
    # bounds-check-to-zero semantics for free.  fx is clipped into int32
    # range first (far-OOB queries produce large-but-finite floats).
    fxi = jnp.clip(fx, -2.0, float(size) + 1.0).astype(jnp.int32)
    oob = (fx < -1.5) | (fx > float(size) + 0.5)
    w0 = jnp.where(oob, 0.0, w0)
    w1 = jnp.where(oob, 0.0, w1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, q_block), 0)
    return (jnp.where(iota == fxi, w0, 0.0)
            + jnp.where(iota == fxi + 1, w1, 0.0))


def _valid_mask(q, qp, q_block):
    """(n_qblocks, 1, q_block) f32 mask for query padding.

    Passed as a kernel INPUT rather than derived from pl.program_id so the
    kernel body stays JVP-traceable: under grad-of-grad JAX linearizes the
    custom_vjp fwd jaxpr with the built-in pallas JVP rule, and program_id
    cannot be re-bound in that trace.
    """
    idx = jnp.arange(qp, dtype=jnp.int32)
    return (idx < q).astype(jnp.float32).reshape(qp // q_block, 1, q_block)


# ---------------------------------------------------------------------------
# blend
# ---------------------------------------------------------------------------

def _blend_kernel(x_ref, y_ref, z_ref, valid_ref, off_ref, cells_ref, out_ref,
                  *, cfg, orders, spatial, q_block, channels):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    off = off_ref[0, 0, 0]
    # grid coord i addresses input spatial axis dim-1-i (x->W, y->H, z->D)
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim))
    refs = (x_ref, y_ref, z_ref)[:dim]
    rs = [
        _axis_onehot(refs[i][0, 0], sizes[i], cfg, orders[i], off, valid,
                     q_block)
        for i in range(dim)
    ]
    c = channels
    if dim == 2:
        h, w = spatial
        a = cells_ref[:].reshape(c * h, w)
        t1 = jax.lax.dot_general(
            a, rs[0], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (C*H, Q)
        t1 = t1.reshape(c, h, q_block)
        out = jnp.sum(t1 * rs[1][None, :, :], axis=1)    # (C, Q)
    else:
        d, h, w = spatial
        a = cells_ref[:].reshape(c * d * h, w)
        t1 = jax.lax.dot_general(
            a, rs[0], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (C*D*H, Q)
        t1 = t1.reshape(c * d, h, q_block)
        t2 = jnp.sum(t1 * rs[1][None, :, :], axis=1)     # (C*D, Q)
        t2 = t2.reshape(c, d, q_block)
        out = jnp.sum(t2 * rs[2][None, :, :], axis=1)    # (C, Q)
    out_ref[:] = out[None]


@functools.partial(jax.jit, static_argnames=("cfg", "orders", "q_block",
                                             "interpret"))
def pallas_blend(input, grid, cfg: SamplerConfig, orders: Tuple[int, ...],
                 q_block: int = DEFAULT_Q_BLOCK, interpret: bool = False):
    """Pallas implementation of generic.blend (same contract)."""
    if effective_align(cfg, orders) != cfg.align_corners:
        # strict-mode 2D forward align hardcode (gather only; pallas_splat
        # keeps the real flag, matching the reference backward kernels)
        cfg = dataclasses.replace(cfg, align_corners=True)
    dim = cfg.dim
    n, c = input.shape[:2]
    spatial = tuple(input.shape[2:])
    out_spatial = tuple(grid.shape[1:-1])
    q = math.prod(out_spatial)
    qp = pl.cdiv(q, q_block) * q_block

    ng = grid.shape[0]            # 1 = queries shared across cells
    gf = grid.reshape(ng, q, dim).astype(jnp.float32)
    gf = jnp.pad(gf, ((0, 0), (0, qp - q), (0, 0)))
    # (Ng, n_qblocks, 1, q_block) so the trailing block dims match the
    # Mosaic (sublane, lane) divisibility rules.
    axes = [gf[:, :, i].reshape(ng, qp // q_block, 1, q_block)
            for i in range(dim)]
    while len(axes) < 3:
        axes.append(jnp.zeros((ng, qp // q_block, 1, q_block), jnp.float32))
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32).reshape(n, 1, 1)

    if ng == 1:
        coord_index = lambda ni, qi: (0, qi, 0, 0)
    else:
        coord_index = lambda ni, qi: (ni, qi, 0, 0)
    coord_spec = pl.BlockSpec((1, 1, 1, q_block), coord_index,
                              memory_space=pltpu.VMEM)
    valid = _valid_mask(q, qp, q_block)
    kernel = functools.partial(
        _blend_kernel, cfg=cfg, orders=orders, spatial=spatial,
        q_block=q_block, channels=c)
    out = pl.pallas_call(
        kernel,
        grid=(n, qp // q_block),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda ni, qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, *spatial), lambda ni, qi: (ni,) + (0,) * (dim + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, q_block), lambda ni, qi: (ni, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, qp), jnp.float32),
        interpret=interpret,
    )(*axes, valid, offsets, input.astype(jnp.float32))
    out_dtype = jnp.promote_types(input.dtype, grid.dtype)
    return out[:, :, :q].reshape(n, c, *out_spatial).astype(out_dtype)


# ---------------------------------------------------------------------------
# splat
# ---------------------------------------------------------------------------

def _splat_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, off_ref, g_ref,
                  out_ref, *, cfg, orders, spatial, q_block, channels):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    off = off_ref[0, 0, 0]
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim))
    refs = (x_ref, y_ref, z_ref)[:dim]
    rs = [
        _axis_onehot(refs[i][0, 0], sizes[i], cfg, orders[i], off, valid,
                     q_block)
        for i in range(dim)
    ]
    c = channels
    g = g_ref[:].reshape(c, q_block)
    # P[(c,x), q] = g[c,q] * Rx[x,q]
    w = spatial[-1]
    p = (g[:, None, :] * rs[0][None, :, :]).reshape(c * w, q_block)
    if dim == 2:
        # (H, Q) @ (Q, C*W) -> (H, C*W);  row = h, col = (c, x)
        contrib = jax.lax.dot_general(
            rs[1], p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        d, h = spatial[0], spatial[1]
        # R_outer[(z,y), q] = Rz[z,q] * Ry[y,q]
        r_outer = (rs[2][:, None, :] * rs[1][None, :, :]).reshape(
            d * h, q_block)
        contrib = jax.lax.dot_general(
            r_outer, p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    # accumulator stays ((z)y, c*x); splitting the lane dim into (c, x)
    # inside the kernel is an unsupported Mosaic relayout — done outside.

    # first_ref flags the first query block for this cell (zero-init of the
    # revisited accumulator block) without pl.program_id, see _valid_mask.
    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib[None]


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "orders",
                                             "q_block", "interpret"))
def pallas_splat(gout, grid, in_spatial: Tuple[int, ...], cfg: SamplerConfig,
                 orders: Tuple[int, ...], q_block: int = DEFAULT_Q_BLOCK,
                 interpret: bool = False):
    """Pallas implementation of generic.splat (same contract).

    Accumulates the scatter as dense per-block matmuls over the pallas grid
    (n outer, query blocks inner) — the deterministic TPU replacement for
    the reference's fastAtomicAdd loops (kernel.cu:467-473).
    """
    dim = cfg.dim
    n, c = gout.shape[:2]
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
        coord_index = lambda ni, qi: (0, qi, 0, 0)
    else:
        coord_index = lambda ni, qi: (ni, qi, 0, 0)
    coord_spec = pl.BlockSpec((1, 1, 1, q_block), coord_index,
                              memory_space=pltpu.VMEM)
    # accumulator layout: 2D (N, H, C*W); 3D (N, D*H, C*W) — the lane dim
    # is split into (C, W) outside the kernel (Mosaic cannot relayout it).
    w_sz = in_spatial[-1]
    rows = math.prod(in_spatial[:-1])
    acc_shape = (n, rows, c * w_sz)
    acc_block = (1, rows, c * w_sz)
    acc_index = lambda ni, qi: (ni, 0, 0)

    valid = _valid_mask(q, qp, q_block)
    first = (jnp.arange(qp // q_block, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(qp // q_block, 1, 1)
    kernel = functools.partial(
        _splat_kernel, cfg=cfg, orders=orders, spatial=tuple(in_spatial),
        q_block=q_block, channels=c)
    acc = pl.pallas_call(
        kernel,
        grid=(n, qp // q_block),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda ni, qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, q_block), lambda ni, qi: (ni, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(acc_block, acc_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(acc_shape, jnp.float32),
        interpret=interpret,
    )(*axes, valid, first, offsets, gq)
    if dim == 2:
        acc = acc.reshape(n, in_spatial[0], c, w_sz)
        out = acc.transpose(0, 2, 1, 3)            # (N, C, H, W)
    else:
        acc = acc.reshape(n, in_spatial[0], in_spatial[1], c, w_sz)
        out = acc.transpose(0, 3, 1, 2, 4)         # (N, C, D, H, W)
    return out.astype(jnp.promote_types(gout.dtype, grid.dtype))
