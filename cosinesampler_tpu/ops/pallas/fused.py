"""Fused value+jacobian+diag-Hessian Pallas kernels (the PINN hot path).

One pass over the query stream produces every field the PDE residual needs
(value, first and pure-second derivatives, summed over the multicell
ensemble) — replacing the reference's four chained CUDA launches per
training step (fwd + bwd + bwd^2 traversals, SURVEY.md section 3.5) and
shrinking HBM traffic by the ensemble factor N (outputs are
(1+2*dim, C, Q) instead of (N, C, Q) per pass).

Structure per query block (see kernels.py for the one-hot formulation):

  fused_blend:  for each cell (fori_loop, cells resident in VMEM):
                build R_ax^(k) for k=0,1,2 with the m^k chain factors
                folded in; 3 MXU matmuls against the cell block; the 5 (2D)
                or 7 (3D) outputs are lane-wise contractions of those.

  fused_bwd:    the exact transpose: combine the per-term cotangents into
                per-(y[,z])-order P matrices and accumulate 3 (2D) / 5 (3D)
                MXU matmuls into the cell-gradient block — deterministic,
                atomic-free.

Both kernels are grad-of-grad safe (no pl.program_id; masks and first-block
flags arrive as indexed inputs).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SamplerConfig
from ..coords import compute_source_coords, multicell_offsets
from ..interpolants import corner_weights
from .kernels import _valid_mask

_HIGHEST = jax.lax.Precision.HIGHEST

FUSED_Q_BLOCK = {2: 2048, 3: 256}


def _axis_onehots(coord, size, cfg, off, valid, q_block):
    """R^(0), R^(1), R^(2) one-hot corner-weight matrices for one axis,
    with the chain factor mult^k folded into order k.

    Built as mask-weighted FMAs on shared hit masks (two compares total per
    axis), keeping the per-cell VPU work minimal.
    """
    x, mult = compute_source_coords(
        coord, size, cfg.padding_mode, cfg.align_corners, cfg.multicell, off,
        strict=cfg.strict_reference)
    fx = jnp.floor(x)
    t = x - fx
    fxi = jnp.clip(fx, -2.0, float(size) + 1.0).astype(jnp.int32)
    oob = (fx < -1.5) | (fx > float(size) + 0.5)
    gate = valid & ~oob
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, q_block), 0)
    hit0 = (iota == fxi).astype(jnp.float32)
    hit1 = (iota == fxi + 1).astype(jnp.float32)
    rs = []
    scale = None
    for k in range(3):
        w0, w1 = corner_weights(cfg.kernel, t, k, precise_trig=True)
        if k > 0:
            scale = mult if scale is None else scale * mult
            w0 = w0 * scale
            w1 = w1 * scale
        w0 = jnp.where(gate, w0, 0.0)
        w1 = jnp.where(gate, w1, 0.0)
        rs.append(hit0 * w0 + hit1 * w1)
    return rs


def _contract_y(t_flat, r_y, lead, h, q_block):
    return jnp.sum(t_flat.reshape(lead, h, q_block) * r_y[None, :, :], axis=1)


def _stacked_contract(parts, rys, lead, h, q_block):
    """sum_y T_i[(lead,y),q] * Ry_i[y,q] for a whole list in ONE
    multiply+reduce (fewer, larger VPU ops than per-row contractions)."""
    k = len(parts)
    ts = jnp.concatenate(parts, axis=0).reshape(k * lead, h, q_block)
    rr = jnp.concatenate(
        [jnp.broadcast_to(r[None], (lead, h, q_block)) for r in rys], axis=0)
    return jnp.sum(ts * rr, axis=1)


def _fused_blend_kernel(x_ref, y_ref, z_ref, valid_ref, off_ref, cells_ref,
                        out_ref, *, cfg, spatial, q_block, channels, n_cells):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    c = channels
    k_rows = 1 + 2 * dim
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim))

    def body(n, acc):
        off = off_ref[n, 0]
        rx = _axis_onehots(x_ref[0, 0], sizes[0], cfg, off, valid, q_block)
        ry = _axis_onehots(y_ref[0, 0], sizes[1], cfg, off, valid, q_block)
        # one wide MXU matmul for all three x-derivative orders
        rx_cat = jnp.concatenate(rx, axis=1)            # (W, 3*Q)
        if dim == 2:
            h, w = spatial
            a = cells_ref[n].reshape(c * h, w)
            t_cat = jax.lax.dot_general(
                a, rx_cat, (((1,), (0,)), ((), ())), precision=_HIGHEST,
                preferred_element_type=jnp.float32)      # (C*H, 3*Q)
            t0 = t_cat[:, :q_block]
            t1 = t_cat[:, q_block:2 * q_block]
            t2 = t_cat[:, 2 * q_block:]
            rows = _stacked_contract(
                [t0, t1, t0, t2, t0], [ry[0], ry[0], ry[1], ry[0], ry[2]],
                c, h, q_block)                           # (5*C, Q)
        else:
            rz = _axis_onehots(z_ref[0, 0], sizes[2], cfg, off, valid,
                               q_block)
            d, h, w = spatial
            a = cells_ref[n].reshape(c * d * h, w)
            t_cat = jax.lax.dot_general(
                a, rx_cat, (((1,), (0,)), ((), ())), precision=_HIGHEST,
                preferred_element_type=jnp.float32)      # (C*D*H, 3*Q)
            t0 = t_cat[:, :q_block]
            t1 = t_cat[:, q_block:2 * q_block]
            t2 = t_cat[:, 2 * q_block:]
            # y-stage per-row (a 5x stacked version would exceed VMEM at
            # C*D*H rows); z-stage stacked (rows are only C wide there)
            u00 = _contract_y(t0, ry[0], c * d, h, q_block)
            u10 = _contract_y(t1, ry[0], c * d, h, q_block)
            u20 = _contract_y(t2, ry[0], c * d, h, q_block)
            u01 = _contract_y(t0, ry[1], c * d, h, q_block)
            u02 = _contract_y(t0, ry[2], c * d, h, q_block)
            rows = _stacked_contract(
                [u00, u10, u01, u00, u20, u02, u00],
                [rz[0], rz[0], rz[0], rz[1], rz[0], rz[0], rz[2]],
                c, d, q_block)                           # (7*C, Q)
        return acc + rows

    acc0 = jnp.zeros((k_rows * c, q_block), jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, n_cells, body, acc0)


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused_blend(cells, points, cfg: SamplerConfig,
                       q_block: int = 0, interpret: bool = False):
    """(1+2*dim, C, Q) fused multicell-summed value/jac/diag-Hessian."""
    dim = cfg.dim
    n, c = cells.shape[:2]
    spatial = tuple(cells.shape[2:])
    q = points.shape[0]
    if q_block == 0:
        q_block = FUSED_Q_BLOCK[dim]
    qp = pl.cdiv(q, q_block) * q_block
    k_rows = 1 + 2 * dim

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(dim)]
    while len(axes) < 3:
        axes.append(jnp.zeros((qp // q_block, 1, q_block), jnp.float32))
    valid = _valid_mask(q, qp, q_block)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused_blend_kernel, cfg=cfg, spatial=spatial, q_block=q_block,
        channels=c, n_cells=n)
    out = pl.pallas_call(
        kernel,
        grid=(qp // q_block,),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, c, *spatial), lambda qi: (0,) * (dim + 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_rows * c, q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_rows * c, qp), jnp.float32),
        interpret=interpret,
    )(*axes, valid, offsets, cells.astype(jnp.float32))
    out_dtype = jnp.promote_types(cells.dtype, points.dtype)
    return out[:, :q].reshape(k_rows, c, q).astype(out_dtype)


def _fused_bwd_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, off_ref,
                      g_ref, out_ref, *, cfg, spatial, q_block, channels):
    dim = cfg.dim
    valid = valid_ref[0, 0] > 0.5
    off = off_ref[0, 0, 0]
    c = channels
    k_rows = 1 + 2 * dim
    sizes = tuple(spatial[dim - 1 - i] for i in range(dim))
    w = spatial[-1]

    rx = _axis_onehots(x_ref[0, 0], sizes[0], cfg, off, valid, q_block)
    ry = _axis_onehots(y_ref[0, 0], sizes[1], cfg, off, valid, q_block)
    g = g_ref[:].reshape(k_rows, c, q_block)

    def pmat(*terms):
        """P[(c,x), q] = sum_i g_i[c, :] * Rx_i[x, :]."""
        acc = None
        for gi, rxi in terms:
            part = gi[:, None, :] * rxi[None, :, :]
            acc = part if acc is None else acc + part
        return acc.reshape(c * w, q_block)

    def rmat(r_outer, p):
        return jax.lax.dot_general(
            r_outer, p, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)

    if dim == 2:
        # rows: [val, jx, jy, hxx, hyy]
        contrib = (rmat(ry[0], pmat((g[0], rx[0]), (g[1], rx[1]),
                                    (g[3], rx[2])))
                   + rmat(ry[1], pmat((g[2], rx[0])))
                   + rmat(ry[2], pmat((g[4], rx[0]))))
    else:
        rz = _axis_onehots(z_ref[0, 0], sizes[2], cfg, off, valid, q_block)
        d, h = spatial[0], spatial[1]

        def outer(rzk, ryk):
            return (rzk[:, None, :] * ryk[None, :, :]).reshape(d * h, q_block)

        # rows: [val, jx, jy, jz, hxx, hyy, hzz]
        contrib = (rmat(outer(rz[0], ry[0]),
                        pmat((g[0], rx[0]), (g[1], rx[1]), (g[4], rx[2])))
                   + rmat(outer(rz[0], ry[1]), pmat((g[2], rx[0])))
                   + rmat(outer(rz[0], ry[2]), pmat((g[5], rx[0])))
                   + rmat(outer(rz[1], ry[0]), pmat((g[3], rx[0])))
                   + rmat(outer(rz[2], ry[0]), pmat((g[6], rx[0]))))

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib[None]


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused_bwd(g, points, in_spatial: Tuple[int, ...],
                     cfg: SamplerConfig, n_cells: int, q_block: int = 0,
                     interpret: bool = False):
    """Cells-cotangent of pallas_fused_blend: (N, C, *in_spatial)."""
    dim = cfg.dim
    k_rows, c, q = g.shape
    if q_block == 0:
        q_block = FUSED_Q_BLOCK[dim]
    qp = pl.cdiv(q, q_block) * q_block

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(dim)]
    while len(axes) < 3:
        axes.append(jnp.zeros((qp // q_block, 1, q_block), jnp.float32))
    valid = _valid_mask(q, qp, q_block)
    first = (jnp.arange(qp // q_block, dtype=jnp.int32) == 0).astype(
        jnp.int32).reshape(qp // q_block, 1, 1)
    offsets = multicell_offsets(n_cells, cfg.multicell,
                                jnp.float32).reshape(n_cells, 1, 1)
    gq = jnp.pad(g.reshape(k_rows * c, q).astype(jnp.float32),
                 ((0, 0), (0, qp - q)))

    w_sz = in_spatial[-1]
    rows = math.prod(in_spatial[:-1])
    coord_spec = pl.BlockSpec((1, 1, q_block), lambda ni, qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused_bwd_kernel, cfg=cfg, spatial=tuple(in_spatial),
        q_block=q_block, channels=c)
    acc = pl.pallas_call(
        kernel,
        grid=(n_cells, qp // q_block),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda ni, qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda ni, qi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k_rows * c, q_block), lambda ni, qi: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, c * w_sz), lambda ni, qi: (ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, rows, c * w_sz),
                                       jnp.float32),
        interpret=interpret,
    )(*axes, valid, first, offsets, gq)
    if dim == 2:
        acc = acc.reshape(n_cells, in_spatial[0], c, w_sz)
        out = acc.transpose(0, 2, 1, 3)
    else:
        acc = acc.reshape(n_cells, in_spatial[0], in_spatial[1], c, w_sz)
        out = acc.transpose(0, 3, 1, 2, 4)
    return out.astype(jnp.promote_types(g.dtype, points.dtype))
