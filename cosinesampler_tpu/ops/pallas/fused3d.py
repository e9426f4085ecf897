"""v2 fused 3D kernels: shared-support gather over the joint 3x3x3 patch.

Same structural insight as fused2d.py: multicell offsets live in [0, 1)
(modules_3d.py:23-26), so all N cells' trilinear corners for one query fall
in a single shared 3x3x3 texel patch anchored at floor(base) per axis.
The gather becomes 27 one-hot matmuls against the whole flattened volume

    V_kji[(c,n), q] = cells[(c,n), :] @ A_kji[:, q]     (M=C*N, K=D*H*W)

shared by the ensemble: K is large (4096 for 16^3) so the MXU runs at full
depth, and the 27x one-hot redundancy is paid at full utilization instead
of the v1 kernels' K=16 per-cell contractions at ~6% utilization.

Scope: dim=3, padding_mode='zeros', shared query points, cells + one A
panel resident in VMEM (16^3-ish volumes; larger fall back to XLA).
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

V3_Q_BLOCK = 256

# output rows (kx, ky, kz): value, jac_x, jac_y, jac_z, hess_xx/yy/zz
_ROWS_3D = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
            (2, 0, 0), (0, 2, 0), (0, 0, 2))

# (kx, ky) pairs the 7 output rows project onto; _ROWS_3D[r] -> (pair, kz).
# The factored blend (fused3w/fused3b) computes the 5 shared pair products
# once and groups rows by z-order, cutting the per-panel VPU-wide op count
# ~3x vs per-row coefficient FMAs.
_XY_PAIRS = ((0, 0), (1, 0), (0, 1), (2, 0), (0, 2))
_ROW_FACTORS = tuple(
    (_XY_PAIRS.index((kx, ky)), kz) for (kx, ky, kz) in _ROWS_3D)


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int) -> bool:
    if cfg.dim != 3 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    n, c, d, h, w = cells_shape
    vol = d * h * w
    if (_npad(n) * c * vol * 4 > vmem_budget   # resident cell stack
            or vol * V3_Q_BLOCK * 4 > vmem_budget):  # one A panel
        return False
    return True


def _axis_prep(coord, size, cfg, off_col, q_block):
    """Shared base one-hots + per-cell shifted weights for one axis.

    Same derivation as fused2d._axis_prep; zeros/border coordinate
    transform centralized in prep.py.
    """
    base, ixn, scale = axis_transform(coord, size, cfg, off_col)
    fb = jnp.floor(base)
    fbi = jnp.clip(fb, -3.0, float(size) + 2.0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, q_block), 0)
    lo = shift_lo(cfg)
    hits = [(iota == fbi + j).astype(jnp.float32)
            for j in range(lo, lo + n_shifts(cfg))]
    return hits, cell_weights(base, ixn, scale, cfg)


def _fused3_blend_kernel(x_ref, y_ref, z_ref, valid_ref, off_ref, cells_ref,
                         out_ref, *, cfg, spatial, q_block, channels,
                         n_cells):
    d, h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
    off_col = off_ref[:, 0:1]

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)
    hz, wz = _axis_prep(z_ref[0], d, cfg, off_col, q_block)

    # Exact bf16 split of the resident volume, computed once and contracted
    # against all 27 one-hot panels (see mxu.py).
    cells_terms = mxu.data_terms(cells_ref[:], mxu.passes_for(cfg))  # (C*N, DHW)
    rows_acc = [jnp.zeros((c, q_block), jnp.float32) for _ in _ROWS_3D]
    for k in range(len(hz)):
        for j in range(len(hy)):
            zy = (hz[k][:, None, :] * hy[j][None, :, :]).reshape(
                d * h, q_block)
            for i in range(len(hx)):
                a = (zy[:, None, :] * hx[i][None, :, :]).reshape(
                    d * h * w, q_block)
                v = mxu.onehot_dot_terms(
                    cells_terms, a, (((1,), (0,)), ((), ())))  # (C*N, Qb)
                v = v.reshape(c, n, q_block)
                for r, (kx, ky, kz) in enumerate(_ROWS_3D):
                    coeff = wz[kz][k] * wy[ky][j] * wx[kx][i]   # (N, Qb)
                    rows_acc[r] = rows_acc[r] + jnp.sum(
                        coeff[None, :, :] * v, axis=1)
    out = jnp.concatenate(rows_acc, axis=0) * valid        # (7*C, Qb)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("cfg", "q_block", "interpret"))
def pallas_fused3_blend(cells, points, cfg: SamplerConfig,
                        q_block: int = V3_Q_BLOCK, interpret: bool = False):
    """(7, C, Q) fused multicell value/jac/diag-Hessian (v2, 3D/zeros)."""
    n, c, d, h, w = cells.shape
    q = points.shape[0]
    npad = _npad(n)   # sublane-aligned ensemble: (C*N, Qb) reshapes free
    qp = pl.cdiv(q, q_block) * q_block

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(3)]
    valid = _valid_mask(q, qp, q_block)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 4)
    cells_flat = mxu.data_cast(cells_p, cfg).transpose(
        1, 0, 2, 3, 4).reshape(c * npad, d * h * w)

    coord_spec = pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused3_blend_kernel, cfg=cfg, spatial=(d, h, w), q_block=q_block,
        channels=c, n_cells=npad)
    out = pl.pallas_call(
        kernel,
        grid=(qp // q_block,),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c * npad, d * h * w), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7 * c, q_block), lambda qi: (0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7 * c, qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, valid, offsets, cells_flat)
    return out[:, :q].reshape(7, c, q).astype(
        jnp.promote_types(cells.dtype, points.dtype))


def _fused3_bwd_kernel(x_ref, y_ref, z_ref, valid_ref, first_ref, off_ref,
                       g_ref, out_ref, *, cfg, spatial, q_block, channels,
                       n_cells):
    d, h, w = spatial
    c = channels
    n = n_cells
    valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
    off_col = off_ref[:, 0:1]

    hx, wx = _axis_prep(x_ref[0], w, cfg, off_col, q_block)
    hy, wy = _axis_prep(y_ref[0], h, cfg, off_col, q_block)
    hz, wz = _axis_prep(z_ref[0], d, cfg, off_col, q_block)

    g = g_ref[:].reshape(7, c, q_block)
    gv = [g[r] * valid for r in range(7)]

    @pl.when(first_ref[0, 0, 0] > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contrib = jnp.zeros((c * n, d * h * w), jnp.float32)
    for k in range(len(hz)):
        for j in range(len(hy)):
            zy = (hz[k][:, None, :] * hy[j][None, :, :]).reshape(
                d * h, q_block)
            for i in range(len(hx)):
                a = (zy[:, None, :] * hx[i][None, :, :]).reshape(
                    d * h * w, q_block)
                p = jnp.zeros((c, n, q_block), jnp.float32)
                for r, (kx, ky, kz) in enumerate(_ROWS_3D):
                    coeff = wz[kz][k] * wy[ky][j] * wx[kx][i]
                    p = p + coeff[None, :, :] * gv[r][:, None, :]
                contrib = contrib + mxu.onehot_dot(
                    p.reshape(c * n, q_block), a,
                    (((1,), (1,)), ((), ())),
                passes=mxu.passes_for(cfg))              # (C*N, D*H*W)
    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("in_spatial", "cfg", "n_cells",
                                             "q_block", "interpret"))
def pallas_fused3_bwd(g, points, in_spatial: Tuple[int, ...],
                      cfg: SamplerConfig, n_cells: int,
                      q_block: int = V3_Q_BLOCK, interpret: bool = False):
    """Cells-cotangent of pallas_fused3_blend: (N, C, D, H, W)."""
    d, h, w = in_spatial
    k_rows, c, q = g.shape
    n = n_cells
    npad = _npad(n)
    qp = pl.cdiv(q, q_block) * q_block

    pts = jnp.pad(points.astype(jnp.float32), ((0, qp - q), (0, 0)))
    axes = [pts[:, i].reshape(qp // q_block, 1, q_block) for i in range(3)]
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
        _fused3_bwd_kernel, cfg=cfg, spatial=(d, h, w), q_block=q_block,
        channels=c, n_cells=npad)
    acc = pl.pallas_call(
        kernel,
        grid=(qp // q_block,),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows * c, q_block), lambda qi: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c * npad, d * h * w), lambda qi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c * npad, d * h * w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*axes, valid, first, offsets, gq)
    return acc.reshape(c, npad, d, h, w)[:, :n].transpose(
        1, 0, 2, 3, 4).astype(jnp.promote_types(g.dtype, points.dtype))
