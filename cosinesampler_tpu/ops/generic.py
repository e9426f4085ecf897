"""Generic (pure-XLA) backend for the blend/splat operator family.

The whole CosineSampler derivative zoo — forward, backward, double- and
triple-backward kernels (8 CUDA kernels across cosine_sampler_2d_kernel.cu
and cosine_sampler_3d_kernel.cu) — collapses into TWO parametrized ops:

* ``blend(input, grid, orders)``  — gather-and-weigh: for derivative orders
  ``o = (o_x, o_y[, o_z])`` per grid axis this computes (a.e., treating the
  corner lattice and border-fold multipliers as locally constant)

      d^{|o|} sample(input, grid) / dgx^{o_x} dgy^{o_y} [dgz^{o_z}]

  ``orders == (0,...,0)`` is the reference's forward kernel
  (kernel.cu:265-356); higher orders are exactly the weight tables its
  backward kernels build inline (e.g. out_derivatives, kernel.cu:630-643).

* ``splat(gout, grid, orders)``   — the linear transpose of ``blend`` with
  respect to ``input``: scatter-add of the same corner weights.  This is
  what the reference implements with fastAtomicAdd scatter loops
  (kernel.cu:467-473, 699-709, 878-885).  TPU has no atomics; XLA lowers
  the batched ``.at[].add`` to a deterministic sort-based scatter here, and
  the Pallas backend replaces it with a one-hot matmul partial-sum.

The family is closed under differentiation:

    d blend_o / d input        -> transposes to splat_o
    d blend_o / d grid[..,ax]  -> blend_{o + e_ax}
    d splat_o / d gout         -> transposes to blend_o
    d splat_o / d grid[..,ax]  -> splat-with-gout-weighted blend, see sampler.py

which is what lets sampler.py define exact arbitrary-order autodiff with a
single pair of mutually recursive custom_vjp rules instead of the
reference's three stacked, truncated torch.autograd.Function classes.

This module is also the *oracle*: with ``orders == 0`` it is a direct jnp
program whose JAX derivatives (to any order) define ground truth, playing
the role of the reference's pure-torch test/grid_sampler.py gold model —
but with the CUDA kernels' exact zero-padding semantics (out-of-bounds
corners dropped, kernel.cu:342-353) rather than the gold model's clamp.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import SamplerConfig, effective_align
from .coords import compute_source_coords, multicell_offsets
from .interpolants import corner_weights


def _per_axis_tables(grid_flat, spatial, cfg: SamplerConfig, orders,
                     n_cells=None, fwd_quirk=False):
    """Per-grid-axis (corner index base, corner weights, axis size).

    ``grid_flat`` is (N, Q, d) — or (1, Q, d) for a query cloud shared by
    all cells (broadcast against the per-cell offsets).  Grid coordinate
    axis ``i`` addresses input spatial axis ``d-1-i`` (x -> W, y -> H,
    z -> D), the torch.grid_sample convention used by the reference kernels
    (kernel.cu:304-308, cosine_sampler_3d_kernel.cu:296-301).
    """
    d = cfg.dim
    n = n_cells if n_cells is not None else grid_flat.shape[0]
    offset = multicell_offsets(n, cfg.multicell, grid_flat.dtype)[:, None]
    # The strict-mode 2D forward align hardcode applies to the order-0
    # GATHER only: the reference backward kernel's grad_input scatter
    # honors the real flag (the upstream fwd/bwd inconsistency).
    align = effective_align(cfg, orders) if fwd_quirk else cfg.align_corners
    tables = []
    for i in range(d):
        size = spatial[d - 1 - i]
        x, mult = compute_source_coords(
            grid_flat[..., i], size, cfg.padding_mode, align,
            cfg.multicell, offset, strict=cfg.strict_reference,
        )
        fx = jnp.floor(x)
        t = x - jax.lax.stop_gradient(fx)
        w0, w1 = corner_weights(cfg.kernel, t, orders[i])
        if orders[i] > 0:
            scale = mult ** orders[i]
            w0 = w0 * scale
            w1 = w1 * scale
        tables.append((jax.lax.stop_gradient(fx).astype(jnp.int32), (w0, w1), size))
    return tables


def _corner_index_weight(tables, corner, spatial, d):
    """Flat input index, blended weight and in-bounds mask for one corner."""
    idx = None
    wgt = None
    ok = None
    for i, p in enumerate(corner):
        fx, (w0, w1), size = tables[i]
        ci = fx + p
        axis = d - 1 - i
        stride = math.prod(spatial[axis + 1:]) if axis + 1 < d else 1
        term = ci * stride
        good = (ci >= 0) & (ci < size)
        w = w1 if p else w0
        idx = term if idx is None else idx + term
        wgt = w if wgt is None else wgt * w
        ok = good if ok is None else ok & good
    return idx, wgt, ok


def blend(input, grid, cfg: SamplerConfig, orders: Tuple[int, ...]):
    """Gather-and-weigh; see module docstring.  Output (N, C, *out_spatial)."""
    d = cfg.dim
    n, c = input.shape[:2]
    spatial = tuple(input.shape[2:])
    out_spatial = tuple(grid.shape[1:-1])
    q = math.prod(out_spatial)
    gf = grid.reshape(grid.shape[0], q, d)
    tables = _per_axis_tables(gf, spatial, cfg, orders, n_cells=n,
                              fwd_quirk=True)
    inp = input.reshape(n, c, -1)
    total = math.prod(spatial)
    out = jnp.zeros((n, c, q), dtype=input.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        idx, wgt, ok = _corner_index_weight(tables, corner, spatial, d)
        safe = jnp.clip(idx, 0, total - 1)
        vals = jnp.take_along_axis(inp, safe[:, None, :].astype(jnp.int32), axis=2)
        contrib = jnp.where(ok[:, None, :], wgt[:, None, :] * vals, 0.0)
        out = out + contrib
    return out.reshape(n, c, *out_spatial)


def splat(gout, grid, in_spatial: Tuple[int, ...], cfg: SamplerConfig,
          orders: Tuple[int, ...]):
    """Linear transpose of ``blend`` w.r.t. ``input``; output (N, C, *in_spatial)."""
    d = cfg.dim
    n, c = gout.shape[:2]
    q = math.prod(gout.shape[2:])
    gf = grid.reshape(grid.shape[0], q, d)
    gq = gout.reshape(n, c, q)
    tables = _per_axis_tables(gf, tuple(in_spatial), cfg, orders, n_cells=n)
    total = math.prod(in_spatial)

    corner_idx = []
    corner_con = []
    for corner in itertools.product((0, 1), repeat=d):
        idx, wgt, ok = _corner_index_weight(tables, corner, tuple(in_spatial), d)
        safe = jnp.clip(idx, 0, total - 1)
        contrib = jnp.where(ok[:, None, :], wgt[:, None, :] * gq, 0.0)
        corner_idx.append(safe.astype(jnp.int32))
        corner_con.append(contrib)
    all_idx = jnp.concatenate(corner_idx, axis=-1)        # (N, 2^d * Q)
    all_con = jnp.concatenate(corner_con, axis=-1)        # (N, C, 2^d * Q)

    def per_cell(idx_row, con_row):
        zero = jnp.zeros((c, total), dtype=gout.dtype)
        return zero.at[:, idx_row].add(con_row)

    acc = jax.vmap(per_cell)(all_idx, all_con)
    return acc.reshape(n, c, *in_spatial)


def blend_grid_grad_weight(input, grid, gout, cfg: SamplerConfig,
                           orders: Tuple[int, ...], axis: int):
    """sum_c gout * blend_{orders+e_axis}(input, grid): one grid-cotangent lane.

    This is the per-query gather the reference's backward kernel accumulates
    as gix/giy (kernel.cu:476-503).
    """
    bumped = tuple(o + (1 if i == axis else 0) for i, o in enumerate(orders))
    return (gout * blend(input, grid, cfg, bumped)).sum(axis=1)
