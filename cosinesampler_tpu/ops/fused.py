"""Fused multicell sampling with first + second derivatives.

The PINN residual loop (the workload CosineSampler exists for,
README.md:37-41) needs, at every collocation point, the cell-ensemble
feature value AND its first and pure-second spatial derivatives:
u, u_x, u_y[, u_z], u_xx, u_yy[, u_zz] (test/test_2d.py:63-95,221).  The
reference computes these with four separate CUDA kernel launches chained
through stacked autograd Functions (SURVEY.md section 3.5); here they come
out of ONE fused pass:

    sample_features_with_derivs(cells, points, cfg)
        -> (1 + 2*dim, C, Q):  [value, jac_x.., hess_xx..]

summed over the multicell ensemble (the consumer's ``val.sum(0)``,
test_2d.py:51, fused in), so the kernel writes (1+2d) x C x Q floats
instead of the reference's N x C x Q forward alone — ~14x less HBM traffic
at N=96 — and the derivative fields are explicit outputs rather than
autodiff re-traversals.

Gradient flow to the cells is ONE fused transpose pass (custom_vjp below);
derivatives w.r.t. the points are exact via the blend family.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0

from . import generic
from .config import SamplerConfig
from .sampler import _BACKEND_IMPLS, differentiable_blend

def _all_orders(dim: int):
    """Output row order: value, jac_x.., hess_xx.. (1 + 2*dim rows)."""
    value = (0,) * dim
    jac = [tuple(1 if i == ax else 0 for i in range(dim)) for ax in range(dim)]
    hess = [tuple(2 if i == ax else 0 for i in range(dim)) for ax in range(dim)]
    return [value] + jac + hess


def _points_to_grid(points, n):
    q, dim = points.shape
    lead = (1,) * (dim - 1)
    return jnp.broadcast_to(
        points.reshape((1,) * dim + (q, dim)), (n, *lead, q, dim))


def xla_fused_blend(cells, points, cfg: SamplerConfig):
    """Reference implementation: one generic.blend per term, summed over cells."""
    n, c = cells.shape[:2]
    q = points.shape[0]
    grid = _points_to_grid(points, n)
    outs = [
        generic.blend(cells, grid, cfg, o).reshape(n, c, q).sum(axis=0)
        for o in _all_orders(cfg.dim)
    ]
    return jnp.stack(outs, axis=0)              # (1+2d, C, Q)


BWD_CHUNK = 1 << 18  # queries per scatter chunk in the XLA fallback


def xla_fused_bwd(g, points, in_spatial, cfg: SamplerConfig, n_cells: int):
    """Cells-cotangent: one generic.splat per term (cell-broadcast g).

    Large query clouds are processed in chunks (scan-accumulated): the
    unchunked scatter graph at the 128^3 x 1M-point sweep overflows HBM by
    materializing every corner contribution at once.
    """
    c, q = g.shape[1:]
    if q > BWD_CHUNK:
        n_chunks = -(-q // BWD_CHUNK)
        qp = n_chunks * BWD_CHUNK
        gp = jnp.pad(g, ((0, 0), (0, 0), (0, qp - q)))
        pp = jnp.pad(points, ((0, qp - q), (0, 0)),
                     constant_values=-3.0)  # OOB pad: contributes zero
        gp = gp.reshape(1 + 2 * cfg.dim, c, n_chunks, BWD_CHUNK)
        pp = pp.reshape(n_chunks, BWD_CHUNK, cfg.dim)

        def body(acc, idx):
            part = xla_fused_bwd(gp[:, :, idx], pp[idx], in_spatial, cfg,
                                 n_cells)
            return acc + part, ()

        zero = jnp.zeros((n_cells, c, *in_spatial), g.dtype)
        acc, _ = jax.lax.scan(body, zero, jnp.arange(n_chunks))
        return acc

    grid = _points_to_grid(points, n_cells)
    total = None
    for row, o in enumerate(_all_orders(cfg.dim)):
        gb = jnp.broadcast_to(g[row][None], (n_cells, c, q))
        gb = gb.reshape(n_cells, c, *grid.shape[1:-1])
        part = generic.splat(gb, grid, in_spatial, cfg, o)
        total = part if total is None else total + part
    return total


def _resolve_fused(cfg: SamplerConfig, op: str):
    backend = cfg.backend
    if backend == "xla":
        return None
    impls = _BACKEND_IMPLS.get(("pallas", cfg.dim), {})
    if backend == "auto" and jax.default_backend() != "tpu":
        return None
    return impls.get(op)


def _points_cotangent(cells, points, g_q, cfg: SamplerConfig, n_cells: int):
    """Exact points cotangent via order-bumped blends (DCE'd when the
    caller does not differentiate w.r.t. the points).

    ``g_q``: query-ordered (1+2d, C, Q) cotangent of the fused output."""
    grid = _points_to_grid(points, n_cells)
    q = points.shape[0]
    lanes = []
    for ax in range(cfg.dim):
        acc = 0.0
        for row, o in enumerate(_all_orders(cfg.dim)):
            bumped = tuple(v + (1 if i == ax else 0)
                           for i, v in enumerate(o))
            blend_b = differentiable_blend(cfg, bumped)
            term = blend_b(cells, grid).reshape(n_cells, -1, q).sum(0)
            acc = acc + (g_q[row] * term).sum(axis=0)     # sum channels
        lanes.append(acc)
    return jnp.stack(lanes, axis=-1).astype(points.dtype)


_FUSED_CACHE = {}


def make_fused(cfg: SamplerConfig, n_cells: int, in_spatial: Tuple[int, ...]):
    """custom_vjp-wrapped fused op for one (config, N, spatial)."""
    key = (cfg, n_cells, in_spatial)
    cached = _FUSED_CACHE.get(key)
    if cached is not None:
        return cached

    def impl(cells, points):
        fused_fn = _resolve_fused(cfg, "fused_blend")
        if fused_fn is not None:
            out = fused_fn(cells, points, cfg)   # None: exceeds VMEM budget
            if out is not None:
                return out
        return xla_fused_blend(cells, points, cfg)

    def bwd_impl(g, points):
        fused_fn = _resolve_fused(cfg, "fused_bwd")
        if fused_fn is not None:
            out = fused_fn(g, points, in_spatial, cfg, n_cells)
            if out is not None:
                return out
        return xla_fused_bwd(g, points, in_spatial, cfg, n_cells)

    @jax.custom_vjp
    def fused_o(cells, points):
        return impl(cells, points)

    def fused_fwd(cells, points):
        return fused_o(cells, points), (cells, points)

    def fused_bwd(res, g):
        cells, points = res
        # the kernels accumulate in f32; the cotangent must match the
        # primal dtype (bf16 cells -> bf16 cotangent)
        cells_bar = bwd_impl(g, points).astype(cells.dtype)
        points_bar = _points_cotangent(cells, points, g, cfg, n_cells)
        return cells_bar, points_bar

    fused_o.defvjp(fused_fwd, fused_bwd)
    _FUSED_CACHE[key] = fused_o
    return fused_o


_FUSED_PADDED_CACHE = {}


def make_fused_padded(cfg: SamplerConfig, n_cells: int,
                      in_spatial: Tuple[int, ...]):
    """Slot-resident fused op: (cells, points) -> (out_p, occ, positions).

    ``out_p`` is (1+2d, C, QP) in the kernel's bin-slot layout with
    ``out_p[:, :, positions]`` equal to sample_features_with_derivs and
    zeros in padding slots (flagged by ``occ``).  A consumer that computes
    its loss directly in slot space (masking by ``occ``) skips the
    per-step output gather AND the cotangent scatter of the query-ordered
    API — the two large random-access passes (models/pinn.py
    slot_resident).  When no slot-resident kernel applies the plan is the
    identity (QP == Q, positions == arange), so the API is always valid.
    """
    key = (cfg, n_cells, in_spatial)
    cached = _FUSED_PADDED_CACHE.get(key)
    if cached is not None:
        return cached

    def impl(cells, points):
        fused_fn = _resolve_fused(cfg, "fused_blend")
        if fused_fn is not None:
            out = fused_fn(cells, points, cfg)
            if out is not None:
                return out
        return xla_fused_blend(cells, points, cfg)

    def impl_padded(cells, points):
        fn = _resolve_fused(cfg, "fused_padded")
        if fn is not None:
            out = fn(cells, points, cfg)
            if out is not None:
                return out
        out = impl(cells, points)
        q = points.shape[0]
        return (out, jnp.ones((q,), jnp.float32),
                jnp.arange(q, dtype=jnp.int32))

    def bwd_impl_padded(g_p, points):
        fn = _resolve_fused(cfg, "fused_padded_bwd")
        if fn is not None:
            out = fn(g_p, points, in_spatial, cfg, n_cells)
            if out is not None:
                return out
        # identity plan: g_p is already query-ordered (QP == Q)
        fused_fn = _resolve_fused(cfg, "fused_bwd")
        if fused_fn is not None:
            out = fused_fn(g_p, points, in_spatial, cfg, n_cells)
            if out is not None:
                return out
        return xla_fused_bwd(g_p, points, in_spatial, cfg, n_cells)

    @jax.custom_vjp
    def fused_p(cells, points):
        return impl_padded(cells, points)

    def fused_fwd(cells, points):
        out = fused_p(cells, points)
        return out, (cells, points, out[2])

    def fused_bwd(res, gs):
        cells, points, positions = res
        g_p = gs[0]          # occ / positions cotangents: piecewise-const
        cells_bar = bwd_impl_padded(g_p, points).astype(cells.dtype)
        # points cotangent: gather the cotangent back to query order first
        q = points.shape[0]
        c = g_p.shape[1]
        g_q = g_p.reshape(-1, g_p.shape[-1])[:, positions].reshape(
            1 + 2 * cfg.dim, c, q)
        points_bar = _points_cotangent(cells, points, g_q, cfg, n_cells)
        return cells_bar, points_bar

    fused_p.defvjp(fused_fwd, fused_bwd)
    _FUSED_PADDED_CACHE[key] = fused_p
    return fused_p


def _zero_cotangent(x):
    """Zero cotangent for a plan leaf: float0 for integer arrays (the JAX
    tangent type for non-inexact primals), plain zeros otherwise."""
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, float0)


_FUSED_PLANNED_CACHE = {}


def make_fused_planned(cfg: SamplerConfig, n_cells: int,
                       in_spatial: Tuple[int, ...]):
    """Slot-resident fused op taking a precomputed bin plan:
    (cells, points, plan) -> (out_p, occ, positions).

    Semantically identical to make_fused_padded given
    ``plan = make_sample_plan(points, cells.shape, cfg)``, but the binning
    (a 1M-key sort + slot scatters, ~12 ms standalone at the 128^3 sweep
    after the bin-boundary-scatter optimization, BENCHMARKS.md) is hoisted
    out of the step.  The reference's own PINN workloads sample their
    collocation points once per run (test_2d.py:23-26, test_3d.py:16-19),
    so training loops over fixed points amortize the plan to zero.
    Measured wins (scripts/time_plan*.py): under a jitted ``lax.scan`` XLA
    already hoists the point-invariant binning out of the loop body, so
    the step saves only the residual slot work (96.0 -> 90.1 ms at the 1M
    sweep); the full binning cost returns for step-per-dispatch trainers,
    where every call re-pays it.
    """
    key = (cfg, n_cells, in_spatial)
    cached = _FUSED_PLANNED_CACHE.get(key)
    if cached is not None:
        return cached

    def impl(cells, points):
        fused_fn = _resolve_fused(cfg, "fused_blend")
        if fused_fn is not None:
            out = fused_fn(cells, points, cfg)
            if out is not None:
                return out
        return xla_fused_blend(cells, points, cfg)

    def impl_planned(cells, points, plan):
        fn = _resolve_fused(cfg, "fused_padded")
        if fn is not None:
            out = fn(cells, points, cfg, plan=plan)
            if out is not None:
                return out
        # no padded kernel for these VALUES (e.g. f64 cells): keep the
        # plan's slot layout by scattering the query-ordered result
        positions, occ = plan[0], plan[1]
        qp = occ.shape[0]
        out = impl(cells, points)
        rows, c, q = out.shape
        out_p = jnp.zeros((rows * c, qp), out.dtype).at[:, positions].set(
            out.reshape(rows * c, q))
        return out_p.reshape(rows, c, qp), occ, positions

    def bwd_impl_planned(g_p, points, plan):
        fn = _resolve_fused(cfg, "fused_padded_bwd")
        if fn is not None:
            out = fn(g_p, points, in_spatial, cfg, n_cells, plan=plan)
            if out is not None:
                return out
        positions = plan[0]
        rows, c, qp = g_p.shape
        q = points.shape[0]
        g = g_p.reshape(rows * c, qp)[:, positions].reshape(rows, c, q)
        fused_fn = _resolve_fused(cfg, "fused_bwd")
        if fused_fn is not None:
            out = fused_fn(g, points, in_spatial, cfg, n_cells)
            if out is not None:
                return out
        return xla_fused_bwd(g, points, in_spatial, cfg, n_cells)

    @jax.custom_vjp
    def fused_pl(cells, points, plan):
        return impl_planned(cells, points, plan)

    def fused_fwd(cells, points, plan):
        out = fused_pl(cells, points, plan)
        return out, (cells, points, out[2], plan)

    def fused_bwd(res, gs):
        cells, points, positions, plan = res
        g_p = gs[0]          # occ / positions cotangents: piecewise-const
        cells_bar = bwd_impl_planned(g_p, points, plan).astype(cells.dtype)
        q = points.shape[0]
        c = g_p.shape[1]
        g_q = g_p.reshape(-1, g_p.shape[-1])[:, positions].reshape(
            1 + 2 * cfg.dim, c, q)
        points_bar = _points_cotangent(cells, points, g_q, cfg, n_cells)
        plan_bar = jax.tree_util.tree_map(_zero_cotangent, plan)
        return cells_bar, points_bar, plan_bar

    fused_pl.defvjp(fused_fwd, fused_bwd)
    _FUSED_PLANNED_CACHE[key] = fused_pl
    return fused_pl


_FUSED_VOL_CACHE = {}


def make_fused_vol(cfg: SamplerConfig, n_cells: int, channels: int,
                   in_spatial: Tuple[int, ...], n_queries: int):
    """Kernel-layout (vol-resident) fused op, or None when the config does
    not route to the HBM-resident v4 generation.

    Returns ``(fused_vol, to_vol, from_vol)``:

    * ``to_vol(cells)`` / ``from_vol(vol)`` convert between the API
      (N, C, D, H, W) layout and the kernel layout (fused3b.vol_layout) —
      one-time, at the training-loop boundary.
    * ``fused_vol(vol, points, plan) -> (out_p, occ, positions)`` is the
      slot-resident fused op taking/emitting the KERNEL layout: its vjp
      returns the volume cotangent in the same layout with pad slots
      exactly zero (fused3b.vol_pad_mask_mul), so an optimizer can run
      directly on ``vol`` and the pad-slot invariant (forward reads pads
      as zeros) survives any optimizer whose update vanishes at zero
      gradient and zero parameter (adam, sgd, adamw all qualify).

    Motivation (VERDICT r2 #1): the query-ordered/padded APIs re-lay-out
    the full volume every forward and crop/transpose the gradient back
    every backward — at the 128^3 sweep two ~0.6 GB relayouts per train
    step the kernels never see.  Training in the kernel layout deletes
    both; measured step time is recorded in BENCHMARKS.md.
    """
    key = (cfg, n_cells, channels, tuple(in_spatial), n_queries)
    cached = _FUSED_VOL_CACHE.get(key)
    if cached is not None:
        return cached
    hook = _resolve_fused(cfg, "fused_vol")
    if hook is None:
        return None
    bundle = hook(cfg, (n_cells, channels, *in_spatial), n_queries)
    if bundle is None:
        return None

    @jax.custom_vjp
    def fused_v(vol, points, plan):
        return bundle["blend"](vol, points, plan=plan)

    def fused_fwd(vol, points, plan):
        out = fused_v(vol, points, plan)
        return out, (vol, points, out[2], plan)

    def fused_bwd(res, gs):
        vol, points, positions, plan = res
        g_p = gs[0]          # occ / positions cotangents: piecewise-const
        vol_bar = bundle["bwd"](g_p, points, plan=plan).astype(vol.dtype)
        q = points.shape[0]
        c = g_p.shape[1]
        g_q = g_p.reshape(-1, g_p.shape[-1])[:, positions].reshape(
            1 + 2 * cfg.dim, c, q)
        # DCE'd when the caller does not differentiate w.r.t. the points
        points_bar = _points_cotangent(bundle["from_vol"](vol), points, g_q,
                                       cfg, n_cells)
        plan_bar = jax.tree_util.tree_map(_zero_cotangent, plan)
        return vol_bar, points_bar, plan_bar

    fused_v.defvjp(fused_fwd, fused_bwd)
    result = (fused_v, bundle["to_vol"], bundle["from_vol"])
    _FUSED_VOL_CACHE[key] = result
    return result


def make_fused_mega(cfg: SamplerConfig, cells_shape, n_queries: int,
                    pde: str, hidden: int):
    """The one-pass train-step gradient hook (ops/pallas/mega2w.py), or
    None when the config/shape does not route to it: a callable
    ``(cells, mlp_params, points, plan) -> (loss, grads)`` whose grads
    pytree matches pinn.init_params.  The plan is a make_sample_plan plan
    for the same (points, cells_shape, cfg) — the megakernel shares the
    v2w slot layout, so plans interchange."""
    hook = _resolve_fused(cfg, "fused_mega")
    if hook is None:
        return None
    return hook(cfg, tuple(cells_shape), n_queries, pde, hidden)


def trim_plan(plan, block_bucket: int | None = None):
    """Slice a CONCRETE bin plan to its used block prefix.

    The slot layout's padded size is a static worst case — every bin
    padded to whole query blocks, ``cdiv(q, qb) + nbins`` blocks — and
    the unused tail blocks (hasv == 0) still pay per-grid-step cost in
    every kernel pass (~1.2 us/block on v5e; at the 128^3 sweep that
    tail is ~3.2k of 16.3k blocks).  When the plan is built EAGERLY (the
    fixed-point trainer / make_sample_plan outside jit), the real prefix
    length is concrete, so the per-slot and per-block arrays can simply
    be sliced to it — every padded kernel reads its grid size from the
    plan shapes.  Under a tracer this is a no-op (shapes must stay
    static).  The trimmed length rounds up to ``block_bucket`` blocks
    (default: 1/16 of the untrimmed bound) so that rebuilding a plan for
    a slightly different point set of the same size usually reproduces
    the same shapes — an exact trim would make every downstream jit
    shape data-dependent and recompile per point set.  Works on any
    generation's plan: the layout is (positions, occ, *per_block_meta,
    hasv, pts_p) with real blocks packed first.
    """
    if plan is None:
        return None
    occ, hasv = plan[1], plan[-2]
    try:
        h = np.asarray(hasv)
    except jax.errors.TracerArrayConversionError:
        return plan
    nb_total = h.shape[0]
    nb = int(h.nonzero()[0].max()) + 1 if h.any() else 1
    bucket = block_bucket or max(1, nb_total // 16)
    nb = min(-(-nb // bucket) * bucket, nb_total)
    if nb == nb_total:
        return plan
    qp = occ.shape[0]
    qp_used = nb * (qp // nb_total)
    return tuple([plan[0]] + [a[:qp_used] if a.shape[0] == qp else a[:nb]
                              for a in plan[1:]])


def make_sample_plan(points, cells_shape, cfg: SamplerConfig):
    """Precompute the bin plan for a FIXED point set, or None.

    The slot-resident kernels bin/sort the query cloud every call; for a
    training loop whose collocation points do not change between steps
    (the reference's own workloads, test_2d.py:23-26 / test_3d.py:16-19),
    build the plan once and pass it to ``sample_features_padded(...,
    plan=plan)`` — at the 1M-point 128^3 sweep the binning costs ~12 ms
    standalone (see make_fused_planned for what each trainer shape
    actually saves).  Returns None when
    no slot-resident kernel routes for this config (callers then use the
    unplanned path).  A plan is valid only for the exact (points,
    cells_shape, cfg) it was built from; jit-safe (a pytree of arrays).
    """
    if points.ndim != 2 or points.shape[-1] != cfg.dim:
        raise ValueError(f"points must be (Q, {cfg.dim}): got {points.shape}")
    fn = _resolve_fused(cfg, "fused_plan")
    if fn is None:
        return None
    return trim_plan(fn(points, tuple(cells_shape), cfg))


def sample_features_padded(cells, points, cfg: SamplerConfig, plan=None):
    """Slot-resident sample_features_with_derivs.

    Returns (out_p, occ, positions): out_p (1+2d, C, QP) in bin-slot
    order, occ the (QP,) 0/1 real-slot mask, positions the (Q,) slot of
    each query.  ``out_p[:, :, positions]`` == the query-ordered API.
    ``plan`` (from make_sample_plan, for a fixed point set) hoists the
    per-call binning/sorting out of the op.
    """
    if points.ndim != 2 or points.shape[-1] != cfg.dim:
        raise ValueError(f"points must be (Q, {cfg.dim}): got {points.shape}")
    if plan is not None:
        if plan[0].shape[0] != points.shape[0]:
            raise ValueError(
                f"plan was built for {plan[0].shape[0]} points; "
                f"got {points.shape[0]} (plans are point-set-specific)")
        fused = make_fused_planned(cfg, cells.shape[0],
                                   tuple(cells.shape[2:]))
        return fused(cells, points, plan)
    fused = make_fused_padded(cfg, cells.shape[0], tuple(cells.shape[2:]))
    return fused(cells, points)


def sample_features_with_derivs(cells, points, cfg: SamplerConfig):
    """(1+2*dim, C, Q): multicell-summed value, jacobian, diagonal Hessian.

    ``points``: (Q, dim) normalized coords shared by all cells (the PINN
    layout, test_2d.py:38: one query cloud broadcast across cells).
    Derivatives are w.r.t. the normalized coordinates.
    """
    if points.ndim != 2 or points.shape[-1] != cfg.dim:
        raise ValueError(f"points must be (Q, {cfg.dim}): got {points.shape}")
    fused = make_fused(cfg, cells.shape[0], tuple(cells.shape[2:]))
    return fused(cells, points)
