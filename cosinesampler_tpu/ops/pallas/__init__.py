"""Pallas TPU backend registration.

Kernels keep the cell block and the stage-1 contraction resident in VMEM,
which bounds the grid sizes they accept (plenty for the reference's 16^2 /
16^3 workloads, up to ~256^2 / ~32^3).  Larger volumes (the 128^3 sweep,
BASELINE.md config 5) route to the v4 bricked kernels (fused3b.py:
HBM-resident volume, bin-sorted queries, per-brick DMA) when the query
cloud is large enough to amortize the bins, else to the XLA gather/scatter
path.
"""

import math

from .. import generic
from ..sampler import register_backend
from . import (fused2d, fused2w, fused3b, fused3d, fused3s, fused3w, mega2w,
               percell, slab)
from .fused import FUSED_Q_BLOCK, pallas_fused_blend, pallas_fused_bwd
from .kernels import DEFAULT_Q_BLOCK, pallas_blend, pallas_splat
from .prep import VMEM_BUDGET as _VMEM_BUDGET

# When True, registered kernels run in the Pallas interpreter (CPU debugging
# of the full custom_vjp chain against the kernels).
INTERPRET = False


def _fits_vmem(cells_shape, q_block, whole_stack: bool) -> bool:
    """cell block + stage-1 intermediate must fit comfortably in VMEM."""
    n, c = cells_shape[:2]
    spatial = cells_shape[2:]
    cell_block = (n if whole_stack else 1) * c * math.prod(spatial) * 4
    stage1 = c * math.prod(spatial[:-1]) * q_block * 4
    return max(cell_block, stage1) <= _VMEM_BUDGET


_GEN_NAMES = {fused2w: "v2w", fused3w: "v3w", fused3b: "v3b"}


def _tuned(mod, cfg, cells_shape, n_queries) -> dict:
    """Autotuned kernel kwargs for this route ({} -> module defaults).

    Consulted at trace time by every entry of a binned generation — the
    plan builder and the kernels see the same in-process cache snapshot
    (utils/autotune loads once), so slot layouts always agree.  A tuned
    value is re-validated against the generation's VMEM gates."""
    from ...utils import autotune

    params = autotune.lookup(_GEN_NAMES[mod], cells_shape, cfg, n_queries)
    if params:
        try:
            if mod.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries,
                            **params):
                return params
        except TypeError:  # stale cache entry with a knob this module lacks
            pass
    # No (valid) tuned entry: resolve the generation's adaptive default
    # explicitly so the plan builder and the kernels — which see different
    # argument shapes — agree on the slot layout.
    pick = getattr(mod, "pick_q_block", None)
    if pick is not None:
        qb = pick(cfg, cells_shape, _VMEM_BUDGET)
        if qb is not None:
            return {"q_block": qb}
    return {}


def _f64(*arrays) -> bool:
    """The kernels compute in f32; route f64 requests to the exact XLA
    path instead of silently downcasting."""
    import jax.numpy as jnp

    return any(a.dtype == jnp.float64 for a in arrays)


_SLAB_FALLBACK_WARNED = set()


def _slab_guard(op_name, slab_fn, generic_fn):
    """Run the slab route; degrade to the XLA path on a TRACE/COMPILE-time
    failure instead of raising (ADVICE r4: the slab dispatch previously
    had no error fallback for shapes the VMEM model mis-judged).  Only
    trace-time errors can be caught here — under jit there is no runtime
    exception path — so this is a safety net for model gaps, logged once
    per op."""
    try:
        return slab_fn()
    except Exception as e:  # Mosaic VMEM/layout errors are backend-specific
        if op_name not in _SLAB_FALLBACK_WARNED:
            _SLAB_FALLBACK_WARNED.add(op_name)
            import warnings

            warnings.warn(
                f"slab route failed for {op_name} ({type(e).__name__}: {e}); "
                "falling back to the XLA path", RuntimeWarning)
        return generic_fn()


def _blend(input, grid, cfg, orders):
    if _f64(input, grid):
        return generic.blend(input, grid, cfg, orders)
    if not _fits_vmem(input.shape, DEFAULT_Q_BLOCK, whole_stack=False):
        # over-VMEM volumes: first the binned per-cell route (percell.py
        # — each query block touches ONE (cell, z-window) pair), then the
        # slab-decomposed v1 route (slab.py — correctness at any size),
        # and the XLA gather fallback last (its 3D leg faults the TPU
        # runtime under lax.scan, BENCHMARKS.md "Per-cell" caveat)
        import math as _math

        n_pairs = input.shape[0] * _math.prod(grid.shape[1:-1])
        if percell.supports(cfg, input.shape, _VMEM_BUDGET, n_pairs):
            return _slab_guard(
                "blend_percell",
                lambda: percell.pallas_blend_percell(
                    input, grid, cfg, orders, interpret=INTERPRET),
                lambda: _blend_overvmem_rest(input, grid, cfg, orders))
        return _blend_overvmem_rest(input, grid, cfg, orders)
    return pallas_blend(input, grid, cfg, orders, interpret=INTERPRET)


def _blend_overvmem_rest(input, grid, cfg, orders):
    if slab.supports(cfg, input.shape, _VMEM_BUDGET):
        return _slab_guard(
            "blend",
            lambda: slab.pallas_blend_slab(input, grid, cfg, orders,
                                           interpret=INTERPRET),
            lambda: generic.blend(input, grid, cfg, orders))
    return generic.blend(input, grid, cfg, orders)


def _splat(gout, grid, in_spatial, cfg, orders):
    shape = (gout.shape[0], gout.shape[1], *in_spatial)
    if _f64(gout, grid):
        return generic.splat(gout, grid, tuple(in_spatial), cfg, orders)
    if not _fits_vmem(shape, DEFAULT_Q_BLOCK, whole_stack=False):
        import math as _math

        n_pairs = gout.shape[0] * _math.prod(grid.shape[1:-1])
        if percell.supports(cfg, shape, _VMEM_BUDGET, n_pairs):
            return _slab_guard(
                "splat_percell",
                lambda: percell.pallas_splat_percell(
                    gout, grid, tuple(in_spatial), cfg, orders,
                    interpret=INTERPRET),
                lambda: _splat_overvmem_rest(gout, grid, in_spatial, cfg,
                                             orders))
        return _splat_overvmem_rest(gout, grid, in_spatial, cfg, orders)
    return pallas_splat(gout, grid, tuple(in_spatial), cfg, orders,
                        interpret=INTERPRET)


def _splat_overvmem_rest(gout, grid, in_spatial, cfg, orders):
    shape = (gout.shape[0], gout.shape[1], *in_spatial)
    if slab.supports(cfg, shape, _VMEM_BUDGET):
        return _slab_guard(
            "splat",
            lambda: slab.pallas_splat_slab(gout, grid,
                                           tuple(in_spatial), cfg,
                                           orders, interpret=INTERPRET),
            lambda: generic.splat(gout, grid, tuple(in_spatial), cfg,
                                  orders))
    return generic.splat(gout, grid, tuple(in_spatial), cfg, orders)


def _strict_mixed_align(cfg) -> bool:
    """strict-mode 2D + align_corners=False: the value row needs the
    reference's hardcoded align=True while derivative rows need the real
    flag — per-row alignment the single-pass fused kernels cannot mix.
    The XLA fused fallback computes each row via generic.blend and is
    faithful automatically."""
    return cfg.strict_reference and cfg.dim == 2 and not cfg.align_corners


def _fused_blend(cells, points, cfg):
    if _f64(cells, points) or _strict_mixed_align(cfg):
        return None
    if fused2w.supports(cfg, cells.shape, _VMEM_BUDGET, points.shape[0]):
        return fused2w.pallas_fused2w_blend(
            cells, points, cfg, interpret=INTERPRET,
            **_tuned(fused2w, cfg, cells.shape, points.shape[0]))
    if fused2d.supports(cfg, cells.shape, _VMEM_BUDGET):
        return fused2d.pallas_fused2_blend(cells, points, cfg,
                                           interpret=INTERPRET)
    if fused3w.supports(cfg, cells.shape, _VMEM_BUDGET, points.shape[0]):
        return fused3w.pallas_fused3w_blend(
            cells, points, cfg, interpret=INTERPRET,
            **_tuned(fused3w, cfg, cells.shape, points.shape[0]))
    if fused3s.supports(cfg, cells.shape, _VMEM_BUDGET, points.shape[0]):
        return fused3s.pallas_fused3s_blend(cells, points, cfg,
                                            interpret=INTERPRET)
    if fused3b.supports(cfg, cells.shape, _VMEM_BUDGET, points.shape[0]):
        return fused3b.pallas_fused3b_blend(
            cells, points, cfg, interpret=INTERPRET,
            **_tuned(fused3b, cfg, cells.shape, points.shape[0]))
    if fused3d.supports(cfg, cells.shape, _VMEM_BUDGET):
        return fused3d.pallas_fused3_blend(cells, points, cfg,
                                           interpret=INTERPRET)
    if not _fits_vmem(cells.shape, FUSED_Q_BLOCK[cfg.dim], whole_stack=True):
        return None
    return pallas_fused_blend(cells, points, cfg, interpret=INTERPRET)


def _fused_bwd(g, points, in_spatial, cfg, n_cells):
    if _f64(g, points) or _strict_mixed_align(cfg):
        return None
    shape = (n_cells, g.shape[1], *in_spatial)
    if fused2w.supports(cfg, shape, _VMEM_BUDGET, points.shape[0]):
        return fused2w.pallas_fused2w_bwd(
            g, points, tuple(in_spatial), cfg, n_cells, interpret=INTERPRET,
            **_tuned(fused2w, cfg, shape, points.shape[0]))
    if fused2d.supports(cfg, shape, _VMEM_BUDGET):
        return fused2d.pallas_fused2_bwd(g, points, tuple(in_spatial), cfg,
                                         n_cells, interpret=INTERPRET)
    if fused3w.supports(cfg, shape, _VMEM_BUDGET, points.shape[0]):
        return fused3w.pallas_fused3w_bwd(
            g, points, tuple(in_spatial), cfg, n_cells, interpret=INTERPRET,
            **_tuned(fused3w, cfg, shape, points.shape[0]))
    if fused3s.supports(cfg, shape, _VMEM_BUDGET, points.shape[0]):
        return fused3s.pallas_fused3s_bwd(g, points, tuple(in_spatial), cfg,
                                          n_cells, interpret=INTERPRET)
    if fused3b.supports(cfg, shape, _VMEM_BUDGET, points.shape[0]):
        return fused3b.pallas_fused3b_bwd(
            g, points, tuple(in_spatial), cfg, n_cells, interpret=INTERPRET,
            **_tuned(fused3b, cfg, shape, points.shape[0]))
    if fused3d.supports(cfg, shape, _VMEM_BUDGET):
        return fused3d.pallas_fused3_bwd(g, points, tuple(in_spatial), cfg,
                                         n_cells, interpret=INTERPRET)
    if not _fits_vmem(shape, FUSED_Q_BLOCK[cfg.dim], whole_stack=True):
        return None
    return pallas_fused_bwd(g, points, tuple(in_spatial), cfg, n_cells,
                            interpret=INTERPRET)


def _padded_route(cfg, cells_shape, n_queries):
    """Which padded kernel handles this config, respecting the exact
    _fused_blend priority order (a None step means that generation wins
    the route but has no padded variant -> identity-plan fallback)."""
    if fused2w.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries):
        return fused2w
    if fused2d.supports(cfg, cells_shape, _VMEM_BUDGET):
        return None
    if fused3w.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries):
        return fused3w
    if fused3s.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries):
        return None
    if fused3b.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries):
        return fused3b
    return None


_PADDED_FNS = {fused2w: (fused2w.pallas_fused2w_blend_padded,
                         fused2w.pallas_fused2w_bwd_padded),
               fused3w: (fused3w.pallas_fused3w_blend_padded,
                         fused3w.pallas_fused3w_bwd_padded),
               fused3b: (fused3b.pallas_fused3b_blend_padded,
                         fused3b.pallas_fused3b_bwd_padded)}


def _fused_padded(cells, points, cfg, plan=None):
    """Slot-resident fused blend: (out_p, occ, positions) or None.

    Only the v5 windowed / v4 bricked generations have padded variants;
    every other route returns None and the caller (ops/fused.py) falls
    back to the regular kernel with an identity slot plan.  ``plan``
    (from _fused_plan, same route) hoists the binning for fixed points."""
    if _f64(cells, points) or _strict_mixed_align(cfg):
        return None
    mod = _padded_route(cfg, cells.shape, points.shape[0])
    if mod is None:
        return None
    return _PADDED_FNS[mod][0](cells, points, cfg, interpret=INTERPRET,
                               plan=plan,
                               **_tuned(mod, cfg, cells.shape,
                                        points.shape[0]))


def _fused_padded_bwd(g_p, points, in_spatial, cfg, n_cells, plan=None):
    if _f64(g_p, points) or _strict_mixed_align(cfg):
        return None
    shape = (n_cells, g_p.shape[1], *in_spatial)
    mod = _padded_route(cfg, shape, points.shape[0])
    if mod is None:
        return None
    return _PADDED_FNS[mod][1](g_p, points, tuple(in_spatial), cfg, n_cells,
                               interpret=INTERPRET, plan=plan,
                               **_tuned(mod, cfg, shape, points.shape[0]))


def _fused_vol_bundle(cfg, cells_shape, n_queries):
    """Kernel-layout (vol-resident) op bundle for this config, or None.

    Only the HBM-resident v4 generation pays a per-call volume relayout
    worth eliminating (fused3b.vol_layout); every other route keeps its
    cells in API layout, so this returns None and callers use the padded
    path.  The bundle closes over the tuned kwargs so the plan, blend and
    bwd all agree on the slot/volume geometry."""
    if _f64() or _strict_mixed_align(cfg):
        return None
    cells_shape = tuple(cells_shape)
    if _padded_route(cfg, cells_shape, n_queries) is not fused3b:
        return None
    kw = _tuned(fused3b, cfg, cells_shape, n_queries)
    qb = kw.get("q_block", fused3b.V3B_Q_BLOCK)
    gy = kw.get("gy", fused3b.V3B_GY)
    rb = kw.get("rb")
    sb = kw.get("sb", fused3b.V3B_SB)
    n, c = cells_shape[:2]
    spatial = cells_shape[2:]

    def to_vol(cells):
        return fused3b.cells_to_vol(cells, cfg, gy=gy, rb=rb)

    def from_vol(vol):
        return fused3b.vol_to_cells(vol, n, c, spatial, cfg)

    def blend(vol, points, plan=None):
        return fused3b.pallas_fused3b_blend_vol(
            vol, points, cfg, n, c, spatial, q_block=qb, gy=gy, rb=rb,
            sb=sb, interpret=INTERPRET, plan=plan)

    def bwd(g_p, points, plan=None):
        return fused3b.pallas_fused3b_bwd_vol(
            g_p, points, spatial, cfg, n, q_block=qb, gy=gy, rb=rb, sb=sb,
            interpret=INTERPRET, plan=plan)

    return {"to_vol": to_vol, "from_vol": from_vol, "blend": blend,
            "bwd": bwd}


def _fused_mega(cfg, cells_shape, n_queries, pde, hidden):
    """The v6 residual-megakernel step hook: a callable
    (cells, mlp_params, points, plan) -> (loss, grads) or None.

    Gated on the config routing to the v2w generation (the megakernel
    shares its window geometry, slot layout and PLAN format — a
    make_sample_plan plan for this config is valid verbatim) and on
    mega2w's own supports().  Tuned kwargs come from the v2w table so the
    plan builder and the megakernel agree on q_block."""
    if _f64() or _strict_mixed_align(cfg):
        return None
    cells_shape = tuple(cells_shape)
    if _padded_route(cfg, cells_shape, n_queries) is not fused2w:
        return None
    kw = _tuned(fused2w, cfg, cells_shape, n_queries)
    if not mega2w.supports(cfg, cells_shape, _VMEM_BUDGET, n_queries,
                           hidden=hidden, pde=pde, **kw):
        return None

    def run(cells, mlp_params, points, plan=None):
        tile = mega2w.pack_mlp(mlp_params["w1"], mlp_params["b1"],
                               mlp_params["w2"], mlp_params["b2"])
        return mega2w.pallas_mega2w_step(cells, tile, points, cfg, pde,
                                         hidden, interpret=INTERPRET,
                                         plan=plan, **kw)

    return run


def _fused_plan(points, cells_shape, cfg):
    """Precompute the bin plan for the padded kernel this config routes to
    (None when no slot-resident kernel applies — identity plan).

    The binning keys on stop_gradient'd floors of the coordinates, so a
    plan built from the same ``points`` the padded op later receives is
    bit-consistent with in-op binning.  f64 points route to the XLA path
    (no plan), mirroring _fused_padded."""
    if _f64(points) or _strict_mixed_align(cfg):
        return None
    mod = _padded_route(cfg, cells_shape, points.shape[0])
    if mod is None:
        return None
    return mod.make_plan(points, tuple(cells_shape[2:]), cfg,
                         **_tuned(mod, cfg, cells_shape, points.shape[0]))


for _dim in (2, 3):
    register_backend("pallas", _dim, blend=_blend, splat=_splat)
    register_backend("pallas", _dim, fused_blend=_fused_blend,
                     fused_bwd=_fused_bwd)
    register_backend("pallas", _dim, fused_padded=_fused_padded,
                     fused_padded_bwd=_fused_padded_bwd,
                     fused_plan=_fused_plan, fused_vol=_fused_vol_bundle,
                     fused_mega=_fused_mega)

__all__ = ["pallas_blend", "pallas_splat", "pallas_fused_blend",
           "pallas_fused_bwd", "INTERPRET"]
