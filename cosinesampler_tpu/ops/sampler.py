"""Exact arbitrary-order autodiff for the sampler: two mutually recursive VJPs.

The reference wires derivative support through THREE stacked
torch.autograd.Function classes (modules_2d.py:20-111) whose third level is
truncated (no grid gradient, modules_2d.py:111) and whose 2D second level
omits the d2/dxdy cross terms (kernel.cu:638-643 vs the 3D kernel's full
mixed table, cosine_sampler_3d_kernel.cu:747-772).

The TPU-native design replaces that stack with a closed family: ``blend_o``
and its input-transpose ``splat_o`` (see generic.py).  Their VJPs are
expressible in terms of the family itself:

    blend_o  vjp:  input_bar = splat_o(g)
                   grid_bar[..,ax] = sum_C g * blend_{o+e_ax}(input)
    splat_o  vjp:  gout_bar = blend_o(cot)
                   grid_bar[..,ax] = sum_C gout * blend_{o+e_ax}(cot)

By induction every derivative of every order is exact — including the
third-order grid terms and 2D mixed terms the reference drops.  The
reference's own acceptance test (dloss/dcells parity vs a full-autodiff
oracle at rtol 1e-4, test/test_2d.py:244) is therefore satisfied by
construction.

Each family member is one backend kernel invocation (XLA gather/scatter
here; Pallas on TPU via pallas/ once registered), so nested jax.grad lowers
to the same flat sequence of gather/scatter kernels the reference launches —
not to an XLA-retraced derivative graph.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import generic
from .config import SamplerConfig

# Registry of fused/pallas backends, keyed by (backend, dim). Entries are
# dicts with optional "blend" and "splat" callables matching generic.blend /
# generic.splat signatures.  pallas/ registers itself here on import.
_BACKEND_IMPLS = {}


def register_backend(name: str, dim: int, *, blend=None, splat=None,
                     fused_blend=None, fused_bwd=None,
                     fused_padded=None, fused_padded_bwd=None,
                     fused_plan=None, fused_vol=None, fused_mega=None):
    impls = _BACKEND_IMPLS.setdefault((name, dim), {})
    for key, fn in (("blend", blend), ("splat", splat),
                    ("fused_blend", fused_blend), ("fused_bwd", fused_bwd),
                    ("fused_padded", fused_padded),
                    ("fused_padded_bwd", fused_padded_bwd),
                    ("fused_plan", fused_plan), ("fused_vol", fused_vol),
                    ("fused_mega", fused_mega)):
        if fn is not None:
            impls[key] = fn


def _resolve(cfg: SamplerConfig, op: str):
    """Pick the backend implementation for ``op`` ("blend" | "splat")."""
    backend = cfg.backend
    if backend == "auto":
        impls = _BACKEND_IMPLS.get(("pallas", cfg.dim), {})
        default_tpu = jax.default_backend() == "tpu"
        if default_tpu and op in impls:
            return impls[op]
        return getattr(generic, op)
    if backend == "xla":
        return getattr(generic, op)
    impls = _BACKEND_IMPLS.get((backend, cfg.dim), {})
    if op in impls:
        return impls[op]
    return getattr(generic, op)


_BLEND_CACHE = {}
_SPLAT_CACHE = {}


def _bump(orders: Tuple[int, ...], axis: int) -> Tuple[int, ...]:
    return tuple(o + (1 if i == axis else 0) for i, o in enumerate(orders))


def differentiable_blend(cfg: SamplerConfig, orders: Tuple[int, ...]):
    """The custom_vjp-wrapped ``blend_o`` for one (config, orders)."""
    key = (cfg, orders)
    cached = _BLEND_CACHE.get(key)
    if cached is not None:
        return cached

    def impl(input, grid):
        return _resolve(cfg, "blend")(input, grid, cfg, orders)

    @jax.custom_vjp
    def blend_o(input, grid):
        return impl(input, grid)

    def blend_fwd(input, grid):
        # Recursive-fwd idiom: call the *wrapped* function so that when an
        # outer grad inlines this fwd jaxpr (grad-of-grad), it finds another
        # protected custom_vjp call instead of a raw pallas_call (which has
        # no transpose rule).  Terminates because each differentiation level
        # peels exactly one wrapper.
        return blend_o(input, grid), (input, grid)

    def blend_bwd(res, g):
        input, grid = res
        in_spatial = tuple(input.shape[2:])
        splat_o = differentiable_splat(cfg, orders, in_spatial)
        # cotangent dtype must match the primal (e.g. bf16 cells get a
        # bf16 cotangent even though the splat accumulates wider)
        input_bar = splat_o(g, grid).astype(input.dtype)
        lanes = []
        for ax in range(cfg.dim):
            blend_next = differentiable_blend(cfg, _bump(orders, ax))
            lanes.append((g * blend_next(input, grid)).sum(axis=1))
        grid_bar = jnp.stack(lanes, axis=-1).astype(grid.dtype)
        if grid.shape[0] == 1 and grid_bar.shape[0] != 1:
            grid_bar = grid_bar.sum(axis=0, keepdims=True)  # shared queries
        return input_bar, grid_bar

    blend_o.defvjp(blend_fwd, blend_bwd)
    _BLEND_CACHE[key] = blend_o
    return blend_o


def differentiable_splat(cfg: SamplerConfig, orders: Tuple[int, ...],
                         in_spatial: Tuple[int, ...]):
    """The custom_vjp-wrapped ``splat_o`` (transpose of blend_o w.r.t. input)."""
    key = (cfg, orders, in_spatial)
    cached = _SPLAT_CACHE.get(key)
    if cached is not None:
        return cached

    def impl(gout, grid):
        return _resolve(cfg, "splat")(gout, grid, in_spatial, cfg, orders)

    @jax.custom_vjp
    def splat_o(gout, grid):
        return impl(gout, grid)

    def splat_fwd(gout, grid):
        # recursive-fwd idiom, see differentiable_blend
        return splat_o(gout, grid), (gout, grid)

    def splat_bwd(res, cot):
        gout, grid = res
        blend_o = differentiable_blend(cfg, orders)
        gout_bar = blend_o(cot, grid).astype(gout.dtype)
        lanes = []
        for ax in range(cfg.dim):
            blend_next = differentiable_blend(cfg, _bump(orders, ax))
            lanes.append((gout * blend_next(cot, grid)).sum(axis=1))
        grid_bar = jnp.stack(lanes, axis=-1).astype(grid.dtype)
        if grid.shape[0] == 1 and grid_bar.shape[0] != 1:
            grid_bar = grid_bar.sum(axis=0, keepdims=True)
        return gout_bar, grid_bar

    splat_o.defvjp(splat_fwd, splat_bwd)
    _SPLAT_CACHE[key] = splat_o
    return splat_o


def _validate(input, grid, cfg: SamplerConfig):
    d = cfg.dim
    if input.ndim != d + 2:
        raise ValueError(
            f"input must be (N, C{', D' if d == 3 else ''}, H, W): got {input.shape}"
        )
    if grid.ndim != d + 2 or grid.shape[-1] != d:
        raise ValueError(
            f"grid must be (N, {'D_out, ' if d == 3 else ''}H_out, W_out, {d}): "
            f"got {grid.shape}"
        )
    if grid.shape[0] not in (1, input.shape[0]):
        raise ValueError(
            f"input and grid must share the cell/batch dim (or grid batch 1 "
            f"for shared queries): {input.shape[0]} vs {grid.shape[0]}"
        )


def sample(input, grid, cfg: SamplerConfig):
    """Differentiable-to-any-order grid sample.  Output (N, C, *out_spatial).

    Drop-in semantic equivalent of CosineSampler2d/3d.apply
    (modules_2d.py:20-35, modules_3d.py:20-35).
    """
    _validate(input, grid, cfg)
    return differentiable_blend(cfg, (0,) * cfg.dim)(input, grid)
