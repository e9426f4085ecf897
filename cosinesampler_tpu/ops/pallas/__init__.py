"""Pallas TPU backend registration."""

from ..sampler import register_backend
from .fused import pallas_fused_blend, pallas_fused_bwd
from .kernels import pallas_blend, pallas_splat

# When True, registered kernels run in the Pallas interpreter (CPU debugging
# of the full custom_vjp chain against the kernels).
INTERPRET = False


def _blend(input, grid, cfg, orders):
    return pallas_blend(input, grid, cfg, orders, interpret=INTERPRET)


def _splat(gout, grid, in_spatial, cfg, orders):
    return pallas_splat(gout, grid, tuple(in_spatial), cfg, orders,
                        interpret=INTERPRET)


def _fused_blend(cells, points, cfg):
    return pallas_fused_blend(cells, points, cfg, interpret=INTERPRET)


def _fused_bwd(g, points, in_spatial, cfg, n_cells):
    return pallas_fused_bwd(g, points, tuple(in_spatial), cfg, n_cells,
                            interpret=INTERPRET)


for _dim in (2, 3):
    register_backend("pallas", _dim, blend=_blend, splat=_splat)
    register_backend("pallas", _dim, fused_blend=_fused_blend,
                     fused_bwd=_fused_bwd)

__all__ = ["pallas_blend", "pallas_splat", "pallas_fused_blend",
           "pallas_fused_bwd", "INTERPRET"]
