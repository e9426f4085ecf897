"""Pallas TPU backend registration."""

from ..sampler import register_backend
from .kernels import pallas_blend, pallas_splat

# When True, registered kernels run in the Pallas interpreter (CPU debugging
# of the full custom_vjp chain against the kernels).
INTERPRET = False


def _blend(input, grid, cfg, orders):
    return pallas_blend(input, grid, cfg, orders, interpret=INTERPRET)


def _splat(gout, grid, in_spatial, cfg, orders):
    return pallas_splat(gout, grid, tuple(in_spatial), cfg, orders,
                        interpret=INTERPRET)


for _dim in (2, 3):
    register_backend("pallas", _dim, blend=_blend, splat=_splat)

__all__ = ["pallas_blend", "pallas_splat", "INTERPRET"]
