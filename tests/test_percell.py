"""v7 binned per-cell kernels (percell.py) vs the slab route + XLA oracle.

percell reuses the slab kernels' per-axis one-hot math verbatim (the
binning only changes WHICH (cell, window) pair each block evaluates), so
the strongest check is bit-equality against the slab route; the oracle
comparison uses a cancellation-aware tolerance (derivative fields sum
~mult^order-magnitude corner terms that cancel — f32 noise scales with
the field's absolute maximum, not each element's value).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import percell, slab

N_CELL, C, Q = 3, 2, 700
SHAPE = (20, 16, 24)


def _data(seed=0, lo=-1.2, hi=1.2, per_cell=True):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *SHAPE), jnp.float32)
    ng = N_CELL if per_cell else 1
    grid = jnp.asarray(rng.uniform(lo, hi, (ng, Q, 1, 3)), jnp.float32)
    g = jnp.asarray(rng.randn(N_CELL, C, Q, 1), jnp.float32)
    return cells, grid, g


def _oracle_close(got, want):
    got, want = np.asarray(got), np.asarray(want)
    # derivative-order fields sum ~mult^order corner terms that cancel;
    # f32 noise scales with the field's absolute maximum (observed up to
    # ~3e-6 * scale vs the differently-factored oracle)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-5 * scale)


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("orders", [(0, 0, 0), (2, 0, 0), (0, 1, 1)])
def test_percell_blend_bit_matches_slab(padding, orders):
    cfg = SamplerConfig(dim=3, padding_mode=padding, backend="pallas")
    cells, grid, _ = _data(1)
    got = percell.pallas_blend_percell(cells, grid, cfg, orders,
                                       interpret=True)
    ref = slab.pallas_blend_slab(cells, grid, cfg, orders, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    _oracle_close(got, generic.blend(cells, grid, cfg, orders))


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("orders", [(0, 0, 0), (1, 0, 2)])
def test_percell_splat_bit_matches_slab(padding, orders):
    cfg = SamplerConfig(dim=3, padding_mode=padding, backend="pallas")
    cells, grid, g = _data(2)
    got = percell.pallas_splat_percell(g, grid, SHAPE, cfg, orders,
                                       interpret=True)
    ref = slab.pallas_splat_slab(g, grid, SHAPE, cfg, orders,
                                 interpret=True)
    # near-bit: the two routes group the same corner terms by different
    # slab decompositions (dz differs), so accumulation order shifts a
    # few f32 ulps at derivative orders (observed ~6e-6 relative)
    scale = max(1.0, float(np.abs(np.asarray(ref)).max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6 * scale)
    _oracle_close(got, generic.splat(g, grid, SHAPE, cfg, orders))


def test_percell_shared_grid_and_no_multicell():
    """ng == 1 expands to N x Q pairs (each cell has its own offset
    lattice); multicell=False degenerates every offset to zero."""
    for mc in (True, False):
        cfg = SamplerConfig(dim=3, multicell=mc, backend="pallas")
        cells, grid, _ = _data(3, per_cell=False)
        got = percell.pallas_blend_percell(cells, grid, cfg, (0, 0, 0),
                                           interpret=True)
        _oracle_close(got, generic.blend(cells, grid, cfg, (0, 0, 0)))


def test_percell_supports_gates():
    cfg = SamplerConfig(dim=3, backend="pallas")
    shape = (4, 4, 128, 128, 128)
    assert percell.supports(cfg, shape, 6 << 20, 65536)
    # sparse clouds (pairs per bin below the floor) fall to the slab route
    assert not percell.supports(cfg, shape, 6 << 20, 100)
    # 2D never routes here
    assert not percell.supports(
        SamplerConfig(dim=2, backend="pallas"), (4, 4, 1024, 1024),
        6 << 20, 65536)


def test_dispatcher_routes_percell_then_slab():
    """The over-VMEM dispatcher prefers percell when the pair count
    amortizes the bins and falls back to slab below the floor."""
    import cosinesampler_tpu.ops.pallas as pb
    from cosinesampler_tpu.ops.sampler import sample

    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(4)
    # over-VMEM volume, small enough to run in interpret mode
    cells = jnp.asarray(rng.rand(2, 2, 48, 48, 48), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 16, 16, 8, 3)),
                       jnp.float32)
    assert percell.supports(cfg, cells.shape, 6 << 20,
                            2 * 2048), "shape must exercise the new route"
    old = pb.INTERPRET
    pb.INTERPRET = True
    try:
        got = sample(cells, grid, cfg)
        want = generic.blend(cells, grid, cfg, (0, 0, 0))
        _oracle_close(got, want)
        gr = jax.grad(lambda c: (sample(c, grid, cfg) ** 2).sum())(cells)
        wr = jax.grad(
            lambda c: (generic.blend(c, grid, cfg, (0, 0, 0)) ** 2).sum()
        )(cells)
        _oracle_close(gr, wr)
    finally:
        pb.INTERPRET = old
