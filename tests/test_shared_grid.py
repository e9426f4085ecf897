"""Shared-query grids (grid batch dim 1 broadcast across cells).

Idiomatic extension over the reference (which requires the caller to
.repeat() the grid N times, test_2d.py:38, paying N x the coordinate HBM
traffic).  grid[0:1] must equal the explicitly repeated grid in values and
in every gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.kernels import pallas_blend, pallas_splat
from cosinesampler_tpu.ops.sampler import sample

N, C, Q = 5, 3, 64


def _data(dim, seed=0):
    rng = np.random.RandomState(seed)
    spatial = (8, 8) if dim == 2 else (6, 6, 6)
    cells = jnp.asarray(rng.rand(N, C, *spatial))
    lead = (1,) * (dim - 1)
    shared = jnp.asarray(rng.uniform(-0.9, 0.9, (1, *lead, Q, dim)))
    full = jnp.broadcast_to(shared, (N, *lead, Q, dim))
    return cells, shared, full


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("multicell", [True, False])
def test_shared_grid_matches_repeated(dim, multicell):
    cfg = SamplerConfig(dim=dim, multicell=multicell, backend="xla")
    cells, shared, full = _data(dim)
    np.testing.assert_allclose(sample(cells, shared, cfg),
                               sample(cells, full, cfg), rtol=1e-12, atol=0)


@pytest.mark.parametrize("dim", [2])
def test_shared_grid_gradients_match(dim):
    cfg = SamplerConfig(dim=dim, backend="xla")
    cells, shared, full = _data(dim, seed=1)

    gc_s = jax.grad(lambda c: sample(c, shared, cfg).sum())(cells)
    gc_f = jax.grad(lambda c: sample(c, full, cfg).sum())(cells)
    np.testing.assert_allclose(gc_s, gc_f, rtol=1e-11)

    gg_s = jax.grad(lambda g: sample(cells, g, cfg).sum())(shared)
    gg_f = jax.grad(lambda g: sample(cells, g, cfg).sum())(full)
    np.testing.assert_allclose(gg_s, gg_f.sum(axis=0, keepdims=True),
                               rtol=1e-11)

    # second order through shared grid
    def u_xx_sum(g):
        ux = jax.grad(lambda gg: sample(cells, gg, cfg).sum())(g)[..., 0]
        return (ux**2).sum()

    np.testing.assert_allclose(
        jax.grad(lambda c: u_xx_sum_cells(c, shared, cfg))(cells),
        jax.grad(lambda c: u_xx_sum_cells(c, full, cfg))(cells),
        rtol=1e-10, atol=1e-12)


def u_xx_sum_cells(cells, grid, cfg):
    ux = jax.grad(lambda g: sample(cells, g, cfg).sum())(grid)[..., 0]
    ux = ux.sum(axis=0)  # collapse the cell dim (shared grid already summed)
    return (ux**2).sum()


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_shared_grid_matches_xla(dim):
    cfg = SamplerConfig(dim=dim, backend="pallas")
    cells, shared, full = _data(dim, seed=2)
    cells = cells.astype(jnp.float32)
    shared = shared.astype(jnp.float32)
    orders = (0,) * dim
    from cosinesampler_tpu.ops import generic
    want = generic.blend(cells, shared, cfg, orders)
    got = pallas_blend(cells, shared, cfg, orders, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    rng = np.random.RandomState(3)
    gout = jnp.asarray(rng.rand(*want.shape), jnp.float32)
    spatial = tuple(cells.shape[2:])
    want_s = generic.splat(gout, shared, spatial, cfg, orders)
    got_s = pallas_splat(gout, shared, spatial, cfg, orders, q_block=64,
                         interpret=True)
    np.testing.assert_allclose(got_s, want_s, rtol=3e-5, atol=3e-5)
