"""Pallas kernels vs the XLA backend, in interpret mode on CPU.

On real TPU hardware the same comparisons run compiled (run this module
with JAX_PLATFORMS unset on a TPU host).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.kernels import pallas_blend, pallas_splat

N_CELL, C, Q = 3, 4, 100


def _data(dim, seed=0):
    rng = np.random.RandomState(seed)
    spatial = (8, 8) if dim == 2 else (6, 6, 6)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    lead = (1,) * (dim - 1)
    grid = jnp.asarray(
        rng.uniform(-1.3, 1.3, size=(N_CELL, *lead, Q, dim)), jnp.float32)
    gout = jnp.asarray(rng.rand(N_CELL, C, *lead, Q), jnp.float32)
    return cells, grid, gout


CASES = [
    (dim, kernel, padding, multicell, orders)
    for dim, kernel, padding, multicell in itertools.product(
        (2, 3), ("cosine", "linear", "smoothstep"),
        ("zeros", "border", "reflection"), (True, False))
    for orders in [(0,) * dim]
] + [
    (2, "cosine", "zeros", True, (1, 0)),
    (2, "cosine", "zeros", True, (0, 2)),
    (2, "cosine", "border", True, (1, 1)),
    (2, "smoothstep", "zeros", True, (2, 0)),
    (3, "cosine", "zeros", True, (1, 0, 0)),
    (3, "cosine", "zeros", True, (0, 2, 0)),
    (3, "cosine", "reflection", True, (0, 0, 1)),
]


@pytest.mark.parametrize("dim,kernel,padding,multicell,orders", CASES)
def test_pallas_blend_matches_xla(dim, kernel, padding, multicell, orders):
    cfg = SamplerConfig(dim=dim, kernel=kernel, padding_mode=padding,
                        multicell=multicell, backend="pallas")
    cells, grid, _ = _data(dim)
    want = generic.blend(cells, grid, cfg, orders)
    got = pallas_blend(cells, grid, cfg, orders, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-5)


@pytest.mark.parametrize("dim,kernel,padding,multicell,orders", CASES)
def test_pallas_splat_matches_xla(dim, kernel, padding, multicell, orders):
    cfg = SamplerConfig(dim=dim, kernel=kernel, padding_mode=padding,
                        multicell=multicell, backend="pallas")
    cells, grid, gout = _data(dim)
    spatial = tuple(cells.shape[2:])
    want = generic.splat(gout, grid, spatial, cfg, orders)
    got = pallas_splat(gout, grid, spatial, cfg, orders, q_block=64,
                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-5)
