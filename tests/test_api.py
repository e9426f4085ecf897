"""Public API surface: functional entry points + the .apply shims."""

import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu as cst
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig


def _data2d():
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 32, 2)), jnp.float32)
    return cells, grid


def test_apply_shim_matches_functional():
    cells, grid = _data2d()
    a = cst.CosineSampler2d.apply(cells, grid, "zeros", True, "cosine", True)
    b = cst.cosine_sampler_2d(cells, grid, backend="xla")
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_apply_shim_3d():
    rng = np.random.RandomState(1)
    cells = jnp.asarray(rng.rand(3, 2, 6, 6, 6), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 1, 1, 16, 3)), jnp.float32)
    a = cst.CosineSampler3d.apply(cells, grid, "zeros", True, "cosine", True)
    b = cst.cosine_sampler_3d(cells, grid, backend="xla")
    np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.parametrize("kernel", ["cosine", "smoothstep"])
def test_align_corners_false_multicell(kernel):
    """align_corners=False + multicell: the non-align unnormalize branch
    (+ offset) must match the oracle (the reference's 2D forward hardcodes
    align=True — documented deviation, coords.py)."""
    cells, grid = _data2d()
    cfg = SamplerConfig(dim=2, kernel=kernel, align_corners=False,
                        multicell=True, backend="xla")
    out = cst.sample(cells, grid, cfg)
    want = generic.blend(cells, grid, cfg, (0, 0))
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # and the multicell offset actually shifted cells apart
    assert float(jnp.abs(out[0] - out[1]).max()) > 1e-4


def test_distributed_initialize_single_process():
    from cosinesampler_tpu.parallel.distributed import initialize
    assert initialize() >= 1
