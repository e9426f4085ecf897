"""dtype handling: bf16 cells, f32 grids, output dtype follows the input."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample


def test_bf16_cells_sample():
    rng = np.random.RandomState(0)
    cells32 = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 64, 2)), jnp.float32)
    cfg = SamplerConfig(dim=2, backend="xla")
    out16 = sample(cells32.astype(jnp.bfloat16), grid, cfg)
    out32 = sample(cells32, grid, cfg)
    # bf16 cells x f32 grid promote to f32 compute/output (both backends)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(out16, out32, rtol=2e-2, atol=2e-2)


def test_bf16_cells_fused():
    rng = np.random.RandomState(1)
    cells32 = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)), jnp.float32)
    cfg = SamplerConfig(dim=2, backend="xla")
    out16 = fused.sample_features_with_derivs(
        cells32.astype(jnp.bfloat16), pts, cfg)
    out32 = fused.sample_features_with_derivs(cells32, pts, cfg)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(out16, out32, rtol=3e-2, atol=0.3)


def test_f64_exactness_xla_backend():
    rng = np.random.RandomState(2)
    cells = jnp.asarray(rng.rand(4, 2, 8, 8))          # f64 under x64
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 64, 2)))
    cfg = SamplerConfig(dim=2, backend="xla")
    out = sample(cells, grid, cfg)
    assert out.dtype == jnp.float64
    g = jax.grad(lambda c: sample(c, grid, cfg).sum())(cells)
    assert g.dtype == jnp.float64


def test_f64_routes_past_pallas_kernels():
    """f64 + backend='pallas' must use the exact XLA path, not silently
    compute in f32 (the kernels are f32-internal)."""
    rng = np.random.RandomState(3)
    cells = jnp.asarray(rng.rand(4, 2, 8, 8))          # f64 under x64
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 64, 2)))
    pcfg = SamplerConfig(dim=2, backend="pallas")
    xcfg = SamplerConfig(dim=2, backend="xla")
    out_p = sample(cells, grid, pcfg)
    out_x = sample(cells, grid, xcfg)
    assert out_p.dtype == jnp.float64
    # bit-identical: proof the f64 request did not round-trip through f32
    np.testing.assert_array_equal(out_p, out_x)

    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)))
    f_p = fused.sample_features_with_derivs(cells, pts, pcfg)
    f_x = fused.sample_features_with_derivs(cells, pts, xcfg)
    assert f_p.dtype == jnp.float64
    np.testing.assert_array_equal(f_p, f_x)


def test_f16_cells_sample():
    """float16 (the reference's AT_DISPATCH..._AND_HALF case) promotes to
    the grid dtype like bf16 does."""
    rng = np.random.RandomState(4)
    cells32 = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 64, 2)), jnp.float32)
    cfg = SamplerConfig(dim=2, backend="xla")
    out16 = sample(cells32.astype(jnp.float16), grid, cfg)
    out32 = sample(cells32, grid, cfg)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(out16, out32, rtol=2e-3, atol=2e-3)
