"""Large volumes exceed the VMEM-resident kernel budget and must route to
the XLA path transparently (BASELINE.md config 5 is 16 cells x 128^3)."""

import jax
import jax.numpy as jnp
import numpy as np

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.ops import fused, generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample


def test_fused_large_volume_routes_to_xla_and_matches_oracle():
    cfg = SamplerConfig(dim=3, backend="pallas")  # force-request pallas
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(4, 4, 64, 64, 64), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)), jnp.float32)

    assert not pb._fits_vmem(cells.shape, pb.FUSED_Q_BLOCK[3],
                             whole_stack=True)
    out = fused.sample_features_with_derivs(cells, pts, cfg)
    want = fused.xla_fused_blend(cells, pts, cfg)
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_sample_large_volume_routes_to_slab(monkeypatch):
    """Over-VMEM volumes now ride the slab-decomposed v1 kernels
    (ops/pallas/slab.py) instead of the XLA fallback whose 3D legs fault
    the TPU runtime under lax.scan (BENCHMARKS.md)."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(1)
    cells = jnp.asarray(rng.rand(4, 4, 64, 64, 64), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 1, 64, 3)), jnp.float32)
    out = sample(cells, grid, cfg)
    want = generic.blend(cells, grid, cfg, (0, 0, 0))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda c: sample(c, grid, cfg).sum())(cells)
    gw = jax.grad(lambda c: generic.blend(c, grid, cfg, (0, 0, 0)).sum())(cells)
    np.testing.assert_allclose(g, gw, rtol=1e-5, atol=1e-5)


def test_sample_f64_large_volume_routes_to_xla():
    """f64 stays on the exact XLA path at any size (the kernels are f32)."""
    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(2)
    cells = jnp.asarray(rng.rand(2, 2, 72, 72, 72), jnp.float64)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1, 1, 32, 3)), jnp.float64)
    out = sample(cells, grid, cfg)   # would raise on CPU if pallas ran
    want = generic.blend(cells, grid, cfg, (0, 0, 0))
    np.testing.assert_allclose(out, want, rtol=1e-12, atol=1e-12)


def test_reference_16cube_still_uses_pallas_budget():
    assert pb._fits_vmem((96, 4, 16, 16), pb.DEFAULT_Q_BLOCK,
                         whole_stack=False)
    assert pb._fits_vmem((50, 4, 16, 16, 16), pb.FUSED_Q_BLOCK[3],
                         whole_stack=True)
