"""Chunked XLA-fallback transpose (large query clouds) == direct."""

import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig


def test_chunked_bwd_matches_direct(monkeypatch):
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=2, backend="xla")
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (100, 2)), jnp.float32)
    g = jnp.asarray(rng.rand(5, 3, 100), jnp.float32)

    direct = fused.xla_fused_bwd(g, pts, (8, 8), cfg, 4)
    monkeypatch.setattr(fused, "BWD_CHUNK", 32)  # uneven: 100 -> 4 chunks
    chunked = fused.xla_fused_bwd(g, pts, (8, 8), cfg, 4)
    np.testing.assert_allclose(chunked, direct, rtol=1e-5, atol=1e-4)


def test_chunked_bwd_3d(monkeypatch):
    rng = np.random.RandomState(1)
    cfg = SamplerConfig(dim=3, backend="xla")
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (70, 3)), jnp.float32)
    g = jnp.asarray(rng.rand(7, 2, 70), jnp.float32)

    direct = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, 3)
    monkeypatch.setattr(fused, "BWD_CHUNK", 16)
    chunked = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, 3)
    np.testing.assert_allclose(chunked, direct, rtol=1e-5, atol=1e-4)
