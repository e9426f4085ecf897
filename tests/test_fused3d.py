"""v2 shared-support 3D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused3d import (pallas_fused3_blend,
                                                  pallas_fused3_bwd, supports)

N_CELL, C, Q = 5, 3, 120


def _data(seed=0, lo=-0.95, hi=0.95):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, 6, 6, 6), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 3)), jnp.float32)
    return cells, pts


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v3_blend_matches_xla(kernel, multicell):
    cfg = SamplerConfig(dim=3, kernel=kernel, multicell=multicell,
                        backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3_blend_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
def test_v3_bwd_matches_xla(multicell):
    cfg = SamplerConfig(dim=3, multicell=multicell, backend="pallas")
    cells, pts = _data(3)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = pallas_fused3_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=64,
                            interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    budget = 6 << 20
    assert supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget)
    # border and reflection are in scope since round 2 (prep.py)
    assert supports(SamplerConfig(dim=3, padding_mode="border"),
                    (50, 4, 16, 16, 16), budget)
    assert supports(SamplerConfig(dim=3, padding_mode="reflection"),
                    (50, 4, 16, 16, 16), budget)
    assert not supports(SamplerConfig(dim=2), (50, 4, 16, 16), budget)
    # 64^3: one A panel alone is 64^3*256*4 = 256 MB -> falls back
    assert not supports(SamplerConfig(dim=3), (4, 4, 64, 64, 64), budget)
