"""v2 shared-support 2D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused2d import (pallas_fused2_blend,
                                                  pallas_fused2_bwd, supports)

N_CELL, C, Q = 6, 3, 150


def _data(seed=0, lo=-0.95, hi=0.95):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, 8, 8), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 2)), jnp.float32)
    return cells, pts


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
@pytest.mark.parametrize("align_corners", [True, False])
def test_v2_blend_matches_xla(kernel, multicell, align_corners):
    cfg = SamplerConfig(dim=2, kernel=kernel, multicell=multicell,
                        align_corners=align_corners, backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v2_blend_oob_queries():
    """Out-of-range queries must reproduce the zeros-padding drop."""
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.8, 1.8, (Q, 2)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
def test_v2_bwd_matches_xla(multicell):
    cfg = SamplerConfig(dim=2, multicell=multicell, backend="pallas")
    cells, pts = _data(3)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(5, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (8, 8), cfg, N_CELL)
    got = pallas_fused2_bwd(g, pts, (8, 8), cfg, N_CELL, q_block=64,
                            interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    assert supports(SamplerConfig(dim=2, padding_mode="zeros"),
                    (96, 4, 16, 16), 6 << 20)
    # border and reflection are in scope since round 2 (prep.py)
    assert supports(SamplerConfig(dim=2, padding_mode="border"),
                    (96, 4, 16, 16), 6 << 20)
    assert supports(SamplerConfig(dim=2, padding_mode="reflection"),
                    (96, 4, 16, 16), 6 << 20)
    assert not supports(SamplerConfig(dim=3), (8, 4, 16, 16, 16), 6 << 20)
    assert not supports(SamplerConfig(dim=2), (512, 64, 64, 64), 6 << 20)
