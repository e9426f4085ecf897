"""v5 windowed 3D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused3w import (_win_rows, _xpad,
                                                  pallas_fused3w_blend,
                                                  pallas_fused3w_bwd,
                                                  supports)

N_CELL, C, Q = 5, 3, 120


def _data(seed=0, lo=-0.95, hi=0.95, spatial=(6, 6, 6)):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 3)), jnp.float32)
    return cells, pts


def test_window_geometry():
    assert _xpad(6) == 8 and _xpad(16) == 16 and _xpad(100) == 128
    assert _xpad(130) == 256
    assert _win_rows(16) == 8 and _win_rows(32) == 4
    assert _win_rows(8) == 16 and _win_rows(128) == 4 and _win_rows(256) == 4


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v3w_blend_matches_xla(kernel, multicell):
    cfg = SamplerConfig(dim=3, kernel=kernel, multicell=multicell,
                        backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_blend_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_blend_boundary_queries():
    # queries exactly on texel planes: floor(base) boundary cases must agree
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(5)
    s = 6
    eff = s - 1 - 1  # align_corners + multicell effective span
    ticks = np.linspace(-1.0, 1.0, eff + 1)
    rng = np.random.RandomState(6)
    pts = np.stack([rng.choice(ticks, Q), rng.choice(ticks, Q),
                    rng.choice(ticks, Q)], axis=1)
    pts = jnp.asarray(pts, jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_blend_wide_volume():
    # W=20 -> wp=32, rows=4, gy=2: exercises x padding + multi-row y bins
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(11, spatial=(5, 9, 20))
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
def test_v3w_bwd_matches_xla(multicell):
    cfg = SamplerConfig(dim=3, multicell=multicell, backend="pallas")
    cells, pts = _data(3)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = pallas_fused3w_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_bwd_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    pts = jnp.asarray(np.random.RandomState(8).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    g = jnp.asarray(np.random.RandomState(9).rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6),
                               SamplerConfig(dim=3), N_CELL)
    got = pallas_fused3w_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_bwd_wide_volume():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(12, spatial=(5, 9, 20))
    g = jnp.asarray(np.random.RandomState(13).rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (5, 9, 20), cfg, N_CELL)
    got = pallas_fused3w_bwd(g, pts, (5, 9, 20), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    budget = 6 << 20
    # the reference 3D workload
    assert supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget,
                    n_queries=100_000)
    # small query clouds fall back (bin padding dominates)
    assert not supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget,
                        n_queries=120)
    assert supports(SamplerConfig(dim=3, padding_mode="border"),
                    (50, 4, 16, 16, 16), budget, n_queries=100_000)
    assert supports(SamplerConfig(dim=3, padding_mode="reflection"),
                    (50, 4, 16, 16, 16), budget, n_queries=100_000)
    assert not supports(SamplerConfig(dim=2), (50, 4, 16, 16), budget)
    # mid-size volumes that v3 rejects are in scope for v5
    assert supports(SamplerConfig(dim=3), (16, 4, 32, 32, 32), budget,
                    n_queries=1_000_000)
    assert supports(SamplerConfig(dim=3), (16, 4, 64, 64, 64), budget,
                    n_queries=1_000_000)
    # 128^3 window array exceeds the HBM budget -> v4 bricked kernels
    assert not supports(SamplerConfig(dim=3), (16, 4, 128, 128, 128), budget,
                        n_queries=1_000_000)
