"""v3 z-binned 3D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused3s import (_zbin, pallas_fused3s_blend,
                                                  pallas_fused3s_bwd, supports)

N_CELL, C, Q = 5, 3, 120


def _data(seed=0, lo=-0.95, hi=0.95):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, 6, 6, 6), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 3)), jnp.float32)
    return cells, pts


def test_zbin_partition():
    _, pts = _data(7, lo=-1.7, hi=1.7)   # include OOB
    cfg = SamplerConfig(dim=3)
    positions, inv, zfloor_block, valid, qp = _zbin(pts, 6, cfg, q_block=32)
    positions = np.asarray(positions)
    inv = np.asarray(inv)
    # positions is injective into [0, qp)
    assert len(set(positions.tolist())) == Q
    assert positions.min() >= 0 and positions.max() < qp
    # inv inverts positions; padding slots are -1
    assert (inv[positions] == np.arange(Q)).all()
    assert (np.asarray(valid) == (inv >= 0)).all()
    # every occupied slot's block has the query's own zfloor
    zb = np.asarray(zfloor_block)
    from cosinesampler_tpu.ops.coords import unnormalize
    base, _ = unnormalize(pts[:, 2], 6, cfg.align_corners, cfg.multicell, 0.0)
    fz = np.clip(np.floor(np.asarray(base)).astype(int), -2, 5)
    assert (zb[positions // 32] == fz).all()


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v3s_blend_matches_xla(kernel, multicell):
    cfg = SamplerConfig(dim=3, kernel=kernel, multicell=multicell,
                        backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3s_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3s_blend_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3s_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3s_blend_boundary_queries():
    # queries exactly on texel planes: floor(base) boundary cases must agree
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(5)
    s = 6
    eff = s - 1 - 1  # align_corners + multicell effective span
    ticks = np.linspace(-1.0, 1.0, eff + 1)  # normalized coords of texels
    rng = np.random.RandomState(6)
    pts = np.stack([rng.choice(ticks, Q), rng.choice(ticks, Q),
                    rng.choice(ticks, Q)], axis=1)
    pts = jnp.asarray(pts, jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3s_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
def test_v3s_bwd_matches_xla(multicell):
    cfg = SamplerConfig(dim=3, multicell=multicell, backend="pallas")
    cells, pts = _data(3)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = pallas_fused3s_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3s_bwd_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    pts = jnp.asarray(np.random.RandomState(8).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    g = jnp.asarray(np.random.RandomState(9).rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6),
                               SamplerConfig(dim=3), N_CELL)
    got = pallas_fused3s_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    budget = 6 << 20
    assert supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget)
    # small query clouds route to v2 (bin padding dominates below V3S_MIN_Q)
    assert supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget,
                    n_queries=100_000)
    assert not supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget,
                        n_queries=120)
    assert not supports(SamplerConfig(dim=3, padding_mode="reflection"),
                        (50, 4, 16, 16, 16), budget)
    assert not supports(SamplerConfig(dim=2), (50, 4, 16, 16), budget)
    # 64^3 volume: 4*4*64^3*4 = 16 MB resident -> falls back
    assert not supports(SamplerConfig(dim=3), (4, 4, 64, 64, 64), budget)
