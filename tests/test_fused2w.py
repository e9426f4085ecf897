"""v5 windowed 2D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused2w import (pallas_fused2w_blend,
                                                  pallas_fused2w_bwd,
                                                  supports)

N_CELL, C, Q = 5, 3, 150


def _data(seed=0, lo=-0.95, hi=0.95, spatial=(6, 6)):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 2)), jnp.float32)
    return cells, pts


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v2w_blend_matches_xla(kernel, multicell):
    cfg = SamplerConfig(dim=2, kernel=kernel, multicell=multicell,
                        backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_v2w_blend_oob_queries(padding):
    cfg = SamplerConfig(dim=2, padding_mode=padding, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.7, 1.7, (Q, 2)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v2w_blend_boundary_queries():
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells, _ = _data(5)
    s = 6
    eff = s - 1 - 1
    ticks = np.linspace(-1.0, 1.0, eff + 1)
    rng = np.random.RandomState(6)
    pts = jnp.asarray(np.stack([rng.choice(ticks, Q), rng.choice(ticks, Q)],
                               axis=1), jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v2w_blend_reference_shape():
    # the flagship 16x16 geometry: gy=6, window 8x16 -> K=128
    cfg = SamplerConfig(dim=2, backend="pallas")
    rng = np.random.RandomState(7)
    cells = jnp.asarray(rng.rand(8, 4, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (500, 2)), jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=128, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v2w_bwd_matches_xla(padding, multicell):
    cfg = SamplerConfig(dim=2, padding_mode=padding, multicell=multicell,
                        backend="pallas")
    cells, pts = _data(3, lo=-1.4, hi=1.4)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(5, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6), cfg, N_CELL)
    got = pallas_fused2w_bwd(g, pts, (6, 6), cfg, N_CELL, q_block=64,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v2w_bwd_reference_shape():
    cfg = SamplerConfig(dim=2, backend="pallas")
    rng = np.random.RandomState(9)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (500, 2)), jnp.float32)
    g = jnp.asarray(rng.rand(5, 4, 500), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (16, 16), SamplerConfig(dim=2), 8)
    got = pallas_fused2w_bwd(g, pts, (16, 16), cfg, 8, q_block=128,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    budget = 6 << 20
    assert supports(SamplerConfig(dim=2), (96, 4, 16, 16), budget,
                    n_queries=100_000)
    assert supports(SamplerConfig(dim=2, padding_mode="border"),
                    (96, 4, 16, 16), budget, n_queries=100_000)
    assert supports(SamplerConfig(dim=2, padding_mode="reflection"),
                    (96, 4, 16, 16), budget, n_queries=100_000)
    assert not supports(SamplerConfig(dim=2), (96, 4, 16, 16), budget,
                        n_queries=200)
    assert not supports(SamplerConfig(dim=3), (50, 4, 16, 16, 16), budget)


def test_pick_q_block_reference_vs_wide():
    from cosinesampler_tpu.ops.pallas.fused2w import pick_q_block
    cfg = SamplerConfig(dim=2)
    # reference shape: K = 128, the full default block fits
    assert pick_q_block(cfg, (96, 4, 16, 16)) == 512
    # wide grid: K = rows*Wp = 4096 -> the (K, Qb) hit panel forces a
    # smaller block instead of falling off the fast path entirely
    qb = pick_q_block(cfg, (16, 4, 1024, 1024))
    assert qb in (128, 256)
    assert supports(cfg, (16, 4, 1024, 1024), 6 << 20, n_queries=1_000_000)
    # a wide grid with a big ensemble blows the window scratch: no block
    # size helps, supports() must reject (-> XLA path)
    assert pick_q_block(cfg, (96, 4, 1024, 1024)) is None
    assert not supports(cfg, (96, 4, 1024, 1024), 6 << 20,
                        n_queries=1_000_000)


def test_ybin_sorted_branch_matches_onehot(monkeypatch):
    """The sort+boundary-scatter binning (tall grids) must produce the
    exact slot layout of the dense one-hot counting sort."""
    from cosinesampler_tpu.ops.pallas import fused2w
    cfg = SamplerConfig(dim=2)
    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.uniform(-1.3, 1.3, (700, 2)), jnp.float32)
    h, gy, qb = 40, 6, 64
    ref = [np.asarray(x) for x in fused2w._ybin(pts, h, cfg, qb, gy)[:5]
           if not np.isscalar(x)]
    monkeypatch.setattr(fused2w, "_ONEHOT_RANK_BYTES", 0)
    got = [np.asarray(x) for x in fused2w._ybin(pts, h, cfg, qb, gy)[:5]
           if not np.isscalar(x)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_v2w_wide_grid_sorted_bin_parity(monkeypatch, padding):
    """Wide-grid config through the kernels with the sorted binning branch
    forced on (the branch large grids take at real query counts)."""
    from cosinesampler_tpu.ops.pallas import fused2w
    monkeypatch.setattr(fused2w, "_ONEHOT_RANK_BYTES", 0)
    cfg = SamplerConfig(dim=2, padding_mode=padding, backend="pallas")
    rng = np.random.RandomState(12)
    cells = jnp.asarray(rng.rand(3, 2, 40, 130), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (301, 2)), jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)
    g = jnp.asarray(rng.rand(5, 2, 301), jnp.float32)
    want_b = fused.xla_fused_bwd(g, pts, (40, 130), cfg, 3)
    got_b = pallas_fused2w_bwd(g, pts, (40, 130), cfg, 3, q_block=64,
                               interpret=True)
    # w'' terms reach ~2e4 here; slot-order accumulation differs from the
    # XLA scatter order, so allow f32 summation noise at that magnitude.
    np.testing.assert_allclose(got_b, want_b, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("sb", [2, 4])
@pytest.mark.parametrize("padding", ["zeros", "reflection"])
def test_v2w_subblocked_matches_sb1(sb, padding):
    """sb sub-groups per grid step must be a pure grid re-cut: identical
    query-ordered output and cells-cotangent to the sb=1 kernels."""
    cfg = SamplerConfig(dim=2, padding_mode=padding, backend="pallas")
    cells, pts = _data(21, lo=-1.3, hi=1.3)
    want = pallas_fused2w_blend(cells, pts, cfg, q_block=64, interpret=True)
    got = pallas_fused2w_blend(cells, pts, cfg, q_block=64, sb=sb,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    g = jnp.asarray(np.random.RandomState(22).rand(5, C, Q), jnp.float32)
    want_b = pallas_fused2w_bwd(g, pts, (6, 6), cfg, N_CELL, q_block=64,
                                interpret=True)
    got_b = pallas_fused2w_bwd(g, pts, (6, 6), cfg, N_CELL, q_block=64,
                               sb=sb, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))


def test_v2w_subblocked_padded_roundtrip_with_plan():
    """Slot-resident fwd/bwd under sb>1 with a precomputed (un-sb-padded)
    plan: the padded slot count grows to a multiple of sb*q_block, padding
    slots stay zero/flagged, and the bwd accepts the grown cotangent."""
    from cosinesampler_tpu.ops.pallas.fused2w import (
        make_plan, pallas_fused2w_blend_padded, pallas_fused2w_bwd_padded)
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells, pts = _data(23)
    qb, sb = 64, 4
    plan = make_plan(pts, (6, 6), cfg, q_block=qb, sb=sb)
    out_p, occ, pos = pallas_fused2w_blend_padded(
        cells, pts, cfg, q_block=qb, sb=sb, interpret=True, plan=plan)
    assert out_p.shape[-1] % (sb * qb) == 0
    assert occ.shape[0] == out_p.shape[-1]
    # padding slots are zero
    np.testing.assert_array_equal(
        np.asarray(out_p)[..., np.asarray(occ) == 0], 0.0)
    # query-ordered parity with the XLA oracle
    ordered = np.asarray(out_p.reshape(5 * C, -1)[:, pos]).reshape(5, C, Q)
    want = np.asarray(fused.xla_fused_blend(cells, pts, cfg))
    np.testing.assert_allclose(ordered, want, rtol=3e-4, atol=1e-4)
    # bwd from the padded cotangent == bwd from the query-ordered one
    rng = np.random.RandomState(24)
    g = jnp.asarray(rng.rand(5, C, Q), jnp.float32)
    from cosinesampler_tpu.ops.pallas.fused3b import scatter_to_slots
    qp = out_p.shape[-1]
    g_p = scatter_to_slots(
        g.reshape(5 * C, Q).T, pos, qp).T.reshape(5, C, qp)
    got_b = pallas_fused2w_bwd_padded(g_p, pts, (6, 6), cfg, N_CELL,
                                      q_block=qb, sb=sb, interpret=True,
                                      plan=plan)
    want_b = pallas_fused2w_bwd(g, pts, (6, 6), cfg, N_CELL, q_block=qb,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-6)
