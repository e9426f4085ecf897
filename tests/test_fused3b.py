"""v4 bricked large-volume 3D fused kernels vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused3b import (_brick_bin,
                                                  pallas_fused3b_blend,
                                                  pallas_fused3b_bwd,
                                                  supports)

N_CELL, C, Q = 3, 2, 160


def _data(seed=0, lo=-0.95, hi=0.95, shape=(6, 6, 6)):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *shape), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 3)), jnp.float32)
    return cells, pts


def test_brick_bin_partition():
    _, pts = _data(7, lo=-1.7, hi=1.7)   # include OOB
    cfg = SamplerConfig(dim=3)
    positions, occ, z0, y0, hasv, qp = _brick_bin(pts, 6, 6, cfg, 32, 2)
    positions = np.asarray(positions)
    occ = np.asarray(occ)
    assert len(set(positions.tolist())) == Q
    assert positions.min() >= 0 and positions.max() < qp
    # occupancy marks exactly the assigned slots
    assert occ.sum() == Q
    assert (occ[positions] == 1.0).all()
    # block origins lie inside the padded volume
    z0 = np.asarray(z0)
    y0 = np.asarray(y0)
    assert z0.min() >= 0 and (z0 + 3).max() <= 6 + 4
    nby = -(-(6 + 2) // 2)
    assert y0.min() >= 0 and (y0 + 4).max() <= nby * 2 + 2
    # hasv marks exactly the blocks whose first slot is occupied
    hasv = np.asarray(hasv)
    assert (hasv == (occ[np.arange(len(hasv)) * 32] > 0)).all()


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v3b_blend_matches_xla(kernel, multicell):
    cfg = SamplerConfig(dim=3, kernel=kernel, multicell=multicell,
                        backend="pallas")
    cells, pts = _data()
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3b_blend(cells, pts, cfg, q_block=32, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_blend_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(1)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3b_blend(cells, pts, cfg, q_block=32, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_blend_noncubic():
    # distinct d/h/w exercise the axis bookkeeping (z bins, y groups, x)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(4, shape=(5, 7, 9))
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused3b_blend(cells, pts, cfg, q_block=32, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
def test_v3b_bwd_matches_xla(multicell):
    cfg = SamplerConfig(dim=3, multicell=multicell, backend="pallas")
    cells, pts = _data(3)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = pallas_fused3b_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=32,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_bwd_oob_queries():
    cfg = SamplerConfig(dim=3, backend="pallas")
    pts = jnp.asarray(np.random.RandomState(8).uniform(-1.7, 1.7, (Q, 3)),
                      jnp.float32)
    g = jnp.asarray(np.random.RandomState(9).rand(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6),
                               SamplerConfig(dim=3), N_CELL)
    got = pallas_fused3b_bwd(g, pts, (6, 6, 6), cfg, N_CELL, q_block=32,
                             interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_supports_gating():
    budget = 6 << 20
    big = (16, 4, 128, 128, 128)
    assert supports(SamplerConfig(dim=3), big, budget)
    assert supports(SamplerConfig(dim=3), big, budget, n_queries=1_000_000)
    # too few queries for ~8.5k bins -> XLA fallback
    assert not supports(SamplerConfig(dim=3), big, budget, n_queries=10_000)
    assert supports(SamplerConfig(dim=3, padding_mode="reflection"), big,
                    budget)
    assert not supports(SamplerConfig(dim=2), (50, 4, 16, 16), budget)
    # W not 128-aligned: handled via internal lane padding
    assert supports(SamplerConfig(dim=3), (16, 4, 128, 128, 64), budget,
                    n_queries=1_000_000)


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_v3b_bwd_ghost_matches_serialized(padding):
    """The ghost-accumulator gradient (private per-super-brick blocks +
    fold epilogue) is bit-comparable to the serialized-RMW one — same
    per-block contributions, different accumulation route (round 5;
    ghost is OPT-IN after measuring a net loss at 128^3, fused3b.py)."""
    cfg = SamplerConfig(dim=3, padding_mode=padding, backend="pallas")
    cells, pts = _data(11, lo=-1.2, hi=1.2, shape=(10, 12, 9))
    rng = np.random.RandomState(12)
    g = jnp.asarray(rng.randn(7, C, Q), jnp.float32)
    ser = pallas_fused3b_bwd(g, pts, (10, 12, 9), cfg, N_CELL,
                             interpret=True, ghost=False)
    gho = pallas_fused3b_bwd(g, pts, (10, 12, 9), cfg, N_CELL,
                             interpret=True, ghost=True)
    np.testing.assert_allclose(gho, ser, rtol=1e-5, atol=1e-5)


def test_v3b_sub_blocking_bit_identical():
    """sb > 1 groups query blocks per grid step without touching the slot
    layout or any numerics — outputs must be bit-identical to sb=1."""
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(13, shape=(10, 12, 9))
    rng = np.random.RandomState(14)
    g = jnp.asarray(rng.randn(7, C, Q), jnp.float32)
    b1 = pallas_fused3b_blend(cells, pts, cfg, interpret=True, sb=1)
    b4 = pallas_fused3b_blend(cells, pts, cfg, interpret=True, sb=4)
    np.testing.assert_array_equal(np.asarray(b4), np.asarray(b1))
    w1 = pallas_fused3b_bwd(g, pts, (10, 12, 9), cfg, N_CELL,
                            interpret=True, ghost=False, sb=1)
    w4 = pallas_fused3b_bwd(g, pts, (10, 12, 9), cfg, N_CELL,
                            interpret=True, ghost=False, sb=4)
    np.testing.assert_array_equal(np.asarray(w4), np.asarray(w1))
