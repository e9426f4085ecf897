"""Reflection padding through the v5 windowed kernels (widened 4-shift
patch, folded-coordinate binning) vs the XLA fused reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused2w, fused3w

N_CELL, C, Q = 5, 3, 160


def _data(dim, seed=0, lo=-1.7, hi=1.7, spatial=None):
    spatial = spatial or (6,) * dim
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, dim)), jnp.float32)
    return cells, pts


def _boundary_pts(dim, size, seed, multicell=True):
    """Queries exactly on texel planes and near the reflection folds."""
    eff = size - 1 - (1 if multicell else 0)
    ticks = np.linspace(-1.0, 1.0, eff + 1)
    rng = np.random.RandomState(seed)
    cols = [rng.choice(ticks, Q) + rng.choice([0.0, 1e-6, -1e-6, 2.0, -2.0],
                                              Q)
            for _ in range(dim)]
    return jnp.asarray(np.stack(cols, -1), jnp.float32)


@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v3w_reflection_blend(kernel, multicell):
    cfg = SamplerConfig(dim=3, kernel=kernel, multicell=multicell,
                        padding_mode="reflection", backend="pallas")
    cells, pts = _data(3)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused3w.pallas_fused3w_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
def test_v3w_reflection_boundary(align):
    cfg = SamplerConfig(dim=3, padding_mode="reflection",
                        align_corners=align, backend="pallas")
    cells, _ = _data(3, 1)
    pts = _boundary_pts(3, 6, 2)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused3w.pallas_fused3w_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_reflection_bwd():
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    cells, pts = _data(3, 3)
    g = jnp.asarray(np.random.RandomState(4).randn(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = fused3w.pallas_fused3w_bwd(g, pts, (6, 6, 6), cfg, N_CELL,
                                     q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3w_reflection_padded_consistent():
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    cells, pts = _data(3, 5)
    want = fused3w.pallas_fused3w_blend(cells, pts, cfg, q_block=64,
                                        interpret=True)
    out_p, occ, positions = fused3w.pallas_fused3w_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    got = out_p.reshape(7 * C, qp)[:, positions].reshape(7, C, Q)
    np.testing.assert_array_equal(got, want)
    assert np.asarray(occ).sum() == Q


@pytest.mark.parametrize("kernel", ["cosine", "linear"])
@pytest.mark.parametrize("multicell", [True, False])
def test_v2w_reflection_blend(kernel, multicell):
    cfg = SamplerConfig(dim=2, kernel=kernel, multicell=multicell,
                        padding_mode="reflection", backend="pallas")
    cells, pts = _data(2, spatial=(8, 8))
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused2w.pallas_fused2w_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
def test_v2w_reflection_boundary(align):
    cfg = SamplerConfig(dim=2, padding_mode="reflection",
                        align_corners=align, backend="pallas")
    cells, _ = _data(2, 1, spatial=(8, 8))
    pts = _boundary_pts(2, 8, 6)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused2w.pallas_fused2w_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v2w_reflection_bwd():
    cfg = SamplerConfig(dim=2, padding_mode="reflection", backend="pallas")
    cells, pts = _data(2, 3, spatial=(8, 8))
    g = jnp.asarray(np.random.RandomState(4).randn(5, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (8, 8), cfg, N_CELL)
    got = fused2w.pallas_fused2w_bwd(g, pts, (8, 8), cfg, N_CELL,
                                     q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_zeros_geometry_unchanged():
    """The fp generalization must leave zeros/border geometry identical."""
    cfgz = SamplerConfig(dim=3, padding_mode="zeros")
    cfgr = SamplerConfig(dim=3, padding_mode="reflection")
    wp, rows, gy, nsh, fp = fused3w._win_geom(16, cfgz)
    assert (wp, rows, gy, nsh, fp) == (16, 8, 6, 3, 2)
    wp, rows, gy, nsh, fp = fused3w._win_geom(16, cfgr)
    assert (wp, rows, gy, nsh, fp) == (16, 8, 5, 4, 3)
    # wide volumes: reflection needs rows >= 2*fp for the overlap-add
    assert fused3w._win_geom(128, cfgr)[1] == 6
    assert fused3w._win_geom(128, cfgz)[1] == 4


def test_reflection_strict_span():
    """strict_reference reflection (always 2*(size-2) under align_corners)
    through the windowed kernel matches the XLA strict path."""
    cfg = SamplerConfig(dim=2, padding_mode="reflection", multicell=False,
                        strict_reference=True, backend="pallas")
    cells, pts = _data(2, 9, spatial=(8, 8))
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused2w.pallas_fused2w_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_reflection_blend():
    from cosinesampler_tpu.ops.pallas import fused3b
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    cells, pts = _data(3, 11)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused3b.pallas_fused3b_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_reflection_bwd():
    from cosinesampler_tpu.ops.pallas import fused3b
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    cells, pts = _data(3, 12)
    g = jnp.asarray(np.random.RandomState(13).randn(7, C, Q), jnp.float32)
    want = fused.xla_fused_bwd(g, pts, (6, 6, 6), cfg, N_CELL)
    got = fused3b.pallas_fused3b_bwd(g, pts, (6, 6, 6), cfg, N_CELL,
                                     q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def test_v3b_reflection_boundary():
    from cosinesampler_tpu.ops.pallas import fused3b
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    cells, _ = _data(3, 14)
    pts = _boundary_pts(3, 6, 15)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused3b.pallas_fused3b_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)
