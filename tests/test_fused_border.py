"""Border padding through the shared-support fused kernels (v2-v5).

Reference semantics: clip_coordinates clamps into [0, size-1] and its
gradient factor zeroes at/beyond the borders (cosine_sampler_2d_kernel.cu:
90-116, 175-193).  The XLA fused oracle (generic.blend per row) already
implements them; these tests pin every fused Pallas generation against it,
including far-OOB queries (which clamp to edge texels — the big behavioral
difference from zeros) and the derivative rows (where the clip zeroes the
chain factor per cell).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused2d, fused3b, fused3d, fused3s, fused3w

N_CELL, C, Q = 5, 3, 150


def _cfg(dim, multicell=True, kernel="cosine"):
    return SamplerConfig(dim=dim, kernel=kernel, multicell=multicell,
                         padding_mode="border", backend="pallas")


def _pts(dim, seed, lo=-1.8, hi=1.8):
    # span far OOB on purpose: border clamps instead of zeroing
    return jnp.asarray(np.random.RandomState(seed).uniform(lo, hi, (Q, dim)),
                       jnp.float32)


def _cells(dim, seed, spatial=None):
    spatial = spatial or (6,) * dim
    return jnp.asarray(np.random.RandomState(seed).rand(N_CELL, C, *spatial),
                       jnp.float32)


def _check_blend(fn, cells, pts, cfg, **kw):
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fn(cells, pts, cfg, interpret=True, **kw)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


def _check_bwd(fn, spatial, pts, cfg, seed=99):
    g = jnp.asarray(np.random.RandomState(seed).rand(1 + 2 * cfg.dim, C, Q),
                    jnp.float32)
    want = fused.xla_fused_bwd(g, pts, spatial, cfg, N_CELL)
    got = fn(g, pts, spatial, cfg, N_CELL, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
@pytest.mark.parametrize("kernel", ["cosine", "linear"])
def test_border_v2_2d(multicell, kernel):
    cfg = _cfg(2, multicell, kernel)
    _check_blend(fused2d.pallas_fused2_blend, _cells(2, 0), _pts(2, 1), cfg,
                 q_block=64)
    _check_bwd(fused2d.pallas_fused2_bwd, (6, 6), _pts(2, 2), cfg)


def test_border_v2_2d_boundary_queries():
    # queries exactly on the clamp boundary and on texel planes
    cfg = _cfg(2)
    ticks = np.linspace(-1.0, 1.0, 5).tolist() + [-1.0, 1.0, -0.999, 0.999]
    rng = np.random.RandomState(3)
    pts = jnp.asarray(np.stack([rng.choice(ticks, Q), rng.choice(ticks, Q)],
                               axis=1), jnp.float32)
    _check_blend(fused2d.pallas_fused2_blend, _cells(2, 4), pts, cfg,
                 q_block=64)


@pytest.mark.parametrize("multicell", [True, False])
def test_border_v2_3d(multicell):
    cfg = _cfg(3, multicell)
    _check_blend(fused3d.pallas_fused3_blend, _cells(3, 5), _pts(3, 6), cfg,
                 q_block=64)
    _check_bwd(fused3d.pallas_fused3_bwd, (6, 6, 6), _pts(3, 7), cfg)


def test_border_v3_zbinned():
    cfg = _cfg(3)
    _check_blend(fused3s.pallas_fused3s_blend, _cells(3, 8), _pts(3, 9), cfg,
                 q_block=64)
    _check_bwd(fused3s.pallas_fused3s_bwd, (6, 6, 6), _pts(3, 10), cfg)


def test_border_v5_windowed():
    cfg = _cfg(3)
    _check_blend(fused3w.pallas_fused3w_blend, _cells(3, 11), _pts(3, 12),
                 cfg, q_block=64)
    _check_bwd(fused3w.pallas_fused3w_bwd, (6, 6, 6), _pts(3, 13), cfg)


def test_border_v4_bricked():
    cfg = _cfg(3)
    cells = _cells(3, 14, spatial=(5, 9, 20))
    pts = _pts(3, 15)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = fused3b.pallas_fused3b_blend(cells, pts, cfg, q_block=64,
                                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)
    g = jnp.asarray(np.random.RandomState(16).rand(7, C, Q), jnp.float32)
    want_b = fused.xla_fused_bwd(g, pts, (5, 9, 20), cfg, N_CELL)
    got_b = fused3b.pallas_fused3b_bwd(g, pts, (5, 9, 20), cfg, N_CELL,
                                       q_block=64, interpret=True)
    np.testing.assert_allclose(got_b, want_b, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("multicell", [True, False])
@pytest.mark.parametrize("align", [True, False])
def test_reflection_v2_2d(multicell, align):
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=multicell,
                        align_corners=align, padding_mode="reflection",
                        backend="pallas")
    _check_blend(fused2d.pallas_fused2_blend, _cells(2, 20), _pts(2, 21),
                 cfg, q_block=64)
    _check_bwd(fused2d.pallas_fused2_bwd, (6, 6), _pts(2, 22), cfg)


@pytest.mark.parametrize("multicell", [True, False])
def test_reflection_v2_3d(multicell):
    cfg = SamplerConfig(dim=3, multicell=multicell,
                        padding_mode="reflection", backend="pallas")
    _check_blend(fused3d.pallas_fused3_blend, _cells(3, 23), _pts(3, 24),
                 cfg, q_block=64)
    _check_bwd(fused3d.pallas_fused3_bwd, (6, 6, 6), _pts(3, 25), cfg)


def test_reflection_fold_boundary_queries():
    # queries whose per-cell offsets straddle the fold line: the 4-shift
    # widened patch (s = -1) must engage
    cfg = SamplerConfig(dim=2, padding_mode="reflection", backend="pallas")
    eps = np.linspace(-0.2, 0.2, Q)
    pts = jnp.asarray(np.stack([1.0 + eps, -1.0 + eps], axis=1), jnp.float32)
    _check_blend(fused2d.pallas_fused2_blend, _cells(2, 26), pts, cfg,
                 q_block=64)


def test_padding_supports_matrix():
    budget = 6 << 20
    border3 = SamplerConfig(dim=3, padding_mode="border")
    assert fused3w.supports(border3, (50, 4, 16, 16, 16), budget,
                            n_queries=100_000)
    assert fused2d.supports(SamplerConfig(dim=2, padding_mode="border"),
                            (96, 4, 16, 16), budget)
    # reflection: the widened 4-shift patch runs through the VMEM-resident
    # generations AND the binned windowed/bricked generations (4-slab
    # windows, folded-coordinate binning); only v3 z-slabs stay out
    refl = SamplerConfig(dim=3, padding_mode="reflection")
    assert fused3d.supports(refl, (50, 4, 16, 16, 16), budget)
    assert fused2d.supports(SamplerConfig(dim=2,
                                          padding_mode="reflection"),
                            (96, 4, 16, 16), budget)
    assert fused3w.supports(refl, (50, 4, 16, 16, 16), budget,
                            n_queries=100_000)
    assert not fused3s.supports(refl, (50, 4, 16, 16, 16), budget,
                                n_queries=100_000)
    assert fused3b.supports(refl, (50, 4, 16, 16, 16), budget,
                            n_queries=100_000)
