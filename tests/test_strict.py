"""strict_reference mode: bit-faithful reproduction of the reference CUDA
coordinate quirks (cosine_sampler_2d_kernel.cu:185, :307-308), flag-gated
per SURVEY.md section 7 hard-part 2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu as cst
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig, effective_align
from cosinesampler_tpu.ops.coords import compute_source_coords
from cosinesampler_tpu.ops.pallas import (_fused_blend,
                                          _strict_mixed_align)
from cosinesampler_tpu.ops.pallas.kernels import pallas_blend, pallas_splat

S = 8


def _cells2d(seed=0, n=4):
    return jnp.asarray(np.random.RandomState(seed).rand(n, 2, S, S),
                       jnp.float32)


def _grid2d(coords):
    pts = jnp.asarray(coords, jnp.float32)          # (Q, 2)
    return jnp.broadcast_to(pts.reshape(1, 1, -1, 2), (1, 1, pts.shape[0], 2))


def test_effective_align():
    strict = SamplerConfig(dim=2, align_corners=False, strict_reference=True)
    assert effective_align(strict, (0, 0)) is True
    assert effective_align(strict, (1, 0)) is False
    loose = SamplerConfig(dim=2, align_corners=False)
    assert effective_align(loose, (0, 0)) is False
    strict3 = SamplerConfig(dim=3, align_corners=False, strict_reference=True)
    assert effective_align(strict3, (0, 0, 0)) is False


def test_strict_reflection_span_non_multicell():
    """Under strict + align_corners the fold span is 2*(size-2) even with
    multicell off (kernel.cu:185); default mode uses torch's 2*(size-1)."""
    # normalized coord for pixel x under align_corners non-multicell:
    # c = 2x/(size-1) - 1
    x_mid = S - 1.5                        # in (size-2, size-1): folds only
    c_mid = 2 * x_mid / (S - 1) - 1        # under the strict span
    x_fold = 2 * (S - 2) - x_mid           # its strict reflection image
    c_fold = 2 * x_fold / (S - 1) - 1

    got, _ = compute_source_coords(
        jnp.float32(c_mid), S, "reflection", True, False, 0.0, strict=True)
    np.testing.assert_allclose(float(got), x_fold, rtol=1e-6)
    got_loose, _ = compute_source_coords(
        jnp.float32(c_mid), S, "reflection", True, False, 0.0)
    np.testing.assert_allclose(float(got_loose), x_mid, rtol=1e-6)

    cfg_s = SamplerConfig(dim=2, padding_mode="reflection", multicell=False,
                          strict_reference=True, backend="xla")
    cells = _cells2d()
    out_mid = generic.blend(cells, _grid2d([[c_mid, 0.1]]), cfg_s, (0, 0))
    out_fold = generic.blend(cells, _grid2d([[c_fold, 0.1]]), cfg_s, (0, 0))
    np.testing.assert_allclose(out_mid, out_fold, rtol=1e-5)
    cfg_l = SamplerConfig(dim=2, padding_mode="reflection", multicell=False,
                          backend="xla")
    out_loose = generic.blend(cells, _grid2d([[c_mid, 0.1]]), cfg_l, (0, 0))
    assert float(jnp.abs(out_mid - out_loose).max()) > 1e-4


def test_strict_multicell_reflection_is_unchanged():
    # with multicell on, the default already folds over 2*(size-2)
    rng = np.random.RandomState(1)
    cells = _cells2d(1)
    grid = jnp.asarray(rng.uniform(-1.6, 1.6, (4, 1, 50, 2)), jnp.float32)
    for strict in (False, True):
        cfg = SamplerConfig(dim=2, padding_mode="reflection",
                            strict_reference=strict, backend="xla")
        out = generic.blend(cells, grid, cfg, (0, 0))
        if strict:
            np.testing.assert_array_equal(out, base)
        else:
            base = out


def test_strict_2d_forward_align_hardcode():
    """strict + align_corners=False: the VALUE matches align_corners=True
    (the reference 2D forward hardcode) while the cell GRADIENT matches
    align_corners=False (its backward honors the flag) — the upstream
    fwd/bwd inconsistency, reproduced."""
    rng = np.random.RandomState(2)
    cells = _cells2d(2)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1, 64, 2)), jnp.float32)

    out_strict = cst.cosine_sampler_2d(cells, grid, align_corners=False,
                                       backend="xla", strict_reference=True)
    out_true = cst.cosine_sampler_2d(cells, grid, align_corners=True,
                                     backend="xla")
    out_false = cst.cosine_sampler_2d(cells, grid, align_corners=False,
                                      backend="xla")
    np.testing.assert_allclose(out_strict, out_true, rtol=1e-6)
    assert float(jnp.abs(out_strict - out_false).max()) > 1e-4

    def loss(fn):
        return lambda c: jnp.sum(fn(c) ** 2)

    # the cotangent entering the sampler node differs between the strict
    # and plain pipelines (different values), so seed a FIXED cotangent
    # through vjp to isolate the scatter semantics.
    g = jnp.asarray(rng.rand(*out_true.shape), jnp.float32)
    vjp_strict = jax.vjp(lambda c: cst.cosine_sampler_2d(
        c, grid, align_corners=False, backend="xla",
        strict_reference=True), cells)[1](g)[0]
    vjp_false = jax.vjp(lambda c: cst.cosine_sampler_2d(
        c, grid, align_corners=False, backend="xla"), cells)[1](g)[0]
    vjp_true = jax.vjp(lambda c: cst.cosine_sampler_2d(
        c, grid, align_corners=True, backend="xla"), cells)[1](g)[0]
    np.testing.assert_allclose(vjp_strict, vjp_false, rtol=1e-6)
    assert float(jnp.abs(vjp_strict - vjp_true).max()) > 1e-4


def test_strict_3d_is_noop():
    # the 3D forward passes the real flag (cosine_sampler_3d_kernel.cu:
    # 299-301): strict changes nothing in zeros/border modes
    rng = np.random.RandomState(3)
    cells = jnp.asarray(rng.rand(3, 2, S, S, S), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 1, 1, 40, 3)), jnp.float32)
    for align in (True, False):
        a = cst.cosine_sampler_3d(cells, grid, align_corners=align,
                                  backend="xla")
        b = cst.cosine_sampler_3d(cells, grid, align_corners=align,
                                  backend="xla", strict_reference=True)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("orders", [(0, 0), (1, 0)])
def test_strict_pallas_v1_matches_generic(orders):
    cfg = SamplerConfig(dim=2, padding_mode="reflection", multicell=False,
                        align_corners=True, strict_reference=True,
                        backend="pallas")
    rng = np.random.RandomState(4)
    cells = _cells2d(4)
    grid = jnp.asarray(rng.uniform(-1.6, 1.6, (4, 1, 50, 2)), jnp.float32)
    want = generic.blend(cells, grid, cfg, orders)
    got = pallas_blend(cells, grid, cfg, orders, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    g = jnp.asarray(rng.rand(4, 2, 1, 50), jnp.float32)
    want_s = generic.splat(g, grid, (S, S), cfg, orders)
    got_s = pallas_splat(g, grid, (S, S), cfg, orders, q_block=64,
                         interpret=True)
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=1e-6)


def test_strict_mixed_align_routes_fused_to_xla():
    assert _strict_mixed_align(SamplerConfig(
        dim=2, align_corners=False, strict_reference=True))
    assert not _strict_mixed_align(SamplerConfig(
        dim=2, align_corners=True, strict_reference=True))
    assert not _strict_mixed_align(SamplerConfig(
        dim=3, align_corners=False, strict_reference=True))
    cfg = SamplerConfig(dim=2, align_corners=False, strict_reference=True,
                        backend="pallas")
    cells = jnp.zeros((4, 2, S, S), jnp.float32)
    pts = jnp.zeros((100, 2), jnp.float32)
    assert _fused_blend(cells, pts, cfg) is None
