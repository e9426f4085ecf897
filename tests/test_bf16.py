"""bf16 cells through the fused Pallas generations.

The TPU-native analog of the reference's half dispatch
(AT_DISPATCH_FLOATING_TYPES_AND_HALF, cosine_sampler_2d_kernel.cu:905):
bf16 cell data rides the window/brick DMAs at half the bytes and
contracts against the (exactly-bf16) one-hot selectors in ONE MXU pass
instead of the 3-pass exact split (ops/pallas/mxu.py data_cast /
data_terms).  Accumulation stays f32; outputs promote to f32; cotangents
match the bf16 primal dtype.

Tolerances: bf16 has an 8-bit mantissa, so the cell data carries ~2^-9
relative error.  The derivative rows amplify it by the corner-weight mass
(sum |w'| ~ mult, sum |w''| ~ mult^2 with mult = (size-1)/2), so the right
error metric is per-row, normalized by the row's magnitude: max abs error
<= ~1e-2 of the row's max.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import (fused2d, fused2w, fused3b,
                                          fused3d, fused3s, fused3w)

N_CELL, C, Q = 5, 3, 160


def _assert_rows_close(got, want, frac=1e-2):
    """Per-row max-abs error bounded by ``frac`` of the row's max-abs."""
    got = np.asarray(got, np.float32).reshape(want.shape[0], -1)
    want = np.asarray(want, np.float32).reshape(want.shape[0], -1)
    for r in range(want.shape[0]):
        scale = max(1.0, float(np.max(np.abs(want[r]))))
        err = float(np.max(np.abs(got[r] - want[r])))
        assert err <= frac * scale, (r, err, scale)


def _data(dim, seed=0, spatial=None, q=Q):
    rng = np.random.RandomState(seed)
    spatial = spatial or (8,) * dim
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, dim)), jnp.float32)
    return cells, pts


BLENDS = [
    (2, fused2d.pallas_fused2_blend, {}),
    (2, fused2w.pallas_fused2w_blend, {"q_block": 128}),
    (3, fused3d.pallas_fused3_blend, {}),
    (3, fused3s.pallas_fused3s_blend, {"q_block": 32}),
    (3, fused3w.pallas_fused3w_blend, {"q_block": 32}),
    (3, fused3b.pallas_fused3b_blend, {"q_block": 32}),
]


@pytest.mark.parametrize("dim,blend,kw", BLENDS,
                         ids=[b[1].__name__ for b in BLENDS])
def test_bf16_blend_matches_f32(dim, blend, kw):
    cfg = SamplerConfig(dim=dim, backend="pallas")
    cells, pts = _data(dim)
    want = blend(cells, pts, cfg, interpret=True, **kw)
    got = blend(cells.astype(jnp.bfloat16), pts, cfg, interpret=True, **kw)
    assert got.dtype == jnp.float32      # accumulation/output stay f32
    _assert_rows_close(got, np.asarray(want))


def test_bf16_vol_layout_kept():
    # the kernel-layout volume inherits bf16 (half the brick DMA bytes)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(3, 1, spatial=(6, 6, 6))
    vol = fused3b.cells_to_vol(cells.astype(jnp.bfloat16), cfg)
    assert vol.dtype == jnp.bfloat16


@pytest.mark.parametrize("dim", [2, 3])
def test_bf16_fused_grad_dtype_and_value(monkeypatch, dim):
    import cosinesampler_tpu.ops.pallas as pb
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=dim, backend="pallas")
    cells, pts = _data(dim, 2)

    def loss(c):
        out = fused.sample_features_with_derivs(c, pts, cfg)
        return jnp.sum(jnp.square(out))

    g32 = jax.grad(loss)(cells)
    g16 = jax.grad(loss)(cells.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16
    # grads: bf16 fwd error amplified through the quadratic loss, then the
    # cotangent quantized to bf16 — bound by a fraction of the grad norm
    _assert_rows_close(g16[None].astype(jnp.float32), np.asarray(g32)[None],
                       frac=5e-2)


@pytest.mark.parametrize("dim,blend,kw", BLENDS,
                         ids=[b[1].__name__ for b in BLENDS])
def test_precision_bf16_f32_master(dim, blend, kw):
    """precision='bf16' quantizes f32 cells to bf16 compute (the idiomatic
    TPU mixed-precision shape: f32 master weights, bf16 kernels) — same
    values as passing bf16 cells directly, f32 output."""
    cfg16 = SamplerConfig(dim=dim, backend="pallas", precision="bf16")
    cfg = SamplerConfig(dim=dim, backend="pallas")
    cells, pts = _data(dim)
    want = blend(cells, pts, cfg, interpret=True, **kw)
    got = blend(cells, pts, cfg16, interpret=True, **kw)
    via_cast = blend(cells.astype(jnp.bfloat16), pts, cfg, interpret=True,
                     **kw)
    assert got.dtype == jnp.float32
    _assert_rows_close(got, np.asarray(want))
    # both bf16 routes (dtype-driven and flag-driven) agree exactly
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(via_cast, np.float32))


def test_precision_bf16_grad_stays_f32(monkeypatch):
    """f32 master + precision='bf16': the cotangent keeps the master dtype
    (f32) so the optimizer state stays full-precision."""
    import cosinesampler_tpu.ops.pallas as pb
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=2, backend="pallas", precision="bf16")
    cells, pts = _data(2, 4)

    def loss(c):
        out = fused.sample_features_with_derivs(c, pts, cfg)
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(cells)
    assert g.dtype == jnp.float32
    cfg32 = SamplerConfig(dim=2, backend="pallas")
    g32 = jax.grad(lambda c: jnp.sum(jnp.square(
        fused.sample_features_with_derivs(c, pts, cfg32))))(cells)
    _assert_rows_close(g[None], np.asarray(g32)[None], frac=5e-2)


def test_bf16_slot_resident_grad(monkeypatch):
    import cosinesampler_tpu.ops.pallas as pb
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(3, 3, spatial=(6, 6, 6), q=120)

    def loss(c):
        out, occ, _ = fused.sample_features_padded(c, pts, cfg)
        return jnp.sum(jnp.square(out) * occ)

    g32 = jax.grad(loss)(cells)
    g16 = jax.grad(loss)(cells.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16
    _assert_rows_close(g16[None].astype(jnp.float32), np.asarray(g32)[None],
                       frac=5e-2)
