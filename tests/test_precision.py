"""SamplerConfig.precision: MXU pass-count strategy for the fused kernels.

"exact" (3-pass bf16 split) is bit-faithful to f32; "fast" (2-pass) trades
~4e-6 relative error for ~1.5x MXU throughput; "highest" is XLA's 6-pass
algorithm.  The knob is a static config field so jit caches stay correct
(unlike flipping the mxu.EXACT_PASSES module global after tracing).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import mxu
from cosinesampler_tpu.ops.pallas.fused2w import pallas_fused2w_blend
from cosinesampler_tpu.ops.pallas.fused3w import (pallas_fused3w_blend,
                                                  pallas_fused3w_bwd)


def _data(dim, seed=0):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(5, 3, *([6] * dim)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (120, dim)), jnp.float32)
    return cells, pts


def test_passes_for():
    assert mxu.passes_for(SamplerConfig(dim=2)) == 3
    assert mxu.passes_for(SamplerConfig(dim=2, precision="fast")) == 2
    assert mxu.passes_for(SamplerConfig(dim=2, precision="highest")) == 6


def test_invalid_precision_raises():
    with pytest.raises(ValueError, match="precision"):
        SamplerConfig(dim=2, precision="approximate")


@pytest.mark.parametrize("dim", [2, 3])
def test_fast_mode_close_to_exact(dim):
    cells, pts = _data(dim)
    exact = SamplerConfig(dim=dim, backend="pallas")
    fast = dataclasses.replace(exact, precision="fast")
    blend = pallas_fused2w_blend if dim == 2 else pallas_fused3w_blend
    want = blend(cells, pts, exact, q_block=64, interpret=True)
    got = blend(cells, pts, fast, q_block=64, interpret=True)
    # 2-pass split: ~2^-18 error relative to the output scale (elementwise
    # rtol is the wrong yardstick: near-zero outputs of an f32-accumulated
    # contraction carry absolute, not relative, error)
    err = float(jnp.abs(got - want).max()) / float(jnp.abs(want).max())
    assert 0.0 < err < 2e-5, err


def test_highest_matches_exact_bitwise_class():
    cells, pts = _data(3, seed=1)
    exact = SamplerConfig(dim=3, backend="pallas")
    hi = dataclasses.replace(exact, precision="highest")
    want = pallas_fused3w_blend(cells, pts, exact, q_block=64, interpret=True)
    got = pallas_fused3w_blend(cells, pts, hi, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fast_bwd_close_to_exact():
    cells, pts = _data(3, seed=2)
    g = jnp.asarray(np.random.RandomState(3).rand(7, 3, 120), jnp.float32)
    exact = SamplerConfig(dim=3, backend="pallas")
    fast = dataclasses.replace(exact, precision="fast")
    want = pallas_fused3w_bwd(g, pts, (6, 6, 6), exact, 5, q_block=64,
                              interpret=True)
    got = pallas_fused3w_bwd(g, pts, (6, 6, 6), fast, 5, q_block=64,
                             interpret=True)
    err = float(jnp.abs(got - want).max()) / float(jnp.abs(want).max())
    assert err < 2e-5, err


def test_xla_backend_ignores_precision():
    cells, pts = _data(2, seed=4)
    a = SamplerConfig(dim=2, backend="xla")
    b = dataclasses.replace(a, precision="fast")
    wa = fused.xla_fused_blend(cells, pts, a)
    wb = fused.xla_fused_blend(cells, pts, b)
    np.testing.assert_array_equal(wa, wb)
