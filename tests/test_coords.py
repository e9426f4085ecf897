"""Coordinate transforms: closed-form multipliers vs JAX autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import coords


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("multicell", [True, False])
def test_unnormalize_matches_reference_formula(align_corners, multicell):
    size = 16
    c = jnp.linspace(-1.0, 1.0, 21, dtype=jnp.float64)
    off = 0.25
    x, mult = coords.unnormalize(c, size, align_corners, multicell, off)
    eff = size - 1 if (align_corners and multicell) else size
    if align_corners:
        want = (c + 1.0) / 2.0 * (eff - 1) + off
        want_m = (eff - 1) / 2.0
    else:
        want = ((c + 1.0) * eff - 1.0) / 2.0 + off
        want_m = eff / 2.0
    np.testing.assert_allclose(x, want, rtol=1e-12)
    np.testing.assert_allclose(mult, want_m, rtol=1e-12)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("multicell", [True, False])
def test_multiplier_matches_autodiff(padding_mode, align_corners, multicell):
    """The hand-propagated gix_mult chain factor (kernel.cu:211-236) must
    equal d(source coord)/d(normalized coord) from autodiff, a.e."""
    size = 16
    rng = np.random.RandomState(0)
    # avoid measure-zero fold/border points where the derivative is ambiguous
    c = jnp.asarray(rng.uniform(-2.9, 2.9, size=256))
    off = 0.375

    def f(v):
        x, _ = coords.compute_source_coords(
            v, size, padding_mode, align_corners, multicell, off)
        return x

    _, mult = coords.compute_source_coords(
        c, size, padding_mode, align_corners, multicell, off)
    auto = jax.vmap(jax.grad(f))(c)
    np.testing.assert_allclose(mult, auto, rtol=1e-12, atol=1e-12)


def test_border_clip_gradient_zero_at_borders():
    x = jnp.array([-0.5, 0.0, 0.5, 14.999, 15.0, 17.0], dtype=jnp.float64)
    out, mult = coords.clip_coordinates(x, 16)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 14.999, 15.0, 15.0])
    np.testing.assert_allclose(mult, [0.0, 0.0, 1.0, 1.0, 0.0, 0.0])


def test_reflection_span_multicell_matches_reference():
    """Multicell reflection folds over 2*(size-2) = the reference's span
    (kernel.cu:185); values reflect into [0, size-2]."""
    size = 16
    c = jnp.linspace(-3.0, 3.0, 101, dtype=jnp.float64)
    x, _ = coords.compute_source_coords(c, size, "reflection", True, True, 0.0)
    assert float(x.min()) >= 0.0
    assert float(x.max()) <= size - 2.0


def test_reflection_span_nonmulticell_matches_torch():
    """Non-multicell align-corners reflection folds over 2*(size-1), the
    torch.grid_sample convention (deviation from the reference's untested
    always-(size-2) quirk, documented in coords.py)."""
    size = 16
    c = jnp.linspace(-3.0, 3.0, 101, dtype=jnp.float64)
    x, _ = coords.compute_source_coords(c, size, "reflection", True, False, 0.0)
    assert float(x.max()) > size - 2.0  # uses the full [0, size-1] range
    assert float(x.max()) <= size - 1.0


def test_offsets():
    off = coords.multicell_offsets(4, True, jnp.float64)
    np.testing.assert_allclose(off, [0.0, 0.25, 0.5, 0.75], rtol=1e-12)
    np.testing.assert_allclose(coords.multicell_offsets(4, False, jnp.float64),
                               np.zeros(4))
