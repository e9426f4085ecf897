"""Interpolant kernels: closed-form derivatives vs JAX autodiff, identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops.interpolants import (KERNELS, canonical_kernel,
                                                corner_weights, kernel_weight)


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_derivative_matches_autodiff(kernel, order):
    t = jnp.linspace(0.01, 0.99, 37, dtype=jnp.float64)
    got = kernel_weight(kernel, t, order + 1)
    want = jax.vmap(jax.grad(lambda v: kernel_weight(kernel, v, order)))(t)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kernel", KERNELS)
def test_reflection_identity(kernel):
    """w(1-t) = 1 - w(t): why the reference's 2D and 3D corner-weight
    conventions (kernel.cu:315-326 vs cosine_sampler_3d_kernel.cu:316-333)
    coincide."""
    t = jnp.linspace(0.0, 1.0, 41, dtype=jnp.float64)
    np.testing.assert_allclose(
        kernel_weight(kernel, 1.0 - t, 0),
        1.0 - kernel_weight(kernel, t, 0),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.parametrize("kernel", KERNELS)
def test_endpoints_and_partition(kernel):
    t = jnp.linspace(0.0, 1.0, 11, dtype=jnp.float64)
    w0, w1 = corner_weights(kernel, t, 0)
    np.testing.assert_allclose(w0 + w1, 1.0, rtol=0, atol=1e-15)
    np.testing.assert_allclose(kernel_weight(kernel, jnp.array(0.0), 0), 0.0,
                               atol=1e-15)
    np.testing.assert_allclose(kernel_weight(kernel, jnp.array(1.0), 0), 1.0,
                               rtol=1e-15)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_precise_trig_matches_reference_trig(order):
    """The Pallas in-kernel polynomial trig (needed because the TPU VPU's
    hardware sin/cos is ~1e-3) must match libm to f32 precision."""
    t = jnp.linspace(0.0, 1.0, 257, dtype=jnp.float64)
    a = kernel_weight("cosine", t, order, precise_trig=True)
    b = kernel_weight("cosine", t, order)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-7 * max(1.0, np.pi**order))


def test_aliases():
    assert canonical_kernel("bilinear") == "linear"
    assert canonical_kernel("trilinear") == "linear"
    assert canonical_kernel("smooth-step") == "smoothstep"
    with pytest.raises(ValueError):
        canonical_kernel("cubic")
