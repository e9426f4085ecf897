"""mxu.py: exact bf16-split contractions against one-hot selectors.

The v2 fused kernels rely on split_bf16(m, 3) being an EXACT decomposition
of f32 (mxu.py docstring); these tests pin that invariant and the resulting
matmul parity vs Precision.HIGHEST.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops.pallas import mxu


def _rand(shape, seed, scale=1.0):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, shape, jnp.float32) * scale


@pytest.mark.parametrize("scale", [1.0, 1e-6, 1e6])
def test_split3_exact(scale):
    m = _rand((64, 128), 0, scale)
    terms = mxu.split_bf16(m, 3)
    recon = sum(t.astype(jnp.float32) for t in terms)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(m))


def test_split2_near(scale=1.0):
    m = _rand((64, 128), 1, scale)
    recon = sum(t.astype(jnp.float32) for t in mxu.split_bf16(m, 2))
    err = np.abs(np.asarray(recon - m)) / (np.abs(np.asarray(m)) + 1e-30)
    assert err.max() < 2 ** -16


def test_onehot_dot_matches_highest():
    m = _rand((32, 256), 2)
    # one-hot selector: each column selects one row of the contraction dim
    idx = jax.random.randint(jax.random.PRNGKey(3), (128,), 0, 256)
    a = (jnp.arange(256)[:, None] == idx[None, :]).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    want = jax.lax.dot_general(m, a, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    got3 = mxu.onehot_dot(m, a, dims, passes=3)
    np.testing.assert_array_equal(np.asarray(got3), np.asarray(want))
    got2 = mxu.onehot_dot(m, a, dims, passes=2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-5, atol=0)
    got6 = mxu.onehot_dot(m, a, dims, passes=6)
    np.testing.assert_array_equal(np.asarray(got6), np.asarray(want))


def test_onehot_dot_terms_matches_onehot_dot():
    m = _rand((16, 64), 4)
    a = (jnp.arange(64)[:, None] ==
         jax.random.randint(jax.random.PRNGKey(5), (32,), 0, 64)[None, :]
         ).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    terms = mxu.split_bf16(m, 3)
    np.testing.assert_array_equal(
        np.asarray(mxu.onehot_dot_terms(terms, a, dims)),
        np.asarray(mxu.onehot_dot(m, a, dims, passes=3)))
