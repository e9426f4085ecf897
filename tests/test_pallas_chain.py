"""Nested autodiff THROUGH the Pallas kernels (interpret mode).

Regression guard for the grad-of-grad requirements: custom_vjp fwd jaxprs
get JVP'd by the built-in pallas rule (so kernels must avoid pl.program_id)
and then transposed (so fwd must call the wrapped function — the
recursive-fwd idiom).  Breaking either fails here, without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pb, "INTERPRET", True)


def _setup():
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (16, 2)), jnp.float32)
    return cells, pts


def _u(cfg):
    def u(c, p):
        g = jnp.broadcast_to(p[None, None], (4, 1, p.shape[0], 2))
        return sample(c, g, cfg).sum(axis=(0, 1, 2))
    return u


def test_grad_of_grad_through_pallas():
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                        backend="pallas")
    cells, pts = _setup()
    u = _u(cfg)

    g2 = jax.grad(lambda p: jax.grad(
        lambda pp: u(cells, pp).sum())(p)[:, 0].sum())(pts)

    cfg_x = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                          backend="xla")
    ux = _u(cfg_x)
    want = jax.grad(lambda p: jax.grad(
        lambda pp: ux(cells, pp).sum())(p)[:, 0].sum())(pts)
    np.testing.assert_allclose(g2, want, rtol=2e-4, atol=2e-4)


def test_third_order_cells_grad_through_pallas():
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                        backend="pallas")
    cells, pts = _setup()
    u = _u(cfg)

    def uxx_sum(c):
        return jax.grad(lambda p: jax.grad(
            lambda pp: u(c, pp).sum())(p)[:, 0].sum())(pts)[:, 0].sum()

    got = jax.grad(uxx_sum)(cells)

    cfg_x = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                          backend="xla")
    ux = _u(cfg_x)

    def uxx_sum_x(c):
        return jax.grad(lambda p: jax.grad(
            lambda pp: ux(c, pp).sum())(p)[:, 0].sum())(pts)[:, 0].sum()

    want = jax.grad(uxx_sum_x)(cells)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
