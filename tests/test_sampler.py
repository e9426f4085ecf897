"""Exactness of the custom_vjp chain vs native JAX autodiff of the oracle.

The oracle is generic.blend differentiated directly by JAX (the analog of
the reference's pure-torch gold model, test/grid_sampler.py, which its tests
differentiate via native autograd).  The custom chain must agree to fp precision at
every derivative order, including the third-order mixed terms
(u_xx_cell — the reference's headline capability, README.md:3) and the
full PINN loss gradient (the reference's only hard assertion,
test/test_2d.py:244).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import differentiable_blend, sample

N_CELL, C = 3, 2
SIZE2, SIZE3, Q = 8, 6, 48


def _setup(dim, seed=0):
    rng = np.random.RandomState(seed)
    spatial = (SIZE2, SIZE2) if dim == 2 else (SIZE3, SIZE3, SIZE3)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial))
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(Q, dim)))
    w = jnp.asarray(rng.rand(C))
    return cells, pts, w


def _grid_from_points(pts, dim):
    if dim == 2:
        return jnp.broadcast_to(pts[None, None], (N_CELL, 1, Q, dim))
    return jnp.broadcast_to(pts[None, None, None], (N_CELL, 1, 1, Q, dim))


def _u_fn(sampler, cfg, w):
    """Per-point scalar field u(q) = sum_{n,c} w_c * sample[n,c,q]."""

    def u(cells, pts):
        grid = _grid_from_points(pts, cfg.dim)
        out = sampler(cells, grid)              # (N, C, ..., Q)
        out = out.reshape(N_CELL, C, Q)
        return jnp.einsum("ncq,c->q", out, w)

    return u


def _oracle(cfg):
    return lambda cells, grid: generic.blend(cells, grid, cfg, (0,) * cfg.dim)


def _chain(cfg):
    return lambda cells, grid: sample(cells, grid, cfg)


CONFIGS = [
    SamplerConfig(dim=d, kernel=k, padding_mode=p, multicell=m, backend="xla")
    for d, k, p, m in itertools.product(
        (2, 3), ("cosine", "linear", "smoothstep"),
        ("zeros", "border", "reflection"), (True, False))
]
FAST_CONFIGS = [
    SamplerConfig(dim=2, kernel="cosine", padding_mode="zeros",
                  multicell=True, backend="xla"),
    SamplerConfig(dim=3, kernel="cosine", padding_mode="zeros",
                  multicell=True, backend="xla"),
    SamplerConfig(dim=2, kernel="smoothstep", padding_mode="border",
                  multicell=False, backend="xla"),
    SamplerConfig(dim=2, kernel="cosine", padding_mode="reflection",
                  multicell=True, backend="xla"),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=str)
def test_forward_matches_oracle(cfg):
    cells, pts, _ = _setup(cfg.dim)
    grid = _grid_from_points(pts, cfg.dim)
    np.testing.assert_allclose(_chain(cfg)(cells, grid),
                               _oracle(cfg)(cells, grid), rtol=1e-12, atol=0)


@pytest.mark.parametrize("cfg", FAST_CONFIGS, ids=str)
def test_first_order_matches_oracle(cfg):
    cells, pts, w = _setup(cfg.dim)

    def scalar(fn):
        u = _u_fn(fn, cfg, w)
        return jax.grad(lambda c, p: u(c, p).sum(), argnums=(0, 1))(cells, pts)

    g_chain = scalar(_chain(cfg))
    g_oracle = scalar(_oracle(cfg))
    for a, b in zip(g_chain, g_oracle):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("cfg", FAST_CONFIGS, ids=str)
@pytest.mark.parametrize("axis", [0, 1])
def test_second_and_third_order_match_oracle(cfg, axis):
    """u_ax, u_axax, u_axax_cell: the 2nd/3rd-order chain the reference
    implements with its bwd^2/bwd^3 CUDA kernels (kernel.cu:509-891)."""
    cells, pts, w = _setup(cfg.dim)

    def derivs(fn):
        u = _u_fn(fn, cfg, w)

        def u_ax(c, p):
            return jax.grad(lambda pp: u(c, pp).sum())(p)[:, axis]

        def u_axax(c, p):
            return jax.grad(lambda pp: u_ax(c, pp).sum())(p)[:, axis]

        uxx_cell = jax.grad(lambda c: u_axax(c, pts).sum())(cells)
        return u_ax(cells, pts), u_axax(cells, pts), uxx_cell

    got = derivs(_chain(cfg))
    want = derivs(_oracle(cfg))
    for a, b, name in zip(got, want, ("u_x", "u_xx", "u_xx_cell")):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10, err_msg=name)


@pytest.mark.parametrize("dim", [2, 3])
def test_pinn_loss_gradient_matches_oracle(dim):
    """The reference's acceptance test (test_2d.py:221-244, test_3d.py:270-293):
    gradient of the PDE-residual loss w.r.t. the cells."""
    cfg = SamplerConfig(dim=dim, kernel="cosine", padding_mode="zeros",
                        multicell=True, backend="xla")
    cells, pts, w = _setup(dim, seed=3)

    def loss(fn, cells):
        u = _u_fn(fn, cfg, w)

        def u_d(c, p, ax):
            return jax.grad(lambda pp: u(c, pp).sum())(p)[:, ax]

        def u_dd(c, p, ax):
            return jax.grad(lambda pp: u_d(c, pp, ax).sum())(p)[:, ax]

        uv = u(cells, pts)
        if dim == 2:
            # Allen-Cahn-style residual, test_2d.py:221
            f = 2.0 * u_d(cells, pts, 1) + 5.0 * uv**3 - 5.0 * uv \
                - 1e-4 * u_dd(cells, pts, 0)
        else:
            # Helmholtz-style residual, test_3d.py:270
            f = (u_dd(cells, pts, 0) + u_dd(cells, pts, 1)
                 + u_dd(cells, pts, 2) + uv)
        return jnp.mean(f**2)

    d_chain = jax.grad(lambda c: loss(_chain(cfg), c))(cells)
    d_oracle = jax.grad(lambda c: loss(_oracle(cfg), c))(cells)
    np.testing.assert_allclose(d_chain, d_oracle, rtol=1e-9, atol=1e-12)


def test_gradcheck_finite_differences():
    """Directional-derivative gradcheck of the custom chain vs central
    finite differences (jax.test_util.check_grads was removed in jax 0.9)."""
    cfg = SamplerConfig(dim=2, kernel="cosine", padding_mode="zeros",
                        multicell=True, backend="xla")
    cells, pts, _ = _setup(2, seed=7)
    grid = _grid_from_points(pts, 2)
    rng = np.random.RandomState(13)
    proj = jnp.asarray(rng.rand(N_CELL, C, 1, Q))

    def f(c, g):
        return (sample(c, g, cfg) * proj).sum()

    dc = jnp.asarray(rng.rand(*cells.shape) - 0.5)
    dg = jnp.asarray(rng.rand(*grid.shape) - 0.5) * 1e-3
    eps = 1e-6
    gc, gg = jax.grad(f, argnums=(0, 1))(cells, grid)
    directional = (gc * dc).sum() + (gg * dg).sum()
    fd = (f(cells + eps * dc, grid + eps * dg)
          - f(cells - eps * dc, grid - eps * dg)) / (2 * eps)
    np.testing.assert_allclose(directional, fd, rtol=1e-6)

    # second order: gradcheck the gradient itself
    def g1(c, g):
        gc_, gg_ = jax.grad(f, argnums=(0, 1))(c, g)
        return (gc_ * dc).sum() + (gg_ * dg).sum()

    gc2, gg2 = jax.grad(g1, argnums=(0, 1))(cells, grid)
    directional2 = (gc2 * dc).sum() + (gg2 * dg).sum()
    fd2 = (g1(cells + eps * dc, grid + eps * dg)
           - g1(cells - eps * dc, grid - eps * dg)) / (2 * eps)
    np.testing.assert_allclose(directional2, fd2, rtol=1e-5)


def test_blend_orders_are_true_derivatives():
    """blend_{o+e_ax} == d(blend_o)/d(pixel coord) * mult, verified via the
    oracle's autodiff on the grid input."""
    cfg = SamplerConfig(dim=2, kernel="cosine", padding_mode="zeros",
                        multicell=True, backend="xla")
    cells, pts, _ = _setup(2, seed=11)
    grid = _grid_from_points(pts, 2)
    for orders, axis in [((0, 0), 0), ((0, 0), 1), ((1, 0), 0), ((0, 1), 1)]:
        bumped = tuple(o + (1 if i == axis else 0) for i, o in enumerate(orders))

        def f(g):
            return generic.blend(cells, g, cfg, orders).sum()

        auto = jax.grad(f)(grid)[..., axis]                     # (N,1,Q)
        direct = generic.blend(cells, grid, cfg, bumped).sum(axis=1)
        np.testing.assert_allclose(direct, auto, rtol=1e-10, atol=1e-12)


def test_validation_errors():
    cfg = SamplerConfig(dim=2, backend="xla")
    cells = jnp.zeros((2, 1, 4, 4))
    with pytest.raises(ValueError):
        sample(cells, jnp.zeros((2, 4, 4, 3)), cfg)
    with pytest.raises(ValueError):
        sample(cells, jnp.zeros((3, 4, 4, 2)), cfg)
    with pytest.raises(ValueError):
        sample(jnp.zeros((2, 1, 4)), jnp.zeros((2, 4, 4, 2)), cfg)
