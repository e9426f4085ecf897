"""PINN model layer: field/derivatives/residual/training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.models import pinn


def _tiny_cfg(dim=2, **kw):
    defaults = dict(dim=dim, n_cells=4, cell_dim=2, cell_size=8,
                    hidden=8, backend="xla")
    defaults.update(kw)
    return pinn.PINNConfig(**defaults)


def test_field_shapes_and_finite():
    cfg = _tiny_cfg()
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (32, 2)))
    u = pinn.field(params, pts, cfg)
    assert u.shape == (32,)
    assert np.isfinite(np.asarray(u)).all()


def test_spatial_derivative_matches_finite_differences():
    cfg = _tiny_cfg()
    params = pinn.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-0.8, 0.8, (16, 2)))
    eps = 1e-6
    for ax in range(2):
        d = pinn.spatial_derivative(params, pts, cfg, axis=ax, order=1)
        shift = jnp.zeros_like(pts).at[:, ax].set(eps)
        fd = (pinn.field(params, pts + shift, cfg)
              - pinn.field(params, pts - shift, cfg)) / (2 * eps)
        np.testing.assert_allclose(d, fd, rtol=1e-5, atol=1e-7)


def test_second_derivative_matches_finite_differences():
    cfg = _tiny_cfg()
    params = pinn.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(2).uniform(-0.8, 0.8, (16, 2)))
    eps = 1e-4
    d2 = pinn.spatial_derivative(params, pts, cfg, axis=0, order=2)
    shift = jnp.zeros_like(pts).at[:, 0].set(eps)
    fd = (pinn.field(params, pts + shift, cfg)
          - 2 * pinn.field(params, pts, cfg)
          + pinn.field(params, pts - shift, cfg)) / eps**2
    np.testing.assert_allclose(d2, fd, rtol=1e-4, atol=1e-5)


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    params = pinn.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(3).uniform(-0.9, 0.9, (64, 2)))
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(pinn.make_train_step(cfg, optimizer))
    _, _, l0 = step(params, opt_state, pts)
    for _ in range(20):
        params, opt_state, lval = step(params, opt_state, pts)
    assert float(lval) < float(l0)


def test_helmholtz_3d_residual_runs():
    cfg = _tiny_cfg(dim=3, cell_size=6, pde="helmholtz")
    params = pinn.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(4).uniform(-0.8, 0.8, (8, 3)))
    f = pinn.residual(params, pts, cfg)
    assert f.shape == (8,)
    assert np.isfinite(np.asarray(f)).all()
