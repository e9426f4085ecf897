"""Fused value/jacobian/diag-Hessian op: exactness + Pallas parity + PINN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import fused, generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.fused import (pallas_fused_blend,
                                                pallas_fused_bwd)

N_CELL, C, Q = 4, 3, 40


def _data(dim, seed=0, dtype=jnp.float64):
    rng = np.random.RandomState(seed)
    spatial = (8, 8) if dim == 2 else (6, 6, 6)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), dtype)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (Q, dim)), dtype)
    return cells, pts


def _oracle_value(cells, pts, cfg):
    """Multicell-summed features via the differentiable oracle."""
    grid = fused._points_to_grid(pts, cells.shape[0])
    out = generic.blend(cells, grid, cfg, (0,) * cfg.dim)
    return out.reshape(cells.shape[0], cells.shape[1], -1).sum(0)  # (C, Q)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("kernel", ["cosine", "smoothstep"])
def test_fused_rows_match_oracle_autodiff(dim, kernel):
    cfg = SamplerConfig(dim=dim, kernel=kernel, backend="xla")
    cells, pts = _data(dim)
    out = fused.sample_features_with_derivs(cells, pts, cfg)
    assert out.shape == (1 + 2 * dim, C, Q)

    np.testing.assert_allclose(out[0], _oracle_value(cells, pts, cfg),
                               rtol=1e-11)
    for ax in range(dim):
        def val_sum(p):
            return _oracle_value(cells, p, cfg).sum(axis=0)  # (Q,)

        g1 = jax.grad(lambda p: val_sum(p).sum())(pts)[:, ax]
        np.testing.assert_allclose(out[1 + ax].sum(axis=0), g1, rtol=1e-9,
                                   atol=1e-11)
        g2 = jax.grad(lambda p: jax.grad(
            lambda pp: val_sum(pp).sum())(p)[:, ax].sum())(pts)[:, ax]
        np.testing.assert_allclose(out[1 + dim + ax].sum(axis=0), g2,
                                   rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_fused_vjp_matches_oracle(dim):
    cfg = SamplerConfig(dim=dim, backend="xla")
    cells, pts = _data(dim, seed=2)
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.rand(1 + 2 * dim, C, Q))

    def via_fused(c, p):
        return (fused.sample_features_with_derivs(c, p, cfg) * w).sum()

    def via_oracle(c, p):
        grid = fused._points_to_grid(p, N_CELL)
        total = 0.0
        for row, o in enumerate(fused._all_orders(dim)):
            t = generic.blend(c, grid, cfg, o).reshape(N_CELL, C, Q).sum(0)
            total = total + (w[row] * t).sum()
        return total

    gc_f, gp_f = jax.grad(via_fused, argnums=(0, 1))(cells, pts)
    gc_o, gp_o = jax.grad(via_oracle, argnums=(0, 1))(cells, pts)
    np.testing.assert_allclose(gc_f, gc_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gp_f, gp_o, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("kernel", ["cosine", "linear", "smoothstep"])
def test_pallas_fused_blend_matches_xla(dim, kernel):
    cfg = SamplerConfig(dim=dim, kernel=kernel, backend="pallas")
    cells, pts = _data(dim, seed=4, dtype=jnp.float32)
    want = fused.xla_fused_blend(cells, pts, cfg)
    got = pallas_fused_blend(cells, pts, cfg, q_block=64, interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_fused_bwd_matches_xla(dim):
    cfg = SamplerConfig(dim=dim, backend="pallas")
    cells, pts = _data(dim, seed=5, dtype=jnp.float32)
    rng = np.random.RandomState(6)
    g = jnp.asarray(rng.rand(1 + 2 * dim, C, Q), jnp.float32)
    spatial = tuple(cells.shape[2:])
    want = fused.xla_fused_bwd(g, pts, spatial, cfg, N_CELL)
    got = pallas_fused_bwd(g, pts, spatial, cfg, N_CELL, q_block=64,
                           interpret=True)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("dim,pde", [(2, "allen_cahn"), (3, "helmholtz")])
def test_pinn_fused_path_matches_nested_grad(dim, pde):
    """residual_fused / loss_fused gradient == the nested-jax.grad path —
    the fused flagship reproduces the reference workload exactly."""
    cfg = pinn.PINNConfig(dim=dim, n_cells=4, cell_dim=3, cell_size=8,
                          hidden=8, pde=pde, backend="xla")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-0.9, 0.9, (32, dim)))

    r_fused = pinn.residual_fused(params, pts, cfg)
    r_nested = pinn.residual(params, pts, cfg)
    np.testing.assert_allclose(r_fused, r_nested, rtol=1e-9, atol=1e-11)

    g_fused = jax.grad(lambda p: pinn.loss_fused(p, pts, cfg))(params)
    g_nested = jax.grad(lambda p: pinn.loss(p, pts, cfg))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_nested)):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-11)
