"""v6 residual megakernel: one-pass train-step gradient parity.

The megakernel's contract is exact semantic equality (up to fp summation
order) with jax.value_and_grad of the two-kernel slot-resident loss it
replaces — same blend, same MLP/residual chain, same masked reduction.
Everything runs in Pallas interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import mega2w


@pytest.fixture(autouse=True)
def _interpret():
    old = pb.INTERPRET
    pb.INTERPRET = True
    yield
    pb.INTERPRET = old


def _pcfg(**kw):
    base = dict(dim=2, n_cells=6, cell_dim=4, cell_size=16, hidden=16,
                kernel="cosine", pde="allen_cahn", backend="pallas")
    base.update(kw)
    return pinn.PINNConfig(**base)


def _setup(cfg, q=4096, seed=0):
    rng = np.random.RandomState(seed)
    params = pinn.init_params(jax.random.PRNGKey(seed), cfg)
    pts = jnp.asarray(rng.uniform(-0.97, 0.97, (q, 2)), jnp.float32)
    return params, pts


# atol floor rationale: the megakernel's MLP uses the exp-based precise
# tanh (mega2w._tanh_precise, ~2e-6 abs) while the reference path uses
# the platform tanh — ulp-level differences amplify through the
# second-order jvp ladder and the splat sum into ~1e-5-scale absolute
# noise on near-zero gradient entries.
def _assert_grads_close(got, want, rtol, atol):
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], rtol=rtol, atol=atol,
            err_msg=f"grad mismatch on {k!r}")


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_mega_matches_value_and_grad(padding):
    cfg = _pcfg(padding_mode=padding)
    params, pts = _setup(cfg)
    assert pinn.mega_available(cfg, pts.shape[0])

    want_l, want_g = jax.value_and_grad(
        lambda p: pinn.loss_fused_slots(p, pts, cfg))(params)
    got_l, got_g = pinn.value_and_grad_mega(params, pts, cfg)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5)
    _assert_grads_close(got_g, want_g, rtol=2e-4, atol=2e-5)


def test_mega_with_plan_matches_planned_loss():
    cfg = _pcfg()
    params, pts = _setup(cfg, seed=1)
    plan = fused.make_sample_plan(pts, params["cells"].shape, cfg.sampler)
    assert plan is not None

    want_l, want_g = jax.value_and_grad(
        lambda p: pinn.loss_fused_slots(p, pts, cfg, plan=plan))(params)
    got_l, got_g = pinn.value_and_grad_mega(params, pts, cfg, plan=plan)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5)
    _assert_grads_close(got_g, want_g, rtol=2e-4, atol=2e-5)


def test_mega_helmholtz_residual():
    cfg = _pcfg(pde="helmholtz")
    params, pts = _setup(cfg, seed=2)
    want_l, want_g = jax.value_and_grad(
        lambda p: pinn.loss_fused_slots(p, pts, cfg))(params)
    got_l, got_g = pinn.value_and_grad_mega(params, pts, cfg)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5)
    # looser than allen_cahn: the Laplacian residual's u_xx + u_yy
    # cancellation amplifies the f32 per-block-partial summation-order
    # noise (observed max ~1e-3 relative on ~0.1% of elements)
    _assert_grads_close(got_g, want_g, rtol=3e-3, atol=1e-6)


def test_mega_bf16_precision_mode():
    """bf16 mode: bf16 windows, single-pass MXU, f32 accumulation — must
    match the two-kernel bf16 path tightly (identical quantization)."""
    cfg = _pcfg(precision="bf16")
    params, pts = _setup(cfg, seed=3)
    want_l, want_g = jax.value_and_grad(
        lambda p: pinn.loss_fused_slots(p, pts, cfg))(params)
    got_l, got_g = pinn.value_and_grad_mega(params, pts, cfg)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-4)
    # atol floor: near-zero grads differ by single-ulp bf16 rounding-order
    # effects between the one-pass and two-kernel paths (observed 1.5e-5)
    _assert_grads_close(got_g, want_g, rtol=1e-3, atol=5e-5)


def test_mega_train_step_runs_and_matches():
    """make_train_step(megakernel=True): one optimizer step equals the
    planned two-kernel step leaf-for-leaf."""
    cfg = _pcfg()
    params, pts = _setup(cfg, seed=4)
    plan = fused.make_sample_plan(pts, params["cells"].shape, cfg.sampler)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    step_ref = pinn.make_train_step(cfg, optimizer, planned=True)
    step_mega = pinn.make_train_step(cfg, optimizer, megakernel=True)
    p1, _, l1 = step_ref(params, opt_state, pts, plan)
    p2, _, l2 = step_mega(params, opt_state, pts, plan)
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    for (k1, a), (k2, b) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                   err_msg=f"param {k1}")


def test_mega_unavailable_falls_back():
    """3D (or any non-routing config) must fall back to value_and_grad of
    the slot loss — the step is always valid."""
    cfg = pinn.PINNConfig(dim=3, n_cells=4, cell_dim=2, cell_size=8,
                          hidden=8, pde="helmholtz", backend="xla")
    assert not pinn.mega_available(cfg, 4096)
    rng = np.random.RandomState(5)
    params = pinn.init_params(jax.random.PRNGKey(5), cfg)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (256, 3)), jnp.float32)
    want_l, want_g = jax.value_and_grad(
        lambda p: pinn.loss_fused_slots(p, pts, cfg))(params)
    got_l, got_g = pinn.value_and_grad_mega(params, pts, cfg)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-12)
    _assert_grads_close(got_g, want_g, rtol=1e-12, atol=0)


def test_mega_supports_gates():
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                        backend="pallas")
    shape = (6, 4, 16, 16)
    assert mega2w.supports(cfg, shape, 6 << 20, 4096)
    # too few queries for the binned route
    assert not mega2w.supports(cfg, shape, 6 << 20, 512)
    # 3D config never routes
    cfg3 = dataclasses.replace(cfg, dim=3)
    assert not mega2w.supports(cfg3, (6, 4, 8, 16, 16), 6 << 20, 4096)
    # MLP tile bounds
    assert not mega2w.supports(cfg, shape, 6 << 20, 4096, hidden=256)


def test_mega_sharded_matches_single(mesh_8):
    """make_sharded_mega_step on the virtual 8-device mesh: one step's
    params/loss equal the single-device mega step (weighted-psum grads)."""
    from cosinesampler_tpu.parallel.sharding import (make_mesh,
                                                     make_sharded_mega_step,
                                                     make_sharded_plans)

    cfg = _pcfg(n_cells=4, cell_size=8, hidden=8)
    params, pts = _setup(cfg, q=4096, seed=6)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    mesh = make_mesh(8)
    plans = make_sharded_plans(pts, params["cells"].shape, cfg.sampler, mesh)
    step_s = make_sharded_mega_step(cfg, optimizer, mesh)
    p2, _, l2 = step_s(params, opt_state, pts, plans)

    step_1 = pinn.make_train_step(cfg, optimizer, megakernel=True)
    # single-device reference over the same GLOBAL points, no plan
    p1, _, l1 = step_1(params, opt_state, pts, None)
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(p2[k], p1[k], rtol=1e-4, atol=1e-6,
                                   err_msg=f"param {k}")


import pytest as _pytest


@_pytest.fixture()
def mesh_8():
    import jax as _jax
    assert _jax.device_count() >= 8
    return None


def test_trainer_megakernel_flag():
    """train(megakernel=True) runs end-to-end and reduces the loss."""
    from cosinesampler_tpu.models.train import TrainConfig, train

    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                              hidden=8, backend="pallas"),
        batch_points=4096, steps=6, lr=3e-3, fixed_points=True,
        megakernel=True, log_every=3)
    _, metrics = train(cfg)
    assert metrics[-1]["loss"] < metrics[0]["loss"]
