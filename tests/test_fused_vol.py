"""Kernel-layout (vol-resident) training path for the v4 bricked route.

The query-ordered/padded v4 APIs re-lay-out the whole volume on every
forward (fused3b._pad_volume_yzc) and crop/transpose the gradient back on
every backward; at the 128^3 sweep that is two ~0.6 GB relayouts per train
step the kernels never see (VERDICT r2 #1).  The vol API keeps the cells
in the kernel layout across steps; these tests pin it bit-for-bit against
the padded path and guard the pad-slot-zero invariant the forward relies
on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3b

N_CELL, C, Q = 5, 3, 120
SPATIAL = (6, 6, 6)


def _data(seed=0, lo=-0.95, hi=0.95):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *SPATIAL), jnp.float32)
    pts = jnp.asarray(rng.uniform(lo, hi, (Q, 3)), jnp.float32)
    return cells, pts


def test_cells_vol_roundtrip_and_pad_zeros():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, _ = _data(0)
    vol = fused3b.cells_to_vol(cells, cfg)
    rb, hp, wp, npad = fused3b.vol_layout(N_CELL, C, SPATIAL, cfg)
    assert vol.shape == (hp, SPATIAL[0] + 4, C * npad, wp)
    np.testing.assert_array_equal(
        fused3b.vol_to_cells(vol, N_CELL, C, SPATIAL, cfg), cells)
    # pad slots are exactly zero: masking is the identity on a fresh vol
    np.testing.assert_array_equal(
        fused3b.vol_pad_mask_mul(vol, N_CELL, C, SPATIAL, cfg), vol)
    # and the mask really does zero a poisoned pad slot
    poisoned = vol.at[0, 0, 0, 0].set(7.0)   # front-pad y row
    masked = fused3b.vol_pad_mask_mul(poisoned, N_CELL, C, SPATIAL, cfg)
    np.testing.assert_array_equal(masked, vol)


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_vol_blend_matches_padded(padding):
    cfg = SamplerConfig(dim=3, backend="pallas", padding_mode=padding)
    cells, pts = _data(1)
    want_p, want_occ, want_pos = fused3b.pallas_fused3b_blend_padded(
        cells, pts, cfg, q_block=32, interpret=True)
    vol = fused3b.cells_to_vol(cells, cfg)
    got_p, got_occ, got_pos = fused3b.pallas_fused3b_blend_vol(
        vol, pts, cfg, N_CELL, C, SPATIAL, q_block=32, interpret=True)
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_array_equal(got_occ, want_occ)
    np.testing.assert_array_equal(got_pos, want_pos)


def test_vol_blend_rejects_wrong_layout():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(2)
    with pytest.raises(ValueError, match="kernel layout"):
        fused3b.pallas_fused3b_blend_vol(
            cells.reshape(-1, 1, 1, 1), pts, cfg, N_CELL, C, SPATIAL,
            q_block=32, interpret=True)


@pytest.mark.parametrize("padding", ["zeros", "reflection"])
def test_vol_bwd_matches_padded_and_masks_pads(padding):
    cfg = SamplerConfig(dim=3, backend="pallas", padding_mode=padding)
    cells, pts = _data(3, lo=-1.4, hi=1.4)   # include OOB scatters
    qp = fused3b.pallas_fused3b_blend_padded(
        cells, pts, cfg, q_block=32, interpret=True)[0].shape[-1]
    g_p = jnp.asarray(np.random.RandomState(4).rand(7, C, qp), jnp.float32)
    want = fused3b.pallas_fused3b_bwd_padded(g_p, pts, SPATIAL, cfg, N_CELL,
                                             q_block=32, interpret=True)
    got_vol = fused3b.pallas_fused3b_bwd_vol(g_p, pts, SPATIAL, cfg, N_CELL,
                                             q_block=32, interpret=True)
    np.testing.assert_array_equal(
        fused3b.vol_to_cells(got_vol, N_CELL, C, SPATIAL, cfg), want)
    # pad slots (incl. the OOB scatter garbage the crop used to discard)
    # are exactly zero: re-masking is the identity
    np.testing.assert_array_equal(
        fused3b.vol_pad_mask_mul(got_vol, N_CELL, C, SPATIAL, cfg), got_vol)


def test_make_fused_vol_value_and_grads(monkeypatch):
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data(5)
    plan = fused.make_sample_plan(pts, cells.shape, cfg)
    assert plan is not None
    ops = fused.make_fused_vol(cfg, N_CELL, C, SPATIAL, Q)
    assert ops is not None
    fused_vol, to_vol, from_vol = ops

    out_want, occ_want, _ = fused.sample_features_padded(cells, pts, cfg,
                                                         plan=plan)
    out_got, occ_got, _ = fused_vol(to_vol(cells), pts, plan)
    np.testing.assert_array_equal(out_got, out_want)
    np.testing.assert_array_equal(occ_got, occ_want)

    def loss_padded(c):
        o, occ, _ = fused.sample_features_padded(c, pts, cfg, plan=plan)
        return jnp.sum(jnp.square(o[0]) * occ)

    def loss_vol(v):
        o, occ, _ = fused_vol(v, pts, plan)
        return jnp.sum(jnp.square(o[0]) * occ)

    g_cells = jax.grad(loss_padded)(cells)
    g_vol = jax.grad(loss_vol)(to_vol(cells))
    np.testing.assert_allclose(from_vol(g_vol), g_cells, rtol=1e-6,
                               atol=1e-6)
    # grad layout keeps the invariant
    np.testing.assert_array_equal(
        fused3b.vol_pad_mask_mul(g_vol, N_CELL, C, SPATIAL, cfg), g_vol)


def test_make_fused_vol_none_off_route():
    # small-Q 2D config routes to v5-2d, not v4: no vol path
    cfg = SamplerConfig(dim=2, backend="pallas")
    assert fused.make_fused_vol(cfg, 4, 2, (8, 8), 100_000) is None


def test_pinn_vol_resident_step_matches_planned(monkeypatch):
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = pinn.PINNConfig(dim=3, n_cells=N_CELL, cell_dim=C, cell_size=6,
                          pde="helmholtz", backend="pallas")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)
    _, pts = _data(6)
    plan = fused.make_sample_plan(pts, params["cells"].shape, cfg.sampler)
    optimizer = optax.adam(1e-2)

    step_pl = pinn.make_train_step(cfg, optimizer, planned=True)
    step_v = pinn.make_train_step(cfg, optimizer, vol_resident=True)

    params_v = pinn.params_to_vol(params, cfg, Q)
    np.testing.assert_allclose(
        pinn.loss_fused_slots_vol(params_v, pts, cfg, plan),
        pinn.loss_fused_slots(params, pts, cfg, plan), rtol=1e-6)

    s, s_v = optimizer.init(params), optimizer.init(params_v)
    for _ in range(3):
        params, s, lval = step_pl(params, s, pts, plan)
        params_v, s_v, lval_v = step_v(params_v, s_v, pts, plan)
        np.testing.assert_allclose(lval_v, lval, rtol=1e-6)
    back = pinn.params_from_vol(params_v, cfg, Q)
    for k in params:
        np.testing.assert_allclose(back[k], params[k], rtol=1e-5, atol=1e-6)
    # the pad-slot invariant survives optimization
    vol = params_v["cells"]
    np.testing.assert_array_equal(
        fused3b.vol_pad_mask_mul(vol, N_CELL, C, SPATIAL, cfg.sampler), vol)


def test_pinn_vol_resident_rejects_off_route():
    cfg = pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                          backend="pallas")
    with pytest.raises(ValueError, match="vol_resident"):
        pinn.params_to_vol({"cells": jnp.zeros((4, 2, 8, 8))}, cfg, 100_000)
