"""Precomputed bin plans (make_sample_plan): fixed-point-set binning
hoisted out of the slot-resident ops.

The reference's PINN workloads sample their collocation points once per
run (/root/reference/test/test_2d.py:23-26, test_3d.py:16-19); the
binning/sort the slot-resident kernels pay per call (as expensive as the
forward kernel at the 1M-point 128^3 sweep) can therefore be computed
once.  A plan must be a pure function of (points, shape, cfg): every test
anchors the planned path against the unplanned one bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused2w, fused3b, fused3w

N_CELL, C, Q = 5, 3, 120


def _data3(seed=0, spatial=(6, 6, 6), q=Q, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), dtype)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 3)), jnp.float32)
    return cells, pts


def _data2(seed=0, spatial=(8, 8), q=Q):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 2)), jnp.float32)
    return cells, pts


@pytest.mark.parametrize("mod,blend,spatial,data", [
    (fused3w, "pallas_fused3w_blend_padded", (6, 6, 6), _data3),
    (fused2w, "pallas_fused2w_blend_padded", (8, 8), _data2),
    (fused3b, "pallas_fused3b_blend_padded", (6, 6, 6), _data3),
])
def test_planned_blend_matches_unplanned(mod, blend, spatial, data):
    cfg = SamplerConfig(dim=len(spatial), backend="pallas")
    cells, pts = data(0, spatial)
    fn = getattr(mod, blend)
    want_p, want_occ, want_pos = fn(cells, pts, cfg, q_block=64,
                                    interpret=True)
    plan = mod.make_plan(pts, spatial, cfg, q_block=64)
    got_p, got_occ, got_pos = fn(cells, pts, cfg, q_block=64,
                                 interpret=True, plan=plan)
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_array_equal(got_occ, want_occ)
    np.testing.assert_array_equal(got_pos, want_pos)


@pytest.mark.parametrize("mod,bwd,spatial,data,k_rows", [
    (fused3w, "pallas_fused3w_bwd_padded", (6, 6, 6), _data3, 7),
    (fused2w, "pallas_fused2w_bwd_padded", (8, 8), _data2, 5),
    (fused3b, "pallas_fused3b_bwd_padded", (6, 6, 6), _data3, 7),
])
def test_planned_bwd_matches_unplanned(mod, bwd, spatial, data, k_rows):
    cfg = SamplerConfig(dim=len(spatial), backend="pallas")
    cells, pts = data(3, spatial)
    plan = mod.make_plan(pts, spatial, cfg, q_block=64)
    qp = plan[1].shape[0]
    g_p = jnp.asarray(np.random.RandomState(4).randn(k_rows, C, qp),
                      jnp.float32) * plan[1][None, None, :]
    fn = getattr(mod, bwd)
    want = fn(g_p, pts, spatial, cfg, N_CELL, q_block=64, interpret=True)
    got = fn(g_p, pts, spatial, cfg, N_CELL, q_block=64, interpret=True,
             plan=plan)
    np.testing.assert_array_equal(got, want)


def test_make_sample_plan_xla_backend_is_none():
    cfg = SamplerConfig(dim=2, backend="xla")
    _, pts = _data2(1)
    assert fused.make_sample_plan(pts, (N_CELL, C, 8, 8), cfg) is None


def test_make_sample_plan_validates_points():
    cfg = SamplerConfig(dim=3, backend="pallas")
    with pytest.raises(ValueError, match="points must be"):
        fused.make_sample_plan(jnp.zeros((4, 2)), (N_CELL, C, 6, 6, 6), cfg)


def test_padded_api_rejects_stale_plan(monkeypatch):
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(2, q=2048)
    plan = fused.make_sample_plan(pts, cells.shape, cfg)
    assert plan is not None
    with pytest.raises(ValueError, match="point-set-specific"):
        fused.sample_features_padded(cells, pts[:100], cfg, plan=plan)


def test_padded_api_planned_matches_unplanned(monkeypatch):
    """Public API: plan in, bit-identical out in query order (v5 3D
    route, interpret).  make_sample_plan trims the all-padding tail
    blocks (trim_plan), so the planned slot count may be smaller; the
    real-slot layout and values must be identical."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(5, q=2048)
    plan = fused.make_sample_plan(pts, cells.shape, cfg)
    assert plan is not None
    want_p, want_occ, want_pos = fused.sample_features_padded(cells, pts, cfg)
    got_p, got_occ, got_pos = fused.sample_features_padded(cells, pts, cfg,
                                                           plan=plan)
    np.testing.assert_array_equal(got_pos, want_pos)
    qp = got_p.shape[-1]
    assert qp <= want_p.shape[-1]
    np.testing.assert_array_equal(got_p, want_p[..., :qp])
    np.testing.assert_array_equal(got_occ, want_occ[:qp])
    assert not np.any(want_occ[qp:])


def test_padded_api_planned_grad_matches(monkeypatch):
    """Cell gradients through the planned custom_vjp == unplanned."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(6, q=2048)
    plan = fused.make_sample_plan(pts, cells.shape, cfg)

    def loss_plain(c):
        out_p, occ, _ = fused.sample_features_padded(c, pts, cfg)
        return jnp.sum(out_p**2 * occ[None, None, :])

    def loss_planned(c):
        out_p, occ, _ = fused.sample_features_padded(c, pts, cfg, plan=plan)
        return jnp.sum(out_p**2 * occ[None, None, :])

    np.testing.assert_array_equal(jax.grad(loss_planned)(cells),
                                  jax.grad(loss_plain)(cells))


def test_padded_api_planned_points_grad(monkeypatch):
    """The points cotangent survives the planned slot indirection."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(7, q=2048)
    plan = fused.make_sample_plan(pts, cells.shape, cfg)

    def loss_plain(p):
        out_p, occ, _ = fused.sample_features_padded(cells, p, cfg)
        return jnp.sum(out_p[0] ** 2 * occ[None, :])

    def loss_planned(p):
        out_p, occ, _ = fused.sample_features_padded(cells, p, cfg,
                                                     plan=plan)
        return jnp.sum(out_p[0] ** 2 * occ[None, :])

    np.testing.assert_allclose(jax.grad(loss_planned)(pts),
                               jax.grad(loss_plain)(pts),
                               rtol=1e-6, atol=1e-7)


def test_planned_fallback_keeps_slot_layout(monkeypatch):
    """A plan built for f32 points with f64 cells: the padded kernels bail
    (f64 routes to XLA) but the planned op must keep the plan's slot
    layout by scattering the query-ordered result."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = SamplerConfig(dim=3, backend="pallas")
        cells, pts = _data3(8, q=2048, dtype=jnp.float64)
        plan = fused.make_sample_plan(pts, cells.shape, cfg)
        assert plan is not None   # the route is shape-based; values bail
        out_p, occ, positions = fused.sample_features_padded(cells, pts, cfg,
                                                             plan=plan)
        want = fused.sample_features_with_derivs(cells, pts, cfg)
        qp = out_p.shape[-1]
        got = out_p.reshape(-1, qp)[:, positions].reshape(want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)
        assert qp == plan[1].shape[0]
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_train_step_planned_matches_slot_resident(monkeypatch):
    """Planned train step == slot-resident step, loss and params, through
    the v5 kernels in interpret mode (plan traced through value_and_grad)."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    import optax

    q = 2048
    cfg = pinn.PINNConfig(dim=3, n_cells=4, cell_dim=2, cell_size=6,
                          pde="helmholtz", backend="pallas")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (q, 3)),
                      jnp.float32)
    opt = optax.adam(1e-3)
    plan = fused.make_sample_plan(pts, params["cells"].shape, cfg.sampler)
    assert plan is not None

    pl_step = pinn.make_train_step(cfg, opt, planned=True)
    sr_step = pinn.make_train_step(cfg, opt, slot_resident=True)

    p1, s1 = params, opt.init(params)
    p2, s2 = params, opt.init(params)
    for _ in range(2):
        p1, s1, l1 = pl_step(p1, s1, pts, plan)
        p2, s2, l2 = sr_step(p2, s2, pts)
        np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(p1["cells"], p2["cells"])


@pytest.mark.parametrize("mod,blend,spatial,data", [
    (fused3w, "pallas_fused3w_blend_padded", (6, 6, 6), _data3),
    (fused2w, "pallas_fused2w_blend_padded", (8, 8), _data2),
    (fused3b, "pallas_fused3b_blend_padded", (6, 6, 6), _data3),
])
def test_trimmed_plan_matches_untrimmed(mod, blend, spatial, data):
    """trim_plan drops only the all-padding tail blocks: the kernels read
    their grid from the plan shapes, so query-ordered outputs are
    bit-identical while the padded slot count shrinks."""
    cfg = SamplerConfig(dim=len(spatial), backend="pallas")
    cells, pts = data(0, spatial)
    fn = getattr(mod, blend)
    plan = mod.make_plan(pts, spatial, cfg, q_block=64)
    trimmed = fused.trim_plan(plan)
    # the static bound pads ~nbins tail blocks; a 120-query cloud must trim
    assert trimmed[1].shape[0] < plan[1].shape[0]
    q = pts.shape[0]

    def ordered(p):
        out_p, _, pos = fn(cells, pts, cfg, q_block=64, interpret=True,
                           plan=p)
        qp = out_p.shape[-1]
        k = out_p.shape[0] * out_p.shape[1]
        return np.asarray(out_p.reshape(k, qp)[:, pos])

    np.testing.assert_array_equal(ordered(plan), ordered(trimmed))


def test_trim_plan_is_noop_under_jit():
    cfg = SamplerConfig(dim=3, backend="pallas")
    _, pts = _data3()

    @jax.jit
    def build(p):
        plan = fused3b.make_plan(p, (6, 6, 6), cfg, 64)
        return fused.trim_plan(plan)[1].shape[0]

    # under a tracer the shapes must stay static (no trim)
    assert build(pts) == fused3b.make_plan(pts, (6, 6, 6), cfg, 64)[1].shape[0]
