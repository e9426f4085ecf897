"""Slot-resident (padded) fused path: kernels, custom_vjp, PINN loss.

The padded variants return outputs in the binning's slot layout plus an
occupancy mask, so a consumer can keep the whole training step in slot
space and skip the per-step output gather / cotangent scatter.  Parity
anchor is always the query-ordered path.
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


def _data3(seed=0, spatial=(6, 6, 6), q=Q):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 3)), jnp.float32)
    return cells, pts


def _data2(seed=0, spatial=(8, 8), q=Q):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(N_CELL, C, *spatial), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 2)), jnp.float32)
    return cells, pts


def test_v3w_padded_matches_gathered():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3()
    want = fused3w.pallas_fused3w_blend(cells, pts, cfg, q_block=64,
                                        interpret=True)
    out_p, occ, positions = fused3w.pallas_fused3w_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    got = out_p.reshape(7 * C, qp)[:, positions].reshape(7, C, Q)
    np.testing.assert_array_equal(got, want)
    # positions are real slots; padding slots are zero-masked
    occ_np = np.asarray(occ)
    assert occ_np[np.asarray(positions)].min() == 1.0
    assert occ_np.sum() == Q
    pad = np.ones(qp, bool)
    pad[np.asarray(positions)] = False
    np.testing.assert_array_equal(
        np.asarray(out_p)[:, :, pad], 0.0)


def test_v2w_padded_matches_gathered():
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells, pts = _data2()
    want = fused2w.pallas_fused2w_blend(cells, pts, cfg, q_block=64,
                                        interpret=True)
    out_p, occ, positions = fused2w.pallas_fused2w_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    got = out_p.reshape(5 * C, qp)[:, positions].reshape(5, C, Q)
    np.testing.assert_array_equal(got, want)
    assert np.asarray(occ).sum() == Q


def test_v3w_padded_bwd_matches_bwd():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(3)
    g = jnp.asarray(np.random.RandomState(4).randn(7, C, Q), jnp.float32)
    want = fused3w.pallas_fused3w_bwd(g, pts, (6, 6, 6), cfg, N_CELL,
                                      q_block=64, interpret=True)
    # scatter g into slot space, then the padded bwd must agree exactly
    out_p, _, positions = fused3w.pallas_fused3w_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    g_p = jnp.zeros((7 * C, qp), jnp.float32).at[:, positions].set(
        g.reshape(7 * C, Q)).reshape(7, C, qp)
    got = fused3w.pallas_fused3w_bwd_padded(g_p, pts, (6, 6, 6), cfg,
                                            N_CELL, q_block=64,
                                            interpret=True)
    np.testing.assert_array_equal(got, want)


def test_v2w_padded_bwd_matches_bwd():
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells, pts = _data2(3)
    g = jnp.asarray(np.random.RandomState(4).randn(5, C, Q), jnp.float32)
    want = fused2w.pallas_fused2w_bwd(g, pts, (8, 8), cfg, N_CELL,
                                     q_block=64, interpret=True)
    out_p, _, positions = fused2w.pallas_fused2w_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    g_p = jnp.zeros((5 * C, qp), jnp.float32).at[:, positions].set(
        g.reshape(5 * C, Q)).reshape(5, C, qp)
    got = fused2w.pallas_fused2w_bwd_padded(g_p, pts, (8, 8), cfg, N_CELL,
                                            q_block=64, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_v3b_padded_matches_gathered():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(9)
    want = fused3b.pallas_fused3b_blend(cells, pts, cfg, q_block=64,
                                        interpret=True)
    out_p, occ, positions = fused3b.pallas_fused3b_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    got = out_p.reshape(7 * C, qp)[:, positions].reshape(7, C, Q)
    np.testing.assert_array_equal(got, want)
    assert np.asarray(occ).sum() == Q


def test_v3b_padded_bwd_matches_bwd():
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells, pts = _data3(10)
    g = jnp.asarray(np.random.RandomState(11).randn(7, C, Q), jnp.float32)
    want = fused3b.pallas_fused3b_bwd(g, pts, (6, 6, 6), cfg, N_CELL,
                                      q_block=64, interpret=True)
    out_p, _, positions = fused3b.pallas_fused3b_blend_padded(
        cells, pts, cfg, q_block=64, interpret=True)
    qp = out_p.shape[-1]
    g_p = jnp.zeros((7 * C, qp), jnp.float32).at[:, positions].set(
        g.reshape(7 * C, Q)).reshape(7, C, qp)
    got = fused3b.pallas_fused3b_bwd_padded(g_p, pts, (6, 6, 6), cfg,
                                            N_CELL, q_block=64,
                                            interpret=True)
    np.testing.assert_array_equal(got, want)


def test_occ_mask_matches_scatter():
    """_occ_mask (boundary scatters + cumsum) == the per-query scatter it
    replaced, including empty bins and a full last bin."""
    from cosinesampler_tpu.ops.pallas.fused3b import _occ_mask
    rng = np.random.RandomState(0)
    for trial in range(20):
        nbins = rng.randint(1, 9)
        counts = rng.randint(0, 7, size=nbins)
        if trial == 0:
            counts[:] = 0
        q_block = 4
        padded = ((counts + q_block - 1) // q_block) * q_block
        offs = np.cumsum(padded) - padded
        qp = int(padded.sum()) + (q_block if trial % 3 else 0)
        want = np.zeros(qp, np.float32)
        for b in range(nbins):
            want[offs[b]:offs[b] + counts[b]] = 1.0
        got = _occ_mask(jnp.asarray(offs, jnp.int32),
                        jnp.asarray(counts, jnp.int32), qp)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_api_identity_plan_fallback():
    """backend=xla has no padded kernel: identity plan, exact parity."""
    cfg = SamplerConfig(dim=2, backend="xla")
    cells, pts = _data2(1)
    want = fused.sample_features_with_derivs(cells, pts, cfg)
    out_p, occ, positions = fused.sample_features_padded(cells, pts, cfg)
    np.testing.assert_array_equal(out_p, want)
    np.testing.assert_array_equal(occ, jnp.ones((Q,)))
    np.testing.assert_array_equal(positions, jnp.arange(Q))


@pytest.mark.parametrize("dim", [2, 3])
def test_api_padded_grad_matches_regular(dim):
    """Masked slot-space loss gradient == query-ordered loss gradient
    (identity-plan route; the kernel route is pinned by the kernel-level
    bwd tests above and the interpret-mode chain test below)."""
    cfg = SamplerConfig(dim=dim, backend="xla")
    cells, pts = (_data2(7) if dim == 2 else _data3(7))

    def loss_reg(c):
        out = fused.sample_features_with_derivs(c, pts, cfg)
        return jnp.sum(out**2)

    def loss_pad(c):
        out_p, occ, _ = fused.sample_features_padded(c, pts, cfg)
        return jnp.sum(out_p**2 * occ[None, None, :])

    np.testing.assert_allclose(jax.grad(loss_pad)(cells),
                               jax.grad(loss_reg)(cells),
                               rtol=1e-6, atol=1e-6)


def test_api_padded_points_grad():
    """The points cotangent survives the slot indirection (identity plan)."""
    cfg = SamplerConfig(dim=2, backend="xla")
    cells, pts = _data2(8)

    def loss_reg(p):
        out = fused.sample_features_with_derivs(cells, p, cfg)
        return jnp.sum(out[0] ** 2)

    def loss_pad(p):
        out_p, occ, _ = fused.sample_features_padded(cells, p, cfg)
        return jnp.sum(out_p[0] ** 2 * occ[None, :])

    np.testing.assert_allclose(jax.grad(loss_pad)(pts),
                               jax.grad(loss_reg)(pts),
                               rtol=1e-5, atol=1e-6)


def test_train_step_slot_resident_interpret(monkeypatch):
    """Full slot-resident train step through the v5 kernels (interpret):
    loss trajectory matches the query-ordered fused step."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    import optax

    # (6,6,6): wp=8 -> rows=16, gy=14, nby=1, nbins=8; min_q = 2048
    q = 2048
    cfg = pinn.PINNConfig(dim=3, n_cells=4, cell_dim=2, cell_size=6,
                          pde="helmholtz", backend="pallas")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (q, 3)),
                      jnp.float32)
    opt = optax.adam(1e-3)

    sr_step = pinn.make_train_step(cfg, opt, slot_resident=True)
    reg_step = pinn.make_train_step(cfg, opt, fused=True)

    # the padded kernel must actually be in play for this config
    assert fused3w.supports(cfg.sampler, params["cells"].shape,
                            6 * 1024 * 1024, q)

    p1, s1 = params, opt.init(params)
    p2, s2 = params, opt.init(params)
    for _ in range(2):
        p1, s1, l1 = sr_step(p1, s1, pts)
        p2, s2, l2 = reg_step(p2, s2, pts)
        np.testing.assert_allclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(p1["cells"], p2["cells"], rtol=1e-4,
                               atol=1e-6)
