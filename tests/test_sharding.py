"""Sharded execution on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample
from cosinesampler_tpu.parallel.sharding import (make_mesh, shard_pinn_step,
                                                 sharded_sample)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_sample_matches_single_device(mesh):
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True, backend="xla")
    cells = jnp.asarray(rng.rand(4, 2, 8, 8))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)))
    grid = jnp.broadcast_to(pts[None, None], (4, 1, 64, 2))
    want = sample(cells, grid, cfg)
    got = sharded_sample(cells, grid, cfg, mesh)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


def test_sharded_sample_gradient_psum(mesh):
    """Cell-gradients must be reduced across shards (shard_map transpose)."""
    rng = np.random.RandomState(1)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True, backend="xla")
    cells = jnp.asarray(rng.rand(4, 2, 8, 8))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)))
    grid = jnp.broadcast_to(pts[None, None], (4, 1, 64, 2))

    g_single = jax.grad(lambda c: sample(c, grid, cfg).sum())(cells)
    g_shard = jax.grad(lambda c: sharded_sample(c, grid, cfg, mesh).sum())(cells)
    np.testing.assert_allclose(g_shard, g_single, rtol=1e-12, atol=1e-14)


def test_sharded_train_step_matches_single_device(mesh):
    cfg = pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                          hidden=8, backend="xla")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (64, 2)))

    step = pinn.make_train_step(cfg, optimizer)
    p1, _, l1 = jax.jit(step)(params, opt_state, pts)
    p2, _, l2 = shard_pinn_step(step, mesh)(params, opt_state, pts)

    np.testing.assert_allclose(l2, l1, rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12)


def test_sharded_fused_pallas_interpret(mesh):
    """The FUSED flagship op under shard_map with the Pallas kernels in
    interpret mode: forward parity + the cell-cotangent psum placement
    (shard_map transpose) vs the single-device run."""
    import cosinesampler_tpu.ops.pallas as pb
    from cosinesampler_tpu.ops.fused import sample_features_with_derivs
    from cosinesampler_tpu.parallel.sharding import sharded_fused_features

    rng = np.random.RandomState(2)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                        backend="pallas")
    cells = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)), jnp.float32)

    old = pb.INTERPRET
    pb.INTERPRET = True
    try:
        want = sample_features_with_derivs(cells, pts, cfg)
        got = sharded_fused_features(cells, pts, cfg, mesh)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        g = jnp.asarray(rng.rand(*want.shape), jnp.float32)
        cot_single = jax.vjp(
            lambda c: sample_features_with_derivs(c, pts, cfg), cells
        )[1](g)[0]
        cot_shard = jax.vjp(
            lambda c: sharded_fused_features(c, pts, cfg, mesh), cells
        )[1](g)[0]
        np.testing.assert_allclose(cot_shard, cot_single, rtol=1e-4,
                                   atol=1e-5)
    finally:
        pb.INTERPRET = old


def test_hybrid_mesh_train_step_matches_single_device():
    """Multi-slice layout: a (2, 4) dcn x ici mesh with points sharded over
    BOTH axes; the replicated cell-gradient reduction becomes the
    hierarchical (ici-then-dcn) all-reduce XLA places from the shardings."""
    from cosinesampler_tpu.parallel.sharding import make_hybrid_mesh

    hmesh = make_hybrid_mesh(2, 4)
    assert hmesh.devices.shape == (2, 4)
    assert hmesh.axis_names == ("dcn", "ici")

    cfg = pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                          hidden=8, backend="xla")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (64, 2)))

    step = pinn.make_train_step(cfg, optimizer)
    p1, _, l1 = jax.jit(step)(params, opt_state, pts)
    p2, _, l2 = shard_pinn_step(step, hmesh, axis=None)(params, opt_state,
                                                        pts)
    np.testing.assert_allclose(l2, l1, rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12)


def test_hybrid_mesh_fused_features_parity():
    """The fused op sharded over the 2-axis mesh equals single-device, and
    the cell cotangent is correctly double-psum'd by shard_map transpose."""
    from cosinesampler_tpu.ops.fused import sample_features_with_derivs
    from cosinesampler_tpu.parallel.sharding import (make_hybrid_mesh,
                                                     sharded_fused_features)

    hmesh = make_hybrid_mesh(2, 4)
    rng = np.random.RandomState(3)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True, backend="xla")
    cells = jnp.asarray(rng.rand(4, 2, 8, 8), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)), jnp.float32)

    want = sample_features_with_derivs(cells, pts, cfg)
    got = sharded_fused_features(cells, pts, cfg, hmesh, axis=None)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    g = jnp.asarray(rng.rand(*want.shape), jnp.float32)
    cot_single = jax.vjp(
        lambda c: sample_features_with_derivs(c, pts, cfg), cells)[1](g)[0]
    cot_shard = jax.vjp(
        lambda c: sharded_fused_features(c, pts, cfg, hmesh, axis=None),
        cells)[1](g)[0]
    np.testing.assert_allclose(cot_shard, cot_single, rtol=1e-4, atol=1e-5)


def test_sharded_slots_planned_pallas_interpret(mesh):
    """The REAL flagship training configuration — slot-resident fused loss
    with a precomputed per-shard bin plan — under shard_map with the
    Pallas kernels in interpret mode (VERDICT r2 #6): loss and parameter
    gradients match the single-device planned path, including the psum on
    the replicated-parameter cotangents inserted by shard_map's transpose.
    """
    import cosinesampler_tpu.ops.pallas as pb
    from cosinesampler_tpu.ops.fused import make_sample_plan
    from cosinesampler_tpu.parallel.sharding import (
        make_sharded_plans, make_sharded_slots_step,
        sharded_loss_fused_slots)

    # per-shard query count must clear the v5 windowed gate (fused2w
    # V2W_MIN_Q = 2048) so the plan is a real bin plan, not the identity
    cfg = pinn.PINNConfig(dim=2, n_cells=8, cell_dim=2, cell_size=16,
                          hidden=8, backend="pallas")
    params = pinn.init_params(jax.random.PRNGKey(4), cfg)
    q = 2048 * 8
    pts = jnp.asarray(np.random.RandomState(4).uniform(-0.9, 0.9, (q, 2)),
                      jnp.float32)

    old = pb.INTERPRET
    pb.INTERPRET = True
    try:
        cells_shape = params["cells"].shape
        plans = make_sharded_plans(pts, cells_shape, cfg.sampler, mesh)
        assert plans is not None, "expected a v2w bin-plan route"
        # stacked leading shard axis on every plan leaf
        for leaf in jax.tree_util.tree_leaves(plans):
            assert leaf.shape[0] == 8

        plan1 = make_sample_plan(pts, cells_shape, cfg.sampler)
        l1, g1 = jax.value_and_grad(
            lambda p: pinn.loss_fused_slots(p, pts, cfg, plan=plan1))(params)
        l2, g2 = jax.value_and_grad(
            lambda p: sharded_loss_fused_slots(p, pts, cfg, mesh, plans))(
            params)
        np.testing.assert_allclose(l2, l1, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)

        # one optimizer step through the jitted sharded step fn
        optimizer = optax.adam(1e-3)
        step = make_sharded_slots_step(cfg, optimizer, mesh)
        p2, _, lval = step(params, optimizer.init(params), pts, plans)
        assert np.isfinite(float(lval))
        assert not np.allclose(p2["cells"], params["cells"])
    finally:
        pb.INTERPRET = old


def test_sharded_vol_resident_v3b_pallas_interpret(mesh):
    """The 128^3-CLASS flagship configuration — vol-resident (kernel-
    layout) cells + per-shard plans on the v4 bricked route — under
    shard_map with the Pallas kernels in interpret mode (VERDICT r3 #5):
    loss and parameter gradients match the single-device vol-resident
    path, and one optimizer step runs through the jitted sharded step.
    """
    import cosinesampler_tpu.ops.pallas as pb
    from cosinesampler_tpu.ops import fused
    from cosinesampler_tpu.parallel.sharding import (
        make_sharded_plans, make_sharded_vol_step,
        sharded_loss_fused_slots_vol)

    # cell_size=6 3D routes to the v4 bricked generation (same shape family
    # as tests/test_fused_vol.py); 8 shards x 120 local points
    cfg = pinn.PINNConfig(dim=3, n_cells=5, cell_dim=3, cell_size=6,
                          hidden=8, pde="helmholtz", backend="pallas")
    params = pinn.init_params(jax.random.PRNGKey(7), cfg)
    q = 120 * 8
    pts = jnp.asarray(np.random.RandomState(7).uniform(-0.9, 0.9, (q, 3)),
                      jnp.float32)
    assert fused.make_fused_vol(cfg.sampler, cfg.n_cells, cfg.cell_dim,
                                (6, 6, 6), q // 8) is not None

    old = pb.INTERPRET
    pb.INTERPRET = True
    try:
        cells_shape = params["cells"].shape
        plans = make_sharded_plans(pts, cells_shape, cfg.sampler, mesh)
        assert plans is not None, "expected a v3b bin-plan route"
        # the resident layout must be chosen for the LOCAL query count
        params_v = pinn.params_to_vol(params, cfg, q // 8)

        plan1 = fused.make_sample_plan(pts, cells_shape, cfg.sampler)
        params_v1 = pinn.params_to_vol(params, cfg, q)
        l1, g1 = jax.value_and_grad(
            lambda p: pinn.loss_fused_slots_vol(p, pts, cfg, plan=plan1))(
            params_v1)
        l2, g2 = jax.value_and_grad(
            lambda p: sharded_loss_fused_slots_vol(p, pts, cfg, mesh,
                                                   plans))(params_v)
        np.testing.assert_allclose(l2, l1, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)

        optimizer = optax.adam(1e-3)
        step = make_sharded_vol_step(cfg, optimizer, mesh)
        p2, _, lval = step(params_v, optimizer.init(params_v), pts, plans)
        assert np.isfinite(float(lval))
        assert not np.allclose(p2["cells"], params_v["cells"])
        # the optimizer step keeps the pad-slot-zero invariant the vol
        # forward relies on
        from cosinesampler_tpu.ops.pallas import fused3b
        np.testing.assert_array_equal(
            fused3b.vol_pad_mask_mul(p2["cells"], cfg.n_cells, cfg.cell_dim,
                                     (6, 6, 6), cfg.sampler), p2["cells"])
    finally:
        pb.INTERPRET = old


def test_graft_dryrun_multichip():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_check_vma_limitation_probe(mesh):
    """Canary for the check_vma=False debt (parallel/sharding.py).

    Every shard_map wrapper in parallel/sharding.py disables the static
    replication (vma) check because jax's vma inference cannot see through
    the sampler's custom_vjp chain IN THE TRANSPOSE: the forward passes
    with check_vma=True, but jax.grad of the same shard_map fails on the
    replicated-parameter cotangents (probed round 3, re-pinned here).
    This test asserts the KNOWN failure, so the day a jax upgrade fixes
    vma inference for custom_vjp it fails loudly — the signal to flip
    check_vma back to True in parallel/sharding.py and delete this probe.
    """
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(3)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True, backend="xla")
    cells = jnp.asarray(rng.rand(4, 2, 8, 8))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)))
    grid = jnp.broadcast_to(pts[None, None], (4, 1, 64, 2))

    checked = jax.shard_map(
        lambda c, g: sample(c, g, cfg), mesh=mesh,
        in_specs=(P(), P(None, None, "points", None)),
        out_specs=P(None, None, None, "points"),
        check_vma=True,
    )
    # the forward is fine under the static check
    np.testing.assert_allclose(checked(cells, grid),
                               sample(cells, grid, cfg), rtol=1e-12, atol=0)
    # ... but its transpose is not: the replicated-cell cotangent's vma
    # cannot be inferred through the custom_vjp chain
    with pytest.raises(Exception):
        jax.grad(lambda c: checked(c, grid).sum())(cells)
