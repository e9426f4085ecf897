"""End-to-end trainer: loss decreases, checkpoint resume replays the stream."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.models.train import TrainConfig, train


def _cfg(tmp=None, steps=12, fused=True):
    return TrainConfig(
        model=pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                              hidden=8, backend="xla"),
        batch_points=128, steps=steps, lr=3e-3, seed=0, fused=fused,
        checkpoint_dir=tmp, checkpoint_every=6, log_every=4,
    )


def test_train_reduces_loss():
    _, metrics = train(_cfg())
    assert metrics[-1]["loss"] < metrics[0]["loss"] * 1.5
    assert metrics[-1]["steps_per_sec"] > 0


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    straight_params, _ = train(_cfg(steps=12))

    ck = str(tmp_path / "ck")
    train(_cfg(tmp=ck, steps=6))          # run half, checkpoints at step 6
    resumed_params, _ = train(_cfg(tmp=ck, steps=12))  # resumes from 6

    for a, b in zip(_leaves(straight_params), _leaves(resumed_params)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_train_fixed_points_planned(monkeypatch):
    """fixed_points=True: one collocation set, bin plan built once, and the
    planned step trains (loss finite + decreasing trend).  Uses the pallas
    backend in interpret mode so the plan actually routes (the v5 2D
    windowed kernel needs >= 2048 queries)."""
    import cosinesampler_tpu.ops.pallas as pb
    from cosinesampler_tpu.ops.fused import make_sample_plan

    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                              hidden=8, backend="pallas"),
        batch_points=2048, steps=3, lr=3e-3, seed=0, fused=True,
        fixed_points=True, log_every=1,
    )
    # the plan must actually route for this config (guards against the
    # test silently degrading to the unplanned path)
    probe = make_sample_plan(
        jnp.zeros((cfg.batch_points, 2), jnp.float32),
        (4, 2, 8, 8), cfg.model.sampler)
    assert probe is not None
    _, metrics = train(cfg)
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert metrics[-1]["loss"] < metrics[0]["loss"] * 1.5


def test_train_vol_resident(monkeypatch, tmp_path):
    """vol_resident=True: the trainer converts params AND Adam moments to
    the kernel layout, trains there, checkpoints in the PORTABLE layout,
    and returns API-layout params — final params match the planned run
    bit-for-fp-bit (same optimizer trajectory, layout-permuted)."""
    import cosinesampler_tpu.ops.pallas as pb

    monkeypatch.setattr(pb, "INTERPRET", True)

    def cfgv(vol, tmp=None):
        return TrainConfig(
            model=pinn.PINNConfig(dim=3, n_cells=5, cell_dim=3, cell_size=6,
                                  hidden=8, pde="helmholtz",
                                  backend="pallas"),
            batch_points=120, steps=4, lr=3e-3, seed=0, fused=True,
            fixed_points=True, vol_resident=vol, log_every=2,
            checkpoint_dir=tmp, checkpoint_every=2,
        )

    p_planned, _ = train(cfgv(False))
    p_vol, metrics = train(cfgv(True, tmp=str(tmp_path / "ck")))
    assert all(np.isfinite(m["loss"]) for m in metrics)
    for k in p_planned:
        np.testing.assert_allclose(p_vol[k], p_planned[k], rtol=1e-5,
                                   atol=1e-7)
    # checkpoints were written in the portable API layout
    import jax
    import optax
    from cosinesampler_tpu.utils import checkpoint as ckpt
    optimizer = optax.adam(3e-3)
    tmpl_p = pinn.init_params(jax.random.PRNGKey(0), cfgv(False).model)
    step_no, state = ckpt.restore_state(
        str(tmp_path / "ck"), {"params": tmpl_p, "opt": optimizer.init(tmpl_p)})
    assert step_no == 4
    assert state["params"]["cells"].shape == tmpl_p["cells"].shape


def test_train_vol_resident_requires_plan():
    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=3, n_cells=5, cell_dim=3, cell_size=6,
                              hidden=8, pde="helmholtz", backend="pallas"),
        batch_points=120, steps=2, fused=True, fixed_points=False,
        vol_resident=True,
    )
    with pytest.raises(ValueError, match="vol_resident"):
        train(cfg)


def test_train_fixed_points_xla_fallback():
    """fixed_points=True on the XLA backend: no plan routes (fused_plan is
    a pallas-only registration) and the trainer falls back to the regular
    fused step on the same fixed batch."""
    cfg = _cfg()
    cfg = TrainConfig(**{**cfg.__dict__, "fixed_points": True, "steps": 6})
    _, metrics = train(cfg)
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_train_shard_matches_unsharded():
    """shard=True (8-device CPU mesh, XLA backend) reproduces the
    single-device run: replicated params + psum'd grads are exact data
    parallelism, so the trained params match."""
    single, _ = train(_cfg(steps=6))
    cfg = TrainConfig(**{**_cfg(steps=6).__dict__, "shard": True})
    sharded, metrics = train(cfg)
    assert all(np.isfinite(m["loss"]) for m in metrics)
    for a, b in zip(_leaves(single), _leaves(sharded)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


def test_train_shard_rejects_indivisible_batch():
    cfg = TrainConfig(**{**_cfg().__dict__, "shard": True,
                         "batch_points": 130})
    with pytest.raises(ValueError, match="divisible"):
        train(cfg)


def test_train_shard_planned_pallas_interpret(monkeypatch):
    """shard + fixed_points: per-shard plans (make_sharded_plans) feed the
    sharded slot-resident step through the Pallas kernels in interpret
    mode; the trainer's flagship multi-device configuration."""
    import cosinesampler_tpu.ops.pallas as pb

    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                              hidden=8, backend="pallas"),
        batch_points=2048 * 8, steps=2, lr=3e-3, seed=0, fused=True,
        fixed_points=True, shard=True, log_every=1,
    )
    _, metrics = train(cfg)
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_train_shard_vol_resident_pallas_interpret(monkeypatch):
    """shard + vol_resident: the kernel-layout cells (converted with the
    LOCAL query count) train under make_sharded_vol_step."""
    import cosinesampler_tpu.ops.pallas as pb

    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=3, n_cells=5, cell_dim=3, cell_size=6,
                              hidden=8, pde="helmholtz", backend="pallas"),
        batch_points=120 * 8, steps=2, lr=3e-3, seed=0, fused=True,
        fixed_points=True, vol_resident=True, shard=True, log_every=1,
    )
    params, metrics = train(cfg)
    assert all(np.isfinite(m["loss"]) for m in metrics)
    # returned params are back in the portable API layout
    assert params["cells"].shape == (5, 3, 6, 6, 6)


def test_train_autotune_flag_invokes_workload_tune(monkeypatch):
    """--autotune runs the one-time workload tune BEFORE any plan is
    built, with the cells and the LOCAL point slice (mocked sweep)."""
    from cosinesampler_tpu.models import train as train_mod

    calls = []

    def fake_tune_workload(cells, points, cfg, *, reps=30, save=True,
                           log=print):
        calls.append((tuple(cells.shape), points.shape[0], reps))
        return None

    monkeypatch.setattr("cosinesampler_tpu.utils.autotune.tune_workload",
                        fake_tune_workload)
    cfg = _cfg(steps=2)
    cfg.autotune = True
    cfg.autotune_reps = 5
    _, metrics = train(cfg)
    assert calls == [((4, 2, 8, 8), 128, 5)]
    assert np.isfinite(metrics[-1]["loss"])
