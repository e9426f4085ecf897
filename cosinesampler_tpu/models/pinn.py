"""PIXEL-style PINN: multicell feature grids + tiny MLP + PDE residual.

The reference library exists to serve this workload (README.md:37-41; the
in-repo simulation is test/test_2d.py:26-52,221-230 and
test/test_3d.py:14-46,270-276): sample an ensemble of shifted feature grids
at collocation points, sum the cells, feed a small MLP, and train on a PDE
residual that needs u, first and second spatial derivatives — with gradients
flowing back to the cell grids through third-order mixed terms.

Everything here is a pure function over a params pytree, jit/shard-friendly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.config import SamplerConfig
from ..ops.fused import (make_fused_mega, make_fused_vol,
                         sample_features_padded,
                         sample_features_with_derivs)
from ..ops.sampler import sample


@dataclasses.dataclass(frozen=True)
class PINNConfig:
    dim: int = 2
    n_cells: int = 96            # test_2d.py:21
    cell_dim: int = 4            # test_2d.py:22 (feature channels)
    cell_size: int = 16          # test_2d.py:26
    hidden: int = 16             # test_2d.py:43-46
    kernel: str = "cosine"
    padding_mode: str = "zeros"
    align_corners: bool = True
    multicell: bool = True
    backend: str = "auto"
    precision: str = "exact"     # MXU strategy, SamplerConfig.precision
    pde: str = "allen_cahn"      # allen_cahn (2D, test_2d.py:221) |
    #                              helmholtz (3D, test_3d.py:270)

    @property
    def sampler(self) -> SamplerConfig:
        return SamplerConfig(
            dim=self.dim, kernel=self.kernel, padding_mode=self.padding_mode,
            align_corners=self.align_corners, multicell=self.multicell,
            backend=self.backend, precision=self.precision,
        )


def init_params(key, cfg: PINNConfig, dtype=jnp.float32):
    """Cell grids ~ U[0,1] (test_2d.py:26) + Glorot MLP."""
    k_cells, k_w1, k_w2 = jax.random.split(key, 3)
    spatial = (cfg.cell_size,) * cfg.dim
    cells = jax.random.uniform(
        k_cells, (cfg.n_cells, cfg.cell_dim, *spatial), dtype=dtype)
    s1 = math.sqrt(2.0 / (cfg.cell_dim + cfg.hidden))
    s2 = math.sqrt(2.0 / (cfg.hidden + 1))
    return {
        "cells": cells,
        "w1": jax.random.normal(k_w1, (cfg.cell_dim, cfg.hidden), dtype) * s1,
        "b1": jnp.zeros((cfg.hidden,), dtype),
        "w2": jax.random.normal(k_w2, (cfg.hidden, 1), dtype) * s2,
        "b2": jnp.zeros((1,), dtype),
    }


def _mlp(params, feats):
    h = jnp.tanh(feats @ params["w1"] + params["b1"])
    return (h @ params["w2"] + params["b2"])[..., 0]


def field(params, pts, cfg: PINNConfig):
    """u(points): sample cells, sum the ensemble, apply the MLP.

    pts: (Q, dim) in [-1, 1].  Returns (Q,).  Mirrors
    test_2d.py:40-52 (sample -> sum(0) -> view -> t() -> net).
    """
    cells = params["cells"]
    n = cells.shape[0]
    q = pts.shape[0]
    # shared-query grid (batch dim 1): the sampler broadcasts it across the
    # cell ensemble without materializing N copies of the coordinates
    grid = pts.reshape((1,) * cfg.dim + pts.shape)
    out = sample(cells, grid, cfg.sampler)          # (N, C, ..., Q)
    feats = out.reshape(n, cfg.cell_dim, q).sum(0)  # (C, Q)
    return _mlp(params, feats.T)


def spatial_derivative(params, pts, cfg: PINNConfig, axis: int, order: int = 1):
    """d^order u / d(axis)^order per point, via nested grad-of-sum.

    Valid because u(q) depends only on pts[q] (collocation points are
    independent), so grad of sum gives the per-point derivative.
    """
    if order == 0:
        return field(params, pts, cfg)

    def deriv(p):
        return spatial_derivative(params, p, cfg, axis, order - 1).sum()

    return jax.grad(deriv)(pts)[:, axis]


def field_and_grads(params, pts, cfg: PINNConfig):
    """u, [u_x, u_y(, u_z)], [u_xx, u_yy(, u_zz)] in one fused sampler pass.

    The sampler emits the feature ensemble's value/jacobian/diagonal Hessian
    directly (ops/fused.py); the tiny MLP is then propagated with two nested
    jvp's (forward-over-forward), so the whole second-order PINN residual
    needs NO reverse-mode retraversal of the sampler — the TPU-native
    answer to the reference's fwd+bwd+bwd^2 CUDA chain per step
    (SURVEY.md section 3.5).
    """
    feats = sample_features_with_derivs(params["cells"], pts, cfg.sampler)
    # channels-first MLP: avoids (C,Q)->(Q,C) relayouts of the big
    # per-point feature fields
    return _mlp_derivs(params, feats, cfg.dim)


def _residual_from_fields(u, u_d, u_dd, cfg: PINNConfig):
    if cfg.pde == "allen_cahn":
        return 2.0 * u_d[1] + 5.0 * u**3 - 5.0 * u - 1e-4 * u_dd[0]
    if cfg.pde == "helmholtz":
        return sum(u_dd) + u
    raise ValueError(f"unknown pde {cfg.pde!r}")


def _mlp_derivs(params, feats, dim):
    """Propagate the MLP through value/jac/diag-Hessian feature rows.

    The contractions are written as unrolled broadcast-FMAs, not matmuls:
    on TPU a f32 ``@`` defaults to ONE bf16 MXU pass, which put the
    two-kernel training path ~1.8e-3 off the f32 loss (the round-5
    megakernel accuracy finding, BENCHMARKS.md) — at K = C (4) and
    hidden = 16 the FMA form is both exact and cheaper than forcing
    Precision.HIGHEST (6 tiny passes per dot per derivative order).
    """
    f = feats[0]
    jac = [feats[1 + ax] for ax in range(dim)]
    hes = [feats[1 + dim + ax] for ax in range(dim)]
    w1 = params["w1"]                  # (C, hidden)
    b1c = params["b1"][:, None]        # (hidden, 1)
    w2c = params["w2"]                 # (hidden, 1)

    def net(z):                        # (C, Q) -> (Q,)
        pre = b1c
        for ci in range(z.shape[0]):
            pre = pre + w1[ci, :, None] * z[ci:ci + 1, :]
        h = jnp.tanh(pre)
        return (w2c * h).sum(axis=0) + params["b2"][0]

    u = net(f)
    u_d, u_dd = [], []
    for ax in range(dim):
        def first(fv, fxv):
            return jax.jvp(net, (fv,), (fxv,))

        (_, ux), (_, uxx) = jax.jvp(first, (f, jac[ax]), (jac[ax], hes[ax]))
        u_d.append(ux)
        u_dd.append(uxx)
    return u, u_d, u_dd


def residual_fused(params, pts, cfg: PINNConfig):
    """PDE residual via the fused value/derivative pass."""
    u, u_d, u_dd = field_and_grads(params, pts, cfg)
    return _residual_from_fields(u, u_d, u_dd, cfg)


def loss_fused(params, pts, cfg: PINNConfig):
    f = residual_fused(params, pts, cfg)
    return jnp.mean(f**2)


def loss_fused_slots(params, pts, cfg: PINNConfig, plan=None):
    """Slot-resident fused loss: identical value to loss_fused (up to fp
    summation order), but the whole residual is computed in the sampler's
    bin-slot layout, masked by ``occ`` — the per-step output gather and
    cotangent scatter of the query-ordered path disappear.  ``plan``
    (make_sample_plan over fixed collocation points — the reference's own
    training pattern, test_2d.py:23-26) additionally hoists the per-step
    binning/sort."""
    feats, occ, _ = sample_features_padded(params["cells"], pts, cfg.sampler,
                                           plan=plan)
    u, u_d, u_dd = _mlp_derivs(params, feats, cfg.dim)
    f = _residual_from_fields(u, u_d, u_dd, cfg)
    return jnp.sum(jnp.square(f) * occ) / pts.shape[0]


def _fused_vol_for(cfg: PINNConfig, n_queries: int):
    """The kernel-layout fused op bundle for this trainer shape (or raise:
    vol-resident training only exists where the relayout it deletes does,
    i.e. the HBM-resident v4 route)."""
    ops = make_fused_vol(cfg.sampler, cfg.n_cells, cfg.cell_dim,
                         (cfg.cell_size,) * cfg.dim, n_queries)
    if ops is None:
        raise ValueError(
            "vol_resident training requires a config/shape that routes to "
            "the HBM-resident v4 generation (large 3D volumes); this one "
            "does not — use slot_resident/planned instead")
    return ops


def vol_converters(cfg: PINNConfig, n_queries: int):
    """(to_vol, from_vol) array converters for this trainer shape.

    For callers that must convert MORE than the params' cells leaf — e.g.
    the trainer converts the Adam moments alongside (models/train.py
    _convert_layout), which is exact because the layout change is a pure
    permutation+pad and elementwise optimizers commute with it."""
    _, to_vol, from_vol = _fused_vol_for(cfg, n_queries)
    return to_vol, from_vol


def params_to_vol(params, cfg: PINNConfig, n_queries: int):
    """Convert the ``cells`` leaf to the kernel layout (one-time, before
    the vol-resident training loop; see ops.fused.make_fused_vol)."""
    _, to_vol, _ = _fused_vol_for(cfg, n_queries)
    return {**params, "cells": to_vol(params["cells"])}


def params_from_vol(params, cfg: PINNConfig, n_queries: int):
    """Inverse of params_to_vol (at the end of the loop / for checkpoints
    in the portable API layout)."""
    _, _, from_vol = _fused_vol_for(cfg, n_queries)
    return {**params, "cells": from_vol(params["cells"])}


def loss_fused_slots_vol(params, pts, cfg: PINNConfig, plan=None):
    """loss_fused_slots with ``params['cells']`` in the KERNEL layout.

    Identical loss value (up to fp summation order); the per-step volume
    pad+transpose of the forward and the gradient crop+transpose of the
    backward disappear — the two ~0.6 GB relayouts that dominated the
    128^3 train step's non-kernel time (VERDICT r2 #1)."""
    fused_vol, _, _ = _fused_vol_for(cfg, pts.shape[0])
    feats, occ, _ = fused_vol(params["cells"], pts, plan)
    u, u_d, u_dd = _mlp_derivs(params, feats, cfg.dim)
    f = _residual_from_fields(u, u_d, u_dd, cfg)
    return jnp.sum(jnp.square(f) * occ) / pts.shape[0]


def residual(params, pts, cfg: PINNConfig):
    """PDE residual at the collocation points."""
    u = field(params, pts, cfg)
    if cfg.pde == "allen_cahn":
        # f = 2 u_y + 5 u^3 - 5 u - 1e-4 u_xx     (test_2d.py:221)
        u_y = spatial_derivative(params, pts, cfg, axis=1, order=1)
        u_xx = spatial_derivative(params, pts, cfg, axis=0, order=2)
        return 2.0 * u_y + 5.0 * u**3 - 5.0 * u - 1e-4 * u_xx
    if cfg.pde == "helmholtz":
        # f = u_xx + u_yy (+ u_zz) + u            (test_3d.py:270)
        lap = sum(spatial_derivative(params, pts, cfg, axis=ax, order=2)
                  for ax in range(cfg.dim))
        return lap + u
    raise ValueError(f"unknown pde {cfg.pde!r}")


def loss(params, pts, cfg: PINNConfig):
    f = residual(params, pts, cfg)
    return jnp.mean(f**2)


def _cells_shape(cfg: PINNConfig):
    return (cfg.n_cells, cfg.cell_dim, *(cfg.cell_size,) * cfg.dim)


def mega_available(cfg: PINNConfig, n_queries: int) -> bool:
    """True when the one-pass megakernel step serves this trainer shape."""
    return make_fused_mega(cfg.sampler, _cells_shape(cfg), n_queries,
                           cfg.pde, cfg.hidden) is not None


def value_and_grad_mega(params, pts, cfg: PINNConfig, plan=None):
    """(loss, grads) of loss_fused_slots in ONE Pallas pass
    (ops/pallas/mega2w.py): the fused blend, the MLP/residual vjp and the
    cotangent splat share one kernel's fixed/IO floor instead of two, and
    the (5C, QP) feature block never round-trips HBM.  Identical
    semantics to jax.value_and_grad(loss_fused_slots) (up to fp summation
    order — per-block loss partials sum in f32); falls back to exactly
    that when the config/shape does not route to the megakernel, so the
    step is always valid."""
    run = make_fused_mega(cfg.sampler, _cells_shape(cfg), pts.shape[0],
                          cfg.pde, cfg.hidden)
    if run is None:
        return jax.value_and_grad(
            lambda p: loss_fused_slots(p, pts, cfg, plan=plan))(params)
    mlp = {k: params[k] for k in ("w1", "b1", "w2", "b2")}
    loss, grads = run(params["cells"], mlp, pts, plan=plan)
    grads = {k: g.astype(params[k].dtype) for k, g in grads.items()}
    return loss, grads


def make_train_step(cfg: PINNConfig, optimizer, fused: bool = False,
                    slot_resident: bool = False, planned: bool = False,
                    vol_resident: bool = False, megakernel: bool = False):
    """(params, opt_state, pts) -> (params, opt_state, loss); jit-ready.

    ``fused=True`` uses the single-pass value/derivative sampler
    (loss_fused); ``False`` uses nested jax.grad through the sampler chain.
    ``slot_resident=True`` (implies fused) keeps the residual in the
    sampler's bin-slot layout (loss_fused_slots) — same loss up to fp
    summation order, minus two random-access passes per step.
    ``planned=True`` (implies slot_resident) returns a step taking a 4th
    argument, the precomputed bin plan for the FIXED point set
    (``ops.fused.make_sample_plan``): the per-step query binning/sort is
    hoisted out of the loop, matching the reference workloads' fixed
    collocation points (test_2d.py:23-26, test_3d.py:16-19); see
    ops/fused.py:make_fused_planned for measured savings per trainer
    shape.
    ``vol_resident=True`` (implies planned) additionally keeps
    ``params['cells']`` in the sampler's KERNEL layout across steps
    (convert once with params_to_vol / back with params_from_vol, and
    init the optimizer on the converted params): the per-step volume
    relayouts of the v4 route disappear (loss_fused_slots_vol).  The
    optimizer runs on the padded volume; its update must vanish at zero
    gradient + zero parameter (adam/sgd/adamw do) so the pad slots stay
    exactly zero.
    ``megakernel=True`` (implies planned; 2D) computes the whole loss
    gradient in ONE Pallas pass (value_and_grad_mega) instead of a
    fwd + transpose kernel pair — the fastest 2D configuration; falls
    back to the planned two-kernel step when the shape does not route.
    """
    if megakernel:
        def step(params, opt_state, pts, plan):
            lval, grads = value_and_grad_mega(params, pts, cfg, plan)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, lval

        return step

    if vol_resident:
        def step(params, opt_state, pts, plan):
            lval, grads = jax.value_and_grad(
                lambda p: loss_fused_slots_vol(p, pts, cfg, plan))(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, lval

        return step

    if planned:
        def step(params, opt_state, pts, plan):
            lval, grads = jax.value_and_grad(
                lambda p: loss_fused_slots(p, pts, cfg, plan))(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, lval

        return step

    loss_fn = (loss_fused_slots if slot_resident
               else loss_fused if fused else loss)

    def step(params, opt_state, pts):
        lval, grads = jax.value_and_grad(lambda p: loss_fn(p, pts, cfg))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, lval

    return step
