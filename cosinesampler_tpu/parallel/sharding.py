"""Multi-device scaling: shard queries over the ICI mesh, replicate cells.

The reference is strictly single-GPU (OptionalCUDAGuard device pinning,
cosine_sampler_2d.cpp:53; hardcoded 'cuda', modules_2d.py:25-27) with no
communication layer at all (SURVEY.md section 2.3).  The TPU-native scaling
story needs no custom transport either — the op is embarrassingly parallel
over query points:

* collocation points  -> sharded along the mesh "points" axis;
* cell grids + MLP    -> replicated;
* gradients w.r.t. the cells -> one ``psum`` over the mesh, inserted by XLA
  from the sharding annotations (or explicitly by shard_map's transpose).

Collectives therefore ride ICI; DCN would only appear across slices for a
multi-slice sweep.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.config import SamplerConfig
from ..ops.fused import sample_features_with_derivs
from ..ops.sampler import sample

POINTS_AXIS = "points"
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_mesh(n_devices: Optional[int] = None, axis: str = POINTS_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_hybrid_mesh(n_slices: int, per_slice: Optional[int] = None,
                     axes: tuple = (DCN_AXIS, ICI_AXIS)) -> Mesh:
    """(n_slices, per_slice) mesh for multi-slice pods: DCN major, ICI minor.

    Query points shard over BOTH axes (the op is embarrassingly data-
    parallel, SURVEY.md section 2.3), so the forward needs no collective at
    all and the cell-gradient ``psum(('dcn', 'ici'))`` reduces within each
    slice over ICI first, then once across slices over DCN — the layout the
    scaling-book recipe prescribes for a pure-DP workload.  On real
    multi-slice TPU hardware the device grid comes from
    ``mesh_utils.create_hybrid_device_mesh`` (DCN-aware placement); on a
    single slice / the virtual CPU mesh it is a plain reshape, which keeps
    the axis semantics (and every test) identical.
    """
    devs = jax.devices()
    per_slice = per_slice or len(devs) // n_slices
    n = n_slices * per_slice
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    if len({getattr(d, "slice_index", 0) for d in devs}) > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (per_slice,), (n_slices,), devices=devs[:n])
        return Mesh(grid.reshape(n_slices, per_slice), axes)
    return Mesh(np.asarray(devs[:n]).reshape(n_slices, per_slice), axes)


def _resolve_axis(mesh: Mesh, axis):
    """None -> shard points over EVERY mesh axis (1-axis "points" meshes
    and hybrid (dcn, ici) meshes alike); a name or tuple passes through."""
    return tuple(mesh.axis_names) if axis is None else axis


def sharded_sample(input, grid, cfg: SamplerConfig, mesh: Mesh,
                   axis=POINTS_AXIS):
    """Sample with queries sharded over the mesh and cells replicated.

    grid is sharded along its second-to-last spatial axis (the flattened
    query axis in the (N, 1[, 1], Q, d) convention).  Differentiable: the
    cell-gradient psum falls out of shard_map's transpose.
    """
    axis = _resolve_axis(mesh, axis)
    d = cfg.dim
    qspec = P(*((None,) * d + (axis, None)))

    def local(inp, g):
        return sample(inp, g, cfg)

    # check_vma=False: the static replication checker cannot see through the
    # sampler's custom_vjp chain; the transpose still inserts the psum on the
    # replicated-cell cotangent (verified numerically in tests/test_sharding).
    # Re-probed round 3: with check_vma=True the FORWARD passes, but
    # jax.grad fails in shard_map's transpose ("out_specs require
    # replication which can't be statically inferred" on the replicated
    # parameter cotangents) — a custom_vjp/vma-inference limitation, not a
    # missing psum; every sharded-vs-single gradient test pins the values.
    # tests/test_sharding.py::test_check_vma_limitation_probe asserts this
    # exact failure and will FAIL the day upstream fixes vma inference for
    # custom_vjp — flip every check_vma=False here back to True then.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), qspec),
        out_specs=P(*((None,) * (d + 1) + (axis,))),
        check_vma=False,
    )
    return fn(input, grid)


def sharded_fused_features(cells, points, cfg: SamplerConfig, mesh: Mesh,
                           axis=POINTS_AXIS):
    """The fused PINN op (value/jac/diag-Hessian) with points sharded.

    Each shard runs the full fused kernel stack (Pallas on TPU) on its
    slice of the query cloud; the cells stay replicated and their
    cotangent is psum-reduced by shard_map's transpose.  This is the
    flagship op under shard_map — the v1 `sharded_sample` path wraps the
    per-order blend family instead.  On a hybrid (dcn, ici) mesh pass
    ``axis=None`` (or the axis tuple) to shard points over both axes.
    """
    axis = _resolve_axis(mesh, axis)

    def local(c, p):
        return sample_features_with_derivs(c, p, cfg)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    return fn(cells, points)


def make_sharded_plans(points, cells_shape, cfg: SamplerConfig, mesh: Mesh,
                       axis=POINTS_AXIS):
    """Per-shard bin plans for the slot-resident kernels, or None.

    The slot layout of the binned kernel generations depends on the LOCAL
    point set, so a sharded training loop needs one plan per shard: this
    builds each shard's plan inside shard_map (the same split the sharded
    loss will see) and returns the plan pytree with a leading shard axis,
    sharded over the mesh.  Equal shard sizes give equal (static) plan
    shapes, so the stack is well-formed.  Plans built under shard_map are
    traced, so ``ops.fused.trim_plan`` is a no-op here (the all-padding
    tail blocks stay — the static worst case); None when the config does
    not route to a slot-resident kernel (callers then pass plans=None).
    """
    from ..ops.fused import make_sample_plan

    axis = _resolve_axis(mesh, axis)
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    n_shards = int(np.prod([mesh.shape[a] for a in names]))
    probe = jax.eval_shape(
        lambda p: make_sample_plan(p, cells_shape, cfg),
        jax.ShapeDtypeStruct(
            (points.shape[0] // n_shards, points.shape[1]), points.dtype))
    if probe is None:
        return None

    def local(p):
        plan = make_sample_plan(p, cells_shape, cfg)
        return jax.tree_util.tree_map(lambda a: a[None], plan)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis, None),
                       out_specs=P(axis))
    return fn(points)


def sharded_loss_fused_slots(params, pts, pinn_cfg, mesh: Mesh, plans=None,
                             axis=POINTS_AXIS):
    """The flagship training loss — slot-resident fused residual, optional
    per-shard precomputed plans — under shard_map.

    Each shard runs the full fused Pallas stack on its slice of the
    collocation points, computes the occ-masked residual sum in slot
    space, and one ``psum`` combines the loss; differentiating this (the
    params are replicated) makes shard_map's transpose psum the cell/MLP
    gradients.  ``plans`` comes from make_sharded_plans over the SAME
    points and mesh axis (None re-bins per call).
    """
    from ..models.pinn import loss_fused_slots

    axis = _resolve_axis(mesh, axis)
    q_total = pts.shape[0]

    def local(prm, p, pl):
        if pl is not None:
            pl = jax.tree_util.tree_map(lambda a: a[0], pl)
        part = loss_fused_slots(prm, p, pinn_cfg, plan=pl) * p.shape[0]
        return jax.lax.psum(part, axis) / q_total

    # check_vma=False: see the sharded_sample note — the vma checker fails
    # in the TRANSPOSE on the replicated-param cotangents (probed round 3);
    # gradients are pinned numerically in tests/test_sharding.
    if plans is None:
        fn = jax.shard_map(lambda prm, p: local(prm, p, None), mesh=mesh,
                           in_specs=(P(), P(axis, None)), out_specs=P(),
                           check_vma=False)
        return fn(params, pts)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(axis, None), P(axis)),
                       out_specs=P(), check_vma=False)
    return fn(params, pts, plans)


def make_sharded_slots_step(pinn_cfg, optimizer, mesh: Mesh,
                            axis=POINTS_AXIS):
    """jit-ready (params, opt_state, pts, plans) -> (params, opt_state,
    loss) with the slot-resident planned loss sharded over the mesh.

    The sharded analog of ``pinn.make_train_step(..., planned=True)``:
    points AND their per-shard plans (make_sharded_plans) ride the mesh's
    points axis; params/optimizer state are replicated and their gradients
    psum-reduced by shard_map's transpose.
    """
    axis = _resolve_axis(mesh, axis)

    def step(params, opt_state, pts, plans):
        lval, grads = jax.value_and_grad(
            lambda p: sharded_loss_fused_slots(p, pts, pinn_cfg, mesh,
                                               plans, axis))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, lval

    return jax.jit(step)


def sharded_loss_fused_slots_vol(params, pts, pinn_cfg, mesh: Mesh,
                                 plans=None, axis=POINTS_AXIS):
    """The vol-resident flagship loss (cells in the v4 KERNEL layout)
    under shard_map: the 128^3-class configuration a pod sweep would
    actually run (BASELINE config 5), VERDICT r3 #5.

    The kernel-layout volume is replicated (it is the model state);
    points and their per-shard plans ride the mesh's points axis.  The
    volume layout is chosen per LOCAL query count — convert params with
    ``pinn.params_to_vol(params, cfg, pts.shape[0] // n_shards)`` so the
    resident layout and the in-loss lookup agree (the autotune signature
    buckets on the query count the kernels see, which under shard_map is
    the shard's).
    """
    from ..models.pinn import loss_fused_slots_vol

    axis = _resolve_axis(mesh, axis)
    q_total = pts.shape[0]

    def local(prm, p, pl):
        if pl is not None:
            pl = jax.tree_util.tree_map(lambda a: a[0], pl)
        part = loss_fused_slots_vol(prm, p, pinn_cfg, plan=pl) * p.shape[0]
        return jax.lax.psum(part, axis) / q_total

    # check_vma=False: see the sharded_sample note (vma inference fails in
    # the transpose on replicated-param cotangents; values pinned in
    # tests/test_sharding.py).
    if plans is None:
        fn = jax.shard_map(lambda prm, p: local(prm, p, None), mesh=mesh,
                           in_specs=(P(), P(axis, None)), out_specs=P(),
                           check_vma=False)
        return fn(params, pts)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(axis, None), P(axis)),
                       out_specs=P(), check_vma=False)
    return fn(params, pts, plans)


def make_sharded_vol_step(pinn_cfg, optimizer, mesh: Mesh, axis=POINTS_AXIS):
    """jit-ready (params, opt_state, pts, plans) -> (params, opt_state,
    loss): the sharded analog of ``pinn.make_train_step(...,
    vol_resident=True)``.

    params carry the KERNEL-layout cells (``pinn.params_to_vol`` with the
    per-shard query count — see sharded_loss_fused_slots_vol) and stay
    replicated; the optimizer runs on the padded volume (its update must
    vanish at zero grad + zero param, as adam/sgd/adamw do, so pad slots
    stay zero); plans come from ``make_sharded_plans`` over the same
    points and mesh axis.
    """
    axis = _resolve_axis(mesh, axis)

    def step(params, opt_state, pts, plans):
        lval, grads = jax.value_and_grad(
            lambda p: sharded_loss_fused_slots_vol(p, pts, pinn_cfg, mesh,
                                                   plans, axis))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, lval

    return jax.jit(step)


def make_sharded_mega_step(pinn_cfg, optimizer, mesh: Mesh,
                           axis=POINTS_AXIS):
    """jit-ready (params, opt_state, pts, plans) -> (params, opt_state,
    loss): the sharded analog of ``pinn.make_train_step(...,
    megakernel=True)``.

    Each shard runs the ONE-PASS megakernel gradient
    (pinn.value_and_grad_mega) on its slice of the points; since the
    megakernel returns (loss, grads) directly rather than a
    differentiable loss, the cross-shard reduction is an explicit
    weighted ``psum`` of both (w = q_local / q_total turns per-shard
    means into the global mean — exact, the local losses are already
    /q_local sums).  Params/optimizer state stay replicated.  ``plans``
    from make_sharded_plans over the same points and axis, or None to
    re-bin per call.
    """
    axis = _resolve_axis(mesh, axis)

    def step(params, opt_state, pts, plans):
        from ..models.pinn import value_and_grad_mega

        q_total = pts.shape[0]

        def local(prm, p, pl):
            if pl is not None:
                pl = jax.tree_util.tree_map(lambda a: a[0], pl)
            lval, grads = value_and_grad_mega(prm, p, pinn_cfg, plan=pl)
            w = p.shape[0] / q_total
            lval = jax.lax.psum(lval * w, axis)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g * w, axis), grads)
            return lval, grads

        # check_vma=False: see the sharded_sample note (the megakernel's
        # Pallas calls sit behind the same custom-call opacity)
        if plans is None:
            fn = jax.shard_map(lambda prm, p: local(prm, p, None),
                               mesh=mesh, in_specs=(P(), P(axis, None)),
                               out_specs=(P(), P()), check_vma=False)
            lval, grads = fn(params, pts)
        else:
            fn = jax.shard_map(local, mesh=mesh,
                               in_specs=(P(), P(axis, None), P(axis)),
                               out_specs=(P(), P()), check_vma=False)
            lval, grads = fn(params, pts, plans)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, lval

    return jax.jit(step)


def shard_pinn_step(step_fn, mesh: Mesh, axis=POINTS_AXIS):
    """jit a (params, opt_state, pts) -> (params, opt_state, loss) step with
    params/opt_state replicated and pts sharded over the mesh.

    XLA turns the sharding annotations into the psum-on-cell-grads data
    parallelism; nothing manual needed.  On a hybrid (dcn, ici) mesh the
    replicated-param gradient reduction becomes a hierarchical all-reduce
    (ICI within the slice, DCN across) placed by the compiler; pass
    ``axis=None`` to shard points over every mesh axis.
    """
    axis = _resolve_axis(mesh, axis)
    repl = NamedSharding(mesh, P())
    pts_sh = NamedSharding(mesh, P(axis, None))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, pts_sh),
        out_shardings=(repl, repl, repl),
    )
