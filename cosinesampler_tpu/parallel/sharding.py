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
