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


def make_mesh(n_devices: Optional[int] = None, axis: str = POINTS_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sharded_sample(input, grid, cfg: SamplerConfig, mesh: Mesh,
                   axis: str = POINTS_AXIS):
    """Sample with queries sharded over the mesh and cells replicated.

    grid is sharded along its second-to-last spatial axis (the flattened
    query axis in the (N, 1[, 1], Q, d) convention).  Differentiable: the
    cell-gradient psum falls out of shard_map's transpose.
    """
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
                           axis: str = POINTS_AXIS):
    """The fused PINN op (value/jac/diag-Hessian) with points sharded.

    Each shard runs the full fused kernel stack (Pallas on TPU) on its
    slice of the query cloud; the cells stay replicated and their
    cotangent is psum-reduced by shard_map's transpose.  This is the
    flagship op under shard_map — the v1 `sharded_sample` path wraps the
    per-order blend family instead.
    """
    def local(c, p):
        return sample_features_with_derivs(c, p, cfg)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    return fn(cells, points)


def shard_pinn_step(step_fn, mesh: Mesh, axis: str = POINTS_AXIS):
    """jit a (params, opt_state, pts) -> (params, opt_state, loss) step with
    params/opt_state replicated and pts sharded over the mesh.

    XLA turns the sharding annotations into the psum-on-cell-grads data
    parallelism; nothing manual needed.
    """
    repl = NamedSharding(mesh, P())
    pts_sh = NamedSharding(mesh, P(axis, None))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, pts_sh),
        out_shardings=(repl, repl, repl),
    )
