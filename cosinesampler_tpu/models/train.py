"""PINN training driver: fused sampler + native point stream + checkpoints.

The production counterpart of the reference's ad-hoc test loops
(test/test_2d.py:221-244): per-step fresh collocation batches from the
native generator (utils/pointgen.py), the fused value/derivative train step
(models/pinn.py), structured per-step metrics, and orbax checkpoint/resume.
The library itself stays print-free; all observability lives here.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.pointgen import PointGenerator
from . import pinn


@dataclasses.dataclass
class TrainConfig:
    model: pinn.PINNConfig = dataclasses.field(default_factory=pinn.PINNConfig)
    batch_points: int = 100_000
    steps: int = 1000
    lr: float = 1e-3
    seed: int = 0
    fused: bool = True
    # fixed_points=True reproduces the reference's own training pattern
    # (one collocation set for the whole run, test_2d.py:23-26 /
    # test_3d.py:16-19): the batch is drawn once and the sampler's bin
    # plan (ops.fused.make_sample_plan) is built once, so the
    # step-per-dispatch loop below stops re-paying the per-step binning.
    fixed_points: bool = False
    # vol_resident=True (requires fused + fixed_points and a shape that
    # routes to the HBM-resident v4 generation) trains with the cells in
    # the sampler's KERNEL layout: the per-step volume relayouts disappear
    # and bf16 cells halve the brick DMA bytes (BENCHMARKS.md large-sweep
    # section: 75.0 -> 74.4 ms f32, 56.7 ms with precision="bf16").
    # Checkpoints are converted to/from the portable API layout.
    vol_resident: bool = False
    # megakernel=True (2D) computes the whole per-step gradient in ONE
    # Pallas pass (pinn.value_and_grad_mega; ops/pallas/mega2w.py) — the
    # fastest 2D configuration (BENCHMARKS.md megakernel section), and
    # the MORE accurate one (its in-kernel MLP is f32-exact, where the
    # two-kernel path's XLA MLP rides TPU default-precision matmuls).
    # Falls back to the two-kernel step when the shape doesn't route.
    # Composes with fixed_points (plan hoisting) and shard.
    megakernel: bool = False
    # shard=True data-parallelizes the step over every local device
    # (parallel/sharding.py): points (and their per-shard bin plans) ride
    # the mesh's points axis, params/optimizer state stay replicated, and
    # the cell/MLP gradients are psum-reduced.  Composes with fused /
    # fixed_points / vol_resident; batch_points must divide the device
    # count.  On one device it is the identity configuration.
    shard: bool = False
    # autotune=True measures kernel block sizes for THIS workload signature
    # on the live device before the loop (one-time; persists to the user
    # overlay cache, utils/autotune.py) — the portability path for TPU
    # generations the shipped table (measured on v5e) does not cover.
    # No-op off-TPU, for already-tuned signatures, and for configs that
    # route to unbinned kernels.
    autotune: bool = False
    autotune_reps: int = 30
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 500
    log_every: int = 50


def _convert_layout(tree, match_shape, convert):
    """Apply ``convert`` to every leaf shaped like the cell grid.

    The optimizer state mirrors the params pytree (Adam moments have the
    cells' exact shape), and the layout change is a pure permutation+pad,
    so converting moments alongside params keeps training bit-equivalent
    (elementwise optimizers commute with layout; pad slots carry zero
    moments and zero gradients)."""
    match_shape = tuple(match_shape)

    def f(leaf):
        if hasattr(leaf, "shape") and tuple(leaf.shape) == match_shape:
            return convert(leaf)
        return leaf

    return jax.tree_util.tree_map(f, tree)


def train(cfg: TrainConfig,
          on_metrics: Optional[Callable[[Dict], None]] = None):
    """Run the PINN loop; returns (params, list-of-metric-dicts)."""
    mcfg = cfg.model
    optimizer = optax.adam(cfg.lr)
    params = pinn.init_params(jax.random.PRNGKey(cfg.seed), mcfg)
    opt_state = optimizer.init(params)
    start_step = 0

    if cfg.checkpoint_dir:
        from ..utils import checkpoint as ckpt
        try:
            start_step, state = ckpt.restore_state(
                cfg.checkpoint_dir, {"params": params, "opt": opt_state})
            params, opt_state = state["params"], state["opt"]
        except FileNotFoundError:
            pass

    mesh = None
    if cfg.shard:
        from ..parallel import sharding as shd
        mesh = shd.make_mesh()
        n_dev = int(mesh.devices.size)
        if cfg.batch_points % n_dev:
            raise ValueError(
                f"shard=True needs batch_points ({cfg.batch_points}) "
                f"divisible by the device count ({n_dev})")

    gen = PointGenerator(cfg.batch_points, mcfg.dim, seed=cfg.seed)

    if cfg.autotune:
        # before any plan is built: plans embed the tuned block size, so
        # the new entry must be in the cache first (tune_workload resets
        # the in-process snapshot after persisting)
        from ..utils.autotune import tune_workload
        n_local = cfg.batch_points // (int(mesh.devices.size) if mesh else 1)
        tune_pts = jnp.asarray(gen.batch(0))[:n_local]
        tune_workload(params["cells"], tune_pts, mcfg.sampler,
                      reps=cfg.autotune_reps)

    fixed_pts = plan = None
    if cfg.fixed_points:
        fixed_pts = jnp.asarray(gen.batch(0))
        if cfg.fused:
            cells_shape = (mcfg.n_cells, mcfg.cell_dim,
                           *(mcfg.cell_size,) * mcfg.dim)
            if mesh is not None:
                # one plan per shard, built under the same split the
                # sharded loss will see (parallel/sharding.py)
                from ..parallel.sharding import make_sharded_plans
                plan = make_sharded_plans(fixed_pts, cells_shape,
                                          mcfg.sampler, mesh)
            else:
                from ..ops.fused import make_sample_plan
                plan = make_sample_plan(fixed_pts, cells_shape, mcfg.sampler)

    # the kernels see the PER-SHARD query count under shard_map, so every
    # layout/plan decision keyed on it must use the local count
    local_points = cfg.batch_points // (int(mesh.devices.size) if mesh
                                        else 1)
    to_vol = from_vol = None
    cells_shape = vol_shape = None
    if cfg.vol_resident:
        if plan is None:
            raise ValueError(
                "vol_resident=True requires fused=True and "
                "fixed_points=True (the kernel layout is only profitable "
                "with a precomputed plan on the v4 route)")
        to_vol, from_vol = pinn.vol_converters(mcfg, local_points)
        cells_shape = (mcfg.n_cells, mcfg.cell_dim,
                       *(mcfg.cell_size,) * mcfg.dim)
        vol_shape = jax.eval_shape(
            to_vol, jax.ShapeDtypeStruct(cells_shape,
                                         params["cells"].dtype)).shape
        # one-time: params AND optimizer moments into the kernel layout
        params = _convert_layout(params, cells_shape, to_vol)
        opt_state = _convert_layout(opt_state, cells_shape, to_vol)
        if mesh is not None:
            from ..parallel.sharding import make_sharded_vol_step
            step_fn = make_sharded_vol_step(mcfg, optimizer, mesh)
        else:
            step_fn = jax.jit(pinn.make_train_step(mcfg, optimizer,
                                                   vol_resident=True))
    elif cfg.megakernel:
        if mesh is not None:
            from ..parallel.sharding import make_sharded_mega_step
            step_fn = make_sharded_mega_step(mcfg, optimizer, mesh)
        else:
            step_fn = jax.jit(pinn.make_train_step(mcfg, optimizer,
                                                   megakernel=True))
        if plan is None:
            # the mega step takes a plan argument; None re-bins per call
            # (hoisted by XLA under a scan, repaid per dispatch)
            _mega_step4 = step_fn
            step_fn = lambda p, s, pts: _mega_step4(p, s, pts, None)
    elif plan is not None:
        if mesh is not None:
            from ..parallel.sharding import make_sharded_slots_step
            step_fn = make_sharded_slots_step(mcfg, optimizer, mesh)
        else:
            step_fn = jax.jit(pinn.make_train_step(mcfg, optimizer,
                                                   planned=True))
    else:
        step_fn = pinn.make_train_step(mcfg, optimizer, fused=cfg.fused)
        if mesh is not None:
            from ..parallel.sharding import shard_pinn_step
            step_fn = shard_pinn_step(step_fn, mesh)
        else:
            step_fn = jax.jit(step_fn)

    metrics: List[Dict] = []
    t_last = time.perf_counter()
    for step in range(start_step, cfg.steps):
        pts = fixed_pts if cfg.fixed_points else jnp.asarray(gen.batch(step))
        if plan is not None:
            params, opt_state, lval = step_fn(params, opt_state, pts, plan)
        else:
            params, opt_state, lval = step_fn(params, opt_state, pts)
        if (step + 1) % cfg.log_every == 0 or step + 1 == cfg.steps:
            lval = float(jax.block_until_ready(lval))
            now = time.perf_counter()
            window = min(cfg.log_every, step + 1 - start_step)
            rec = {
                "step": step + 1,
                "loss": lval,
                "steps_per_sec": window / (now - t_last),
                "points_per_sec": window * cfg.batch_points / (now - t_last),
            }
            metrics.append(rec)
            if on_metrics:
                on_metrics(rec)
            t_last = now
        if cfg.checkpoint_dir and (step + 1) % cfg.checkpoint_every == 0:
            from ..utils import checkpoint as ckpt
            save_p, save_s = params, opt_state
            if cfg.vol_resident:
                # checkpoints stay in the portable API layout
                save_p = _convert_layout(params, vol_shape, from_vol)
                save_s = _convert_layout(opt_state, vol_shape, from_vol)
            ckpt.save_state(cfg.checkpoint_dir, step + 1,
                            {"params": save_p, "opt": save_s})
    gen.close()
    if cfg.vol_resident:
        params = _convert_layout(params, vol_shape, from_vol)
    return params, metrics


def main(argv=None):
    """CLI: python -m cosinesampler_tpu.models.train [--dim 2] [--steps N] ..."""
    import argparse
    import json
    import sys

    ap = argparse.ArgumentParser(description="PIXEL-style PINN trainer")
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3))
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-points", type=int, default=100_000)
    ap.add_argument("--n-cells", type=int, default=96)
    ap.add_argument("--cell-dim", type=int, default=4)
    ap.add_argument("--cell-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pde", default=None, help="allen_cahn | helmholtz")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--no-fused", action="store_true",
                    help="use nested-autodiff instead of the fused kernels")
    ap.add_argument("--fixed-points", action="store_true",
                    help="one collocation set for the whole run (the "
                         "reference's pattern); precomputes the bin plan")
    ap.add_argument("--precision", default="exact",
                    choices=("exact", "fast", "bf16", "highest"),
                    help="MXU strategy (BENCHMARKS.md precision table): "
                         "exact=f32-faithful, fast=~4e-6, bf16=~2e-3 + "
                         "half DMA (fastest for training)")
    ap.add_argument("--vol-resident", action="store_true",
                    help="train with cells in the sampler's kernel layout "
                         "(large 3D volumes on the v4 route; implies "
                         "--fixed-points)")
    ap.add_argument("--shard", action="store_true",
                    help="data-parallelize over all local devices: points "
                         "(and per-shard bin plans) sharded over the mesh, "
                         "params replicated, cell grads psum-reduced")
    ap.add_argument("--megakernel", action="store_true",
                    help="one-pass train-step gradient (2D): the fused "
                         "blend, MLP/residual vjp and cotangent splat in "
                         "a single Pallas kernel — fastest 2D path")
    ap.add_argument("--autotune", action="store_true",
                    help="measure kernel block sizes for this workload on "
                         "the live device before training (one-time; "
                         "persists to the user cache — the path for TPU "
                         "generations the shipped v5e table doesn't cover)")
    args = ap.parse_args(argv)

    pde = args.pde or ("allen_cahn" if args.dim == 2 else "helmholtz")
    cfg = TrainConfig(
        model=pinn.PINNConfig(dim=args.dim, n_cells=args.n_cells,
                              cell_dim=args.cell_dim,
                              cell_size=args.cell_size, pde=pde,
                              precision=args.precision),
        batch_points=args.batch_points, steps=args.steps, lr=args.lr,
        seed=args.seed, fused=not args.no_fused,
        fixed_points=args.fixed_points or args.vol_resident,
        vol_resident=args.vol_resident, shard=args.shard,
        megakernel=args.megakernel, autotune=args.autotune,
        checkpoint_dir=args.checkpoint_dir,
    )
    train(cfg, on_metrics=lambda m: print(json.dumps(m), flush=True))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
