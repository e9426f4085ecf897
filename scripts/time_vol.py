"""A/B: planned vs vol-resident train step at the 128^3 / 1M sweep.

The vol-resident step keeps the cells in the v4 kernel layout across steps
(ops.fused.make_fused_vol), deleting the per-step volume pad+transpose and
gradient crop+transpose of the planned step.  Run standalone on the TPU
tunnel (never concurrently with anything else).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.fused import make_sample_plan

compile_cache.enable()
REPS = 10


def _timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(7)
    cells = jnp.asarray(rng.rand(16, 4, 128, 128, 128), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    pcfg = pinn.PINNConfig(dim=3, n_cells=16, cell_dim=4, cell_size=128,
                           pde="helmholtz", backend="auto")
    params = {"cells": cells, **{k: v for k, v in pinn.init_params(
        jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
    optimizer = optax.adam(1e-3)
    plan_of = lambda p: make_sample_plan(p, (16, 4, 128, 128, 128),
                                         pcfg.sampler)

    def scan_of(step, p0, s0):
        @jax.jit
        def many(params, opt_state, p, plan):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = step(pp, ss, p, plan)
                return (pp, ss), lval
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=REPS)
            return losses
        return many

    for name, vol in (("planned", False), ("vol-resident", True)):
        step = jax.jit(pinn.make_train_step(
            pcfg, optimizer, planned=not vol, vol_resident=vol))
        if vol:
            p0 = pinn.params_to_vol(params, pcfg, pts.shape[0])
        else:
            p0 = params
        s0 = optimizer.init(p0)
        many = scan_of(step, p0, s0)
        t0 = time.perf_counter()
        losses = many(p0, s0, pts, plan_of(pts))
        jax.block_until_ready(losses)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
              f"(loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f})",
              flush=True)

        def trial(i):
            p = pts * (0.999 - 1e-4 * i)
            plan = plan_of(p)
            jax.block_until_ready(plan)
            return _timed(many, p0, s0, p, plan)

        sec = min(trial(i) for i in range(3)) / REPS
        print(f"{name}: {sec * 1e3:.1f} ms/step = {1.0 / sec:.1f} Mpts/s",
              flush=True)


if __name__ == "__main__":
    main()
