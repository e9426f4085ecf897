"""A/B: planned vs unplanned at the 128^3 / 1M sweep, one jitted step per
dispatch (Python loop) — the realistic trainer shape.

The lax.scan A/B (time_plan.py) understates the plan's value: the binning
depends only on the loop-invariant points, so XLA hoists it out of the
scan body and the "unplanned" scan pays it once per scan, not per step.
A step-at-a-time loop (logging/callbacks between steps) re-pays it every
dispatch; this script measures that.

CAVEAT: on the tunnel device this measurement is unreliable — runs have
returned 0.1 ms/step (physically impossible for a ~90 ms step) even with
time-salted inputs, i.e. the tunnel replay (CLAUDE.md) defeats the
timing.  Treat the scan A/B (time_plan.py) plus the standalone binning
cost (scripts/time_bin_parts.py, ~12 ms post-optimization) as the honest
numbers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.fused import make_sample_plan

compile_cache.enable()

REPS = 10


def main():
    import optax
    # fresh (time-salted) inputs every run: the tunnel replays previously
    # seen (executable, inputs) pairs with instant timings (CLAUDE.md)
    rng = np.random.RandomState(int(time.time()) % (2**31))
    cells = jnp.asarray(rng.rand(16, 4, 128, 128, 128), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    pcfg = pinn.PINNConfig(dim=3, n_cells=16, cell_dim=4, cell_size=128,
                           pde="helmholtz", backend="auto")
    params = {"cells": cells, **{k: v for k, v in pinn.init_params(
        jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    step = jax.jit(pinn.make_train_step(pcfg, optimizer, slot_resident=True))
    step_pl = jax.jit(pinn.make_train_step(pcfg, optimizer, planned=True))
    plan_of = jax.jit(lambda p: make_sample_plan(
        p, (16, 4, 128, 128, 128), pcfg.sampler))

    def loop(stepfn, p, *extra):
        pp, ss = params, opt_state
        t0 = time.perf_counter()
        for _ in range(REPS):
            pp, ss, lval = stepfn(pp, ss, p, *extra)
        jax.block_until_ready(lval)
        return (time.perf_counter() - t0) / REPS

    # warm compiles
    jax.block_until_ready(step(params, opt_state, pts)[2])
    plan = plan_of(pts)
    jax.block_until_ready(plan)
    jax.block_until_ready(step_pl(params, opt_state, pts, plan)[2])

    sec = min(loop(step, pts * (0.999 - 1e-4 * i)) for i in range(3))
    print(f"unplanned step/dispatch: {sec * 1e3:7.1f} ms "
          f"({1e-6 / sec * 1e6:.1f} Mpts/s)", flush=True)

    def one_trial(i):
        p = pts * (0.999 - 1e-4 * i)
        pl = plan_of(p)
        jax.block_until_ready(pl)
        return loop(step_pl, p, pl)

    sec = min(one_trial(i) for i in range(3))
    print(f"planned step/dispatch  : {sec * 1e3:7.1f} ms "
          f"({1e-6 / sec * 1e6:.1f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
