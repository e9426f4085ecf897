"""A/B: planned vs per-step-binned train step at the 128^3 / 1M sweep.

The plan (ops.fused.make_sample_plan) hoists the 1M-key bin sort + slot
scatters out of the step; the reference workloads fix their collocation
points, so this is the honest train-step number for them.
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
    rng = np.random.RandomState(7)
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

    def scan_of(stepfn, *extra):
        @jax.jit
        def many(params, opt_state, p, *ex):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = stepfn(pp, ss, p, *ex)
                return (pp, ss), lval
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=REPS)
            return losses
        return many

    many = scan_of(step)
    many_pl = scan_of(step_pl)

    def timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    # warm compiles
    jax.block_until_ready(many(params, opt_state, pts))
    plan = plan_of(pts)
    jax.block_until_ready(plan)
    jax.block_until_ready(many_pl(params, opt_state, pts, plan))

    sec = min(timed(many, params, opt_state, pts * (0.999 - 1e-4 * i))
              for i in range(3)) / REPS
    print(f"unplanned train step : {sec * 1e3:7.1f} ms "
          f"({1e-6 / sec * 1e6:.1f} Mpts/s)", flush=True)

    def one_trial(i):
        p = pts * (0.999 - 1e-4 * i)
        pl = plan_of(p)
        jax.block_until_ready(pl)
        return timed(many_pl, params, opt_state, p, pl)

    sec = min(one_trial(i) for i in range(3)) / REPS
    print(f"planned train step   : {sec * 1e3:7.1f} ms "
          f"({1e-6 / sec * 1e6:.1f} Mpts/s)", flush=True)

    t0 = time.perf_counter()
    pl = plan_of(pts * 0.998)
    jax.block_until_ready(pl)
    print(f"plan build (once)    : {(time.perf_counter() - t0) * 1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
