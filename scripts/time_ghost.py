"""A/B the ghost-accumulator v4 backward vs the serialized-RMW one (128^3).

Times the isolated bwd_vol kernel both ways in ONE session (the tunnel
drifts across sessions), then the full vol-resident bf16 train step with
the new default.  Methodology: best-of-3 of a jitted 10-rep lax.scan on
perturbed cotangents (bench.py rules).

    python scripts/time_ghost.py [--prec bf16] [--reps 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from cosinesampler_tpu.utils import compile_cache

compile_cache.enable()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.fused import make_sample_plan
from cosinesampler_tpu.ops.pallas import _tuned, fused3b


def log(m):
    print(f"[ghost] {m}", file=sys.stderr, flush=True)


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def scan_min(fn, x, reps):
    @jax.jit
    def many(v):
        def body(carry, _):
            out = fn(carry)
            lead = jax.tree_util.tree_leaves(out)[0]
            return carry + 1e-30 * lead.ravel()[0], lead.ravel()[0]
        carry, vals = jax.lax.scan(body, v, None, length=reps)
        return vals.sum() + carry.sum()

    t0 = time.perf_counter()
    jax.block_until_ready(many(x))
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    return min(timed(many, x * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--prec", default="bf16")
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(7)
    shape = (16, 4, 128, 128, 128)
    pcfg = pinn.PINNConfig(dim=3, n_cells=16, cell_dim=4, cell_size=128,
                           pde="helmholtz", backend="auto",
                           precision=args.prec)
    scfg = pcfg.sampler
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    kw = _tuned(fused3b, scfg, shape, pts.shape[0])
    log(f"tuned kwargs: {kw}")
    plan = make_sample_plan(pts, shape, scfg)
    qp = plan[1].shape[0]
    gp = jnp.asarray(rng.randn(7, 4, qp), jnp.float32)

    def bwd_vol(g, ghost):
        return fused3b.pallas_fused3b_bwd_vol(
            g, pts, (128, 128, 128), scfg, 16, plan=plan, ghost=ghost,
            **kw)[0, 0, 0, 0]

    # stage attribution: kernel-only (fold stubbed to a cheap dependency)
    orig_fold = fused3b._fold_bricks

    def stub(bricks, visited, nbz, nysb, rows_s, nsh, cn, wp, gy, rb, fp,
             hp, dz):
        return jnp.zeros((hp, dz, cn, wp),
                         bricks.dtype) + bricks[0, 0, 0, 0, 0]

    fused3b._fold_bricks = stub
    try:
        sec = scan_min(lambda g: bwd_vol(g, True), gp, args.reps)
        log(f"bwd_vol[{args.prec}] ghost KERNEL-ONLY (fold stubbed): "
            f"{sec * 1e3:.1f} ms")
    finally:
        fused3b._fold_bricks = orig_fold
    jax.clear_caches()   # the stubbed trace is cached under the same key

    for ghost in (True, False):
        sec = scan_min(lambda g, _gh=ghost: bwd_vol(g, _gh), gp, args.reps)
        log(f"bwd_vol[{args.prec}] ghost={ghost}: {sec * 1e3:.1f} ms")

    if args.skip_step:
        return
    # full vol-resident step with the new default (ghost auto-on)
    cells = jnp.asarray(rng.rand(*shape), jnp.float32)
    params = {"cells": cells, **{k: v for k, v in pinn.init_params(
        jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
    optimizer = optax.adam(1e-3)
    step = jax.jit(pinn.make_train_step(pcfg, optimizer, vol_resident=True))
    params_v = pinn.params_to_vol(params, pcfg, pts.shape[0])
    opt_state = optimizer.init(params_v)

    @jax.jit
    def many(pv, ss, p, pl):
        def body(carry, _):
            a, b = carry
            a, b, lval = step(a, b, p, pl)
            return (a, b), lval
        (_, _), losses = jax.lax.scan(body, (pv, ss), None,
                                      length=args.reps)
        return losses

    def one(i):
        p = pts * (0.999 - 1e-4 * i)
        pl = make_sample_plan(p, shape, scfg)
        jax.block_until_ready(pl)
        return timed(many, params_v, opt_state, p, pl)

    t0 = time.perf_counter()
    jax.block_until_ready(many(params_v, opt_state, pts, plan))
    log(f"  step compile+first {time.perf_counter() - t0:.1f}s")
    sec = min(one(i) for i in range(3)) / args.reps
    log(f"128^3 vol step [{args.prec}] (ghost default): {sec * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
