"""Sweep sub-blocks-per-grid-step (sb) for the v4 kernels at 128^3/1M.

The v4 passes are floored by ~13k grid blocks x ~1.3 us fixed cost
(BENCHMARKS.md round-4 attribution); sb groups consecutive query blocks
per grid step (bit-identical outputs, CPU-pinned).  One session, isolated
fwd (blend_vol) and bwd (bwd_vol serialized) per sb, then the full
vol-resident step at the best sb.

    python scripts/time_sb.py [--prec bf16] [--sbs 1,4,8] [--reps 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from cosinesampler_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.fused import make_sample_plan
from cosinesampler_tpu.ops.pallas import _tuned, fused3b


def log(m):
    print(f"[sb] {m}", file=sys.stderr, flush=True)


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
            bump = (1e-30 * lead.ravel()[0]).astype(carry.dtype)
            return carry + bump, lead.ravel()[0].astype(jnp.float32)
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
    ap.add_argument("--sbs", default="1,4,8")
    args = ap.parse_args()

    rng = np.random.RandomState(7)
    shape = (16, 4, 128, 128, 128)
    pcfg = pinn.PINNConfig(dim=3, n_cells=16, cell_dim=4, cell_size=128,
                           pde="helmholtz", backend="auto",
                           precision=args.prec)
    scfg = pcfg.sampler
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    kw = _tuned(fused3b, scfg, shape, pts.shape[0])
    kw.pop("sb", None)
    log(f"tuned kwargs: {kw}")
    plan = make_sample_plan(pts, shape, scfg)
    qp = plan[1].shape[0]
    gp = jnp.asarray(rng.randn(7, 4, qp), jnp.float32)
    cells = jnp.asarray(rng.rand(*shape), jnp.float32)
    from cosinesampler_tpu.ops.pallas.fused3b import cells_to_vol
    vol = cells_to_vol(cells.astype(jnp.bfloat16 if args.prec == "bf16"
                                    else jnp.float32), scfg,
                       gy=kw.get("gy", 2), rb=kw.get("rb"))

    results = {}
    for sb in (int(x) for x in args.sbs.split(",")):
        sf = scan_min(
            lambda v, _sb=sb: fused3b.pallas_fused3b_blend_vol(
                v, pts, scfg, 16, 4, (128, 128, 128), plan=plan, sb=_sb,
                **kw)[0][0, 0, 0],
            vol, args.reps)
        sg = scan_min(
            lambda g, _sb=sb: fused3b.pallas_fused3b_bwd_vol(
                g, pts, (128, 128, 128), scfg, 16, plan=plan, ghost=False,
                sb=_sb, **kw)[0, 0, 0, 0],
            gp, args.reps)
        results[sb] = (sf, sg)
        log(f"sb={sb} [{args.prec}]: fwd {sf * 1e3:.1f} ms, "
            f"bwd {sg * 1e3:.1f} ms, sum {(sf + sg) * 1e3:.1f} ms")

    best = min(results, key=lambda k: sum(results[k]))
    log(f"best sb by fwd+bwd: {best}")

    # full vol-resident step at sb=1 vs best (tune-cache override; the
    # standalone optimum can disagree with the in-step one, CLAUDE.md)
    import os
    import tempfile

    from cosinesampler_tpu.utils import autotune

    overlay = tempfile.mktemp(suffix=".json")
    os.environ["COSINESAMPLER_TUNE_CACHE"] = overlay
    params = {"cells": cells, **{k: v for k, v in pinn.init_params(
        jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
    optimizer = optax.adam(1e-3)

    from cosinesampler_tpu.ops import fused as fmod

    for sbv in sorted({1, best}):
        autotune.record("v3b", shape, scfg, pts.shape[0],
                        {**kw, "sb": sbv})
        # the vol-bundle cache closes over the tuned kwargs; rebuild it
        fmod._FUSED_VOL_CACHE.clear()
        step = jax.jit(pinn.make_train_step(pcfg, optimizer,
                                            vol_resident=True))
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
        log(f"128^3 vol step [{args.prec}] sb={sbv}: {sec * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
