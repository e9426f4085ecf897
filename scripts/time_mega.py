"""A/B the v6 residual megakernel step vs the planned two-kernel step.

The flagship 2D workload (96x4x16^2 cells, 100k points, Allen-Cahn) in
exact and bf16 precision; each variant timed as best-of-3 of one jitted
50-rep lax.scan on fresh perturbed points (bench.py methodology).

Run on the TPU (single-client tunnel — nothing else may touch it):
    python scripts/time_mega.py [--reps 50] [--points 100000]
"""

import argparse
import dataclasses
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


def log(msg):
    print(f"[time_mega] {msg}", file=sys.stderr, flush=True)


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def bench_step(step, params, opt_state, pts, plan_of, reps, name):
    @jax.jit
    def many(params, opt_state, p, plan):
        def body(carry, _):
            pp, ss = carry
            pp, ss, lval = step(pp, ss, p, plan)
            return (pp, ss), lval
        (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=reps)
        return losses

    t0 = time.perf_counter()
    losses = many(params, opt_state, pts, plan_of(pts))
    jax.block_until_ready(losses)
    log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
        f"(loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f})")

    def one(i):
        p = pts * (0.999 - 1e-4 * i)
        plan = plan_of(p)
        jax.block_until_ready(plan)
        return timed(many, params, opt_state, p, plan)

    sec = min(one(i) for i in range(3)) / reps
    log(f"{name}: {sec * 1e3:.3f} ms/step ({1.0 / sec:.1f} it/s)")
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--precisions", default="exact,bf16")
    ap.add_argument("--qb", type=int, default=None,
                    help="override the tuned v2w q_block for BOTH variants "
                         "via a temp overlay cache (single-session A/B)")
    args = ap.parse_args()

    if args.qb:
        import os
        import tempfile

        from cosinesampler_tpu.ops.config import SamplerConfig
        from cosinesampler_tpu.utils import autotune

        overlay = tempfile.mktemp(suffix=".json")
        os.environ["COSINESAMPLER_TUNE_CACHE"] = overlay
        for prec in args.precisions.split(","):
            autotune.record(
                "v2w", (96, 4, 16, 16),
                SamplerConfig(dim=2, precision=prec, backend="pallas"),
                args.points, {"q_block": args.qb}, path=None)
        log(f"q_block override {args.qb} via {overlay}")

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (args.points, 2)), jnp.float32)
    optimizer = optax.adam(1e-3)
    base = pinn.PINNConfig(dim=2, n_cells=96, cell_dim=4, cell_size=16,
                           pde="allen_cahn", backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(0), base)
    results = {}
    for prec in args.precisions.split(","):
        cfg = dataclasses.replace(base, precision=prec)
        opt_state = optimizer.init(params)
        plan_of = lambda p, c=cfg: make_sample_plan(
            p, params["cells"].shape, c.sampler)
        assert pinn.mega_available(cfg, args.points), "mega must route"
        for name, step in (
            ("planned", pinn.make_train_step(cfg, optimizer, planned=True)),
            ("mega", pinn.make_train_step(cfg, optimizer, megakernel=True)),
        ):
            key = f"{prec}/{name}"
            results[key] = bench_step(jax.jit(step), params, opt_state, pts,
                                      plan_of, args.reps, key)
    log("summary: " + ", ".join(
        f"{k}={v * 1e3:.2f}ms" for k, v in results.items()))
    for prec in args.precisions.split(","):
        a, b = results.get(f"{prec}/planned"), results.get(f"{prec}/mega")
        if a and b:
            log(f"{prec}: mega is {a / b:.3f}x the planned step "
                f"({(a - b) * 1e3:+.2f} ms)")


if __name__ == "__main__":
    main()
