"""Wide-2D sweep: 16 cells x 4ch x 1024x1024 grid, 1M query points.

The reference accepts any 2D grid size (the CUDA kernels index H, W from
the tensor, cosine_sampler_2d_kernel.cu:280-300); until round 2 session 6
grids past the VMEM-resident budget fell to the XLA gather path.  The
windowed v5 2D kernels (ops/pallas/fused2w.py) now take them with an
adaptively smaller q_block (K = rows*Wp = 4096 at W=1024, so the (K, Qb)
hit panel forces Qb <= 256).

Times the v5 slot-resident fwd + bwd and the full Allen-Cahn train step
at this scale, plus the XLA gather forward for comparison.  The XLA
scatter BACKWARD is gated behind --xla-bwd: its 3D sibling is a known
device-faulter (BENCHMARKS.md) and a fault wedges the single-client
tunnel — run it last, if at all.

Best-of-3 jitted scans on perturbed inputs (CLAUDE.md timing rules).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops import fused, generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused2w

N, C, S, Q = 16, 4, 1024, 1_000_000
REPS = 10


def log(msg):
    print(f"[wide2d] {msg}", file=sys.stderr, flush=True)


def scan_time(fn, pts, *rest, reps=REPS, name="", trials=3):
    @jax.jit
    def many(pts, rest):
        def body(p, _):
            out = fn(p, *rest)
            tick = jnp.asarray(out[0] if isinstance(out, tuple) else out
                               ).ravel()[0]
            return p + 1e-30 * tick, tick
        carry, ticks = jax.lax.scan(body, pts, None, length=reps)
        return ticks.sum() + carry.sum()

    t0 = time.perf_counter()
    r = many(pts, rest)
    jax.block_until_ready(r)
    log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")

    def one(i):
        t0 = time.perf_counter()
        rr = many(pts * (0.999 - 1e-4 * i), rest)
        jax.block_until_ready(rr)
        float(jnp.asarray(rr).ravel()[0])
        return time.perf_counter() - t0

    dt = min(one(i) for i in range(trials)) / reps
    log(f"{name}: {dt * 1e3:.1f} ms/pass ({Q / dt / 1e6:.1f} Mpts/s)")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--xla-bwd", action="store_true",
                        help="also probe the XLA scatter gradient (may "
                             "fault the tunnel; run last)")
    parser.add_argument("--train", action="store_true",
                        help="also time the full train step")
    args = parser.parse_args()

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                        backend="pallas")
    cells = jnp.asarray(rng.rand(N, C, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 2)), jnp.float32)
    qb = fused2w.pick_q_block(cfg, cells.shape)
    log(f"pick_q_block -> {qb}; supports: "
        f"{fused2w.supports(cfg, cells.shape, 6 << 20, Q)}")

    # v5 windowed fwd (slot API — what the train step runs)
    def fwd(p, c):
        out_p, occ, _ = fused2w.pallas_fused2w_blend_padded(c, p, cfg)
        return out_p
    dt_fwd = scan_time(fwd, pts, cells, name=f"v5 fwd qb={qb} (slot)")

    # v5 bwd
    plan = jax.jit(lambda p: fused2w.make_plan(p, (S, S), cfg, q_block=qb)
                   )(pts)
    qp = plan[1].shape[0]
    g = jnp.asarray(rng.rand(5, C, qp), jnp.float32)

    def bwd(p, gg, c):
        return fused2w.pallas_fused2w_bwd_padded(gg, p, (S, S), cfg, N,
                                                 q_block=qb)
    dt_bwd = scan_time(bwd, pts, g, cells, name=f"v5 bwd qb={qb} (slot)")

    # XLA gather forward for scale
    def xla_fwd(p, c):
        return fused.xla_fused_blend(c, p, cfg)
    try:
        scan_time(xla_fwd, pts, cells, name="xla gather fwd", reps=2,
                  trials=2)
    except Exception as e:
        log(f"xla fwd failed: {type(e).__name__}: {e}")

    if args.train:
        import optax
        from cosinesampler_tpu.models import pinn
        pcfg = pinn.PINNConfig(dim=2, n_cells=N, cell_dim=C, cell_size=S,
                               pde="allen_cahn", backend="auto")
        params = {"cells": cells, **{k: v for k, v in pinn.init_params(
            jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = jax.jit(pinn.make_train_step(pcfg, optimizer,
                                            slot_resident=True))

        @jax.jit
        def many_step(params, opt_state, p):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = step(pp, ss, p)
                return (pp, ss), lval
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=REPS)
            return losses

        t0 = time.perf_counter()
        r = many_step(params, opt_state, pts)
        jax.block_until_ready(r)
        log(f"train step: compile+first {time.perf_counter() - t0:.1f}s "
            f"(loss {float(r[0]):.4f} -> {float(r[-1]):.4f})")

        def one(i):
            t0 = time.perf_counter()
            rr = many_step(params, opt_state, pts * (0.999 - 1e-4 * i))
            jax.block_until_ready(rr)
            float(rr[0])
            return time.perf_counter() - t0

        dt = min(one(i) for i in range(3)) / REPS
        log(f"train step: {dt * 1e3:.1f} ms ({Q / dt / 1e6:.1f} Mpts/s)")

    if args.xla_bwd:
        log("probing XLA scatter gradient (may fault)...")
        xcfg = SamplerConfig(dim=2, kernel="cosine", multicell=True,
                             backend="xla")

        def xla_loss(c, p):
            return fused.xla_fused_blend(c, p, xcfg).sum()

        try:
            gr = jax.jit(jax.grad(xla_loss))(cells, pts)
            jax.block_until_ready(gr)
            t0 = time.perf_counter()
            gr = jax.jit(jax.grad(xla_loss))(cells * 0.999, pts)
            jax.block_until_ready(gr)
            log(f"xla bwd: {(time.perf_counter() - t0) * 1e3:.0f} ms "
                "(single shot)")
        except Exception as e:
            log(f"xla bwd FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
