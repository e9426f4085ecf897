"""A/B: precision="exact" (3-pass bf16 split) vs "fast" (2-pass) on TPU.

Times the slot-API v4 kernels at the 1M/128^3 sweep and the slot-resident
128^3 train step, best-of-3 jitted scans on perturbed inputs with a forced
device->host value fetch (CLAUDE.md methodology; through the axon tunnel
block_until_ready alone can resolve a replayed future and report ~0 ms).
Large arrays are always jit ARGUMENTS — a 512 MB closure constant poisons
tracing and overflows the remote-compile request (HTTP 413).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3b

N, C, S, Q = 16, 4, 128, 1_000_000
REPS = 10


def log(m):
    print(f"[fast] {m}", file=sys.stderr, flush=True)


def _timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def best3(many, pts, *rest, reps=REPS, name=""):
    t0 = time.perf_counter()
    jax.block_until_ready(many(pts, *rest))
    log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
    best = min(_timed(many, pts * (0.999 - 1e-4 * i), *rest)
               for i in range(3)) / reps
    log(f"{name}: {best * 1e3:.1f} ms/pass best-of-3")
    return best


def main():
    compile_cache.enable()
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    log(f"backend: {jax.default_backend()}")

    nbins = fused3b._geom(S, S, fused3b.V3B_GY)[2]
    qp = (-(-Q // fused3b.V3B_Q_BLOCK) + nbins) * fused3b.V3B_Q_BLOCK

    results = {}
    for prec in ("exact", "fast"):
        cfg = SamplerConfig(dim=3, kernel="cosine", multicell=True,
                            precision=prec)

        @jax.jit
        def many_fwd(p, c, cfg=cfg):
            def body(p, _):
                o, _, _ = fused3b.pallas_fused3b_blend_padded(c, p, cfg)
                return p + 1e-30 * o[0, 0, 0], o[0, 0, 0]
            carry, ticks = jax.lax.scan(body, p, None, length=REPS)
            return ticks.sum() + carry.sum()

        results[f"fwd_{prec}"] = best3(many_fwd, pts, cells,
                                       name=f"v4 fwd slot 1M [{prec}]")

        g = jnp.asarray(rng.rand(7, C, qp), jnp.float32)

        @jax.jit
        def many_bwd(gg, p, cfg=cfg):
            def body(gg, _):
                acc = fused3b.pallas_fused3b_bwd_padded(gg, p, (S, S, S),
                                                        cfg, N)
                return gg + 1e-30 * acc[0, 0, 0, 0, 0], acc[0, 0, 0, 0, 0]
            carry, ticks = jax.lax.scan(body, gg, None, length=REPS)
            return ticks.sum() + carry.sum()

        results[f"bwd_{prec}"] = best3(many_bwd, g, pts,
                                       name=f"v4 bwd slot 1M [{prec}]")

        pcfg = pinn.PINNConfig(dim=3, n_cells=N, cell_dim=C, cell_size=S,
                               kernel="cosine", pde="helmholtz",
                               backend="auto", precision=prec)
        params = {"cells": cells, **{k: v for k, v in pinn.init_params(
            jax.random.PRNGKey(0), pcfg).items() if k != "cells"}}
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = pinn.make_train_step(pcfg, optimizer, slot_resident=True)

        @jax.jit
        def many_step(p, params, opt_state, step=step):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = step(pp, ss, p)
                return (pp, ss), lval
            _, losses = jax.lax.scan(body, (params, opt_state), None,
                                     length=REPS)
            return losses.sum()

        results[f"train_{prec}"] = best3(many_step, pts, params, opt_state,
                                         name=f"train 128^3 [{prec}]")

        if prec == "fast":
            cfg_e = dataclasses.replace(cfg, precision="exact")
            a = fused3b.pallas_fused3b_blend(cells, pts[:100_000], cfg_e)
            b = fused3b.pallas_fused3b_blend(cells, pts[:100_000], cfg)
            err = float(jnp.abs(a - b).max()) / float(jnp.abs(a).max())
            log(f"fast-vs-exact rel err @100k: {err:.2e}")

    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
