"""A/B: precision="exact" (3-pass bf16 split) vs "fast" (2-pass) on TPU.

Times the slot-API v4 kernels at the 1M/128^3 sweep and the slot-resident
train steps (3D reference workload + 128^3), best-of-3 jitted scans on
perturbed inputs (CLAUDE.md methodology).
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
REPS = 20


def log(m):
    print(f"[fast] {m}", file=sys.stderr, flush=True)


def best3(fn, pts, *rest, reps=REPS, name=""):
    @jax.jit
    def many(p, rest):
        def body(c, _):
            out = fn(c, *rest)
            tick = jnp.asarray(out[0] if isinstance(out, tuple) else out
                               ).ravel()[0]
            return c + 1e-30 * tick, tick
        carry, ticks = jax.lax.scan(body, p, None, length=reps)
        return ticks.sum() + carry.sum()

    t0 = time.perf_counter()
    jax.block_until_ready(many(pts, rest))
    log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many(pts * (0.999 - 1e-4 * i), rest))
        best = min(best, (time.perf_counter() - t0) / reps)
    log(f"{name}: {best * 1e3:.1f} ms/pass best-of-3")
    return best


def main():
    compile_cache.enable()
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    log(f"backend: {jax.default_backend()}")

    results = {}
    for prec in ("exact", "fast"):
        cfg = SamplerConfig(dim=3, kernel="cosine", multicell=True,
                            precision=prec)
        out_p, occ, _ = fused3b.pallas_fused3b_blend_padded(
            cells, pts[:100_000], cfg)
        qp = out_p.shape[-1]
        g = jnp.asarray(rng.rand(7, C, qp), jnp.float32)

        results[f"fwd_{prec}"] = best3(
            lambda p, c, cfg=cfg: fused3b.pallas_fused3b_blend_padded(
                c, p, cfg)[0],
            pts, cells, name=f"v4 fwd slot 1M [{prec}]")

        def bwdfn(p, gg, cfg=cfg):
            outp, occ2, _ = fused3b.pallas_fused3b_blend_padded(cells, p, cfg)
            return fused3b.pallas_fused3b_bwd_padded(
                outp * 1e-3, p, (S, S, S), cfg, N)
        results[f"bwd_{prec}"] = best3(
            bwdfn, pts, None, name=f"v4 fwd+bwd slot 1M [{prec}]")

        pcfg = pinn.PINNConfig(dim=3, n_cells=N, cell_dim=C, cell_size=S,
                               kernel="cosine", pde="helmholtz",
                               backend="auto", precision=prec)
        params = pinn.init_params(jax.random.PRNGKey(0), pcfg)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = pinn.make_train_step(pcfg, optimizer, slot_resident=True)

        def one(p, prm, st, step=step):
            prm, st, lval = step(prm, st, p)
            return lval + prm["b2"][0] * 1e-30
        results[f"train_{prec}"] = best3(one, pts, params, opt_state,
                                         name=f"train 128^3 [{prec}]")

        # parity probe fast-vs-exact at 100k
        if prec == "fast":
            cfg_e = dataclasses.replace(cfg, precision="exact")
            a = fused3b.pallas_fused3b_blend(cells, pts[:100_000], cfg_e)
            b = fused3b.pallas_fused3b_blend(cells, pts[:100_000], cfg)
            err = float(jnp.abs(a - b).max()) / float(jnp.abs(a).max())
            log(f"fast-vs-exact rel err @100k: {err:.2e}")

    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
