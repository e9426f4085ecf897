"""Attribute the megakernel's TPU cost + check Mosaic tanh accuracy.

1. tanh probe: Mosaic's in-kernel tanh vs the f64 reference (the VPU trig
   lesson, CLAUDE.md — cos/sin measured ~1e-3; is tanh the source of the
   mega loss deviation?).  Also probes exp for a rational fallback.
2. mega loss_and_grad vs the separate fwd+bwd padded kernels at matched
   q_block in {128, 256, 512}: where does the one-pass step stand against
   the exact pair it replaces?
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from cosinesampler_tpu.utils import compile_cache

compile_cache.enable()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.pallas import fused2w, mega2w


def log(m):
    print(f"[probe] {m}", file=sys.stderr, flush=True)


def tanh_probe():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.tanh(x_ref[...])

    x = jnp.asarray(np.linspace(-6, 6, 8 * 128, dtype=np.float32)
                    ).reshape(8, 128)
    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    ref = np.tanh(np.asarray(x, np.float64))
    err = np.abs(np.asarray(got, np.float64) - ref)
    rel = err / np.maximum(np.abs(ref), 1e-6)
    log(f"mosaic tanh: max abs err {err.max():.3e}, max rel {rel.max():.3e}")

    def k2(x_ref, o_ref):
        o_ref[...] = jnp.exp(x_ref[...])

    got2 = pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    ref2 = np.exp(np.asarray(x, np.float64))
    rel2 = np.abs(np.asarray(got2, np.float64) - ref2) / np.abs(ref2)
    log(f"mosaic exp:  max rel {rel2.max():.3e}")

    # rational tanh from exp: tanh(x) = 1 - 2/(exp(2x)+1)
    def k3(x_ref, o_ref):
        e = jnp.exp(2.0 * x_ref[...])
        o_ref[...] = 1.0 - 2.0 / (e + 1.0)

    got3 = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    rel3 = np.abs(np.asarray(got3, np.float64) - ref) / np.maximum(
        np.abs(ref), 1e-6)
    log(f"exp-based tanh: max rel {rel3.max():.3e}")


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def scan_min(fn, cells, reps):
    @jax.jit
    def many(c):
        def body(carry, _):
            out = fn(carry)
            lead = jax.tree_util.tree_leaves(out)[0]
            return carry + 1e-30 * lead.ravel()[0], lead.ravel()[0]
        carry, vals = jax.lax.scan(body, c, None, length=reps)
        return vals.sum() + carry.sum()

    jax.block_until_ready(many(cells))
    return min(timed(many, cells * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--prec", default="bf16")
    ap.add_argument("--qbs", default="128,256,512")
    ap.add_argument("--skip-tanh", action="store_true")
    args = ap.parse_args()

    if not args.skip_tanh:
        tanh_probe()

    rng = np.random.RandomState(0)
    cfg = pinn.PINNConfig(dim=2, n_cells=96, cell_dim=4, cell_size=16,
                          pde="allen_cahn", backend="pallas",
                          precision=args.prec)
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (args.points, 2)), jnp.float32)
    scfg = cfg.sampler
    mlp = {k: params[k] for k in ("w1", "b1", "w2", "b2")}
    tile = mega2w.pack_mlp(mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"])

    for qb in (int(x) for x in args.qbs.split(",")):
        plan = fused2w.make_plan(pts, (16, 16), scfg, q_block=qb)
        qp = plan[1].shape[0]
        gp = jnp.ones((5, 4, qp), jnp.float32)

        sec_f = scan_min(
            lambda c: fused2w.pallas_fused2w_blend_padded(
                c, pts, scfg, q_block=qb, plan=plan)[0][0, 0, 0],
            params["cells"], args.reps)
        sec_b = scan_min(
            lambda c: fused2w.pallas_fused2w_bwd_padded(
                gp, pts, (16, 16), scfg, 96, q_block=qb,
                plan=plan)[0, 0, 0, 0] + 1e-30 * c[0, 0, 0, 0],
            params["cells"], args.reps)

        def mega_fn(c, _qb=qb, _plan=plan):
            loss, grads = mega2w.pallas_mega2w_step(
                c, tile, pts, scfg, "allen_cahn", 16, q_block=_qb,
                plan=_plan)
            return loss

        sec_m = scan_min(mega_fn, params["cells"], args.reps)
        log(f"qb={qb} [{args.prec}]: fwd {sec_f * 1e3:.2f} + bwd "
            f"{sec_b * 1e3:.2f} = {(sec_f + sec_b) * 1e3:.2f} ms "
            f"vs mega {sec_m * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
