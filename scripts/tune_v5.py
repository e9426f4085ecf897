"""q_block sweep + MXU-pass diagnostic for the v5 windowed 3D kernels."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3w, mxu

compile_cache.enable()

REPS = 100


def timed_scan(fn, pts, reps=REPS):
    @jax.jit
    def many(p):
        def body(p, _):
            out = fn(p)
            return p + 1e-30 * out, out
        carry, ticks = jax.lax.scan(body, p, None, length=reps)
        return ticks.sum() + carry.sum()

    jax.block_until_ready(many(pts))

    def one(p):
        t0 = time.perf_counter()
        r = many(p)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    return min(one(pts * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def main():
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(50, 4, 16, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 3)), jnp.float32)
    cfg = SamplerConfig(dim=3)
    g = jnp.asarray(rng.rand(7, 4, 100_000), jnp.float32)

    for qb in (128, 256):
        sec = timed_scan(
            lambda p, qb=qb: fused3w.pallas_fused3w_blend(
                cells, p, cfg, q_block=qb)[0, 0, 0], pts)
        print(f"v5 fwd q_block={qb:4d}: {sec * 1e3:7.2f} ms", flush=True)
    for qb in (128, 256):
        sec = timed_scan(
            lambda p, qb=qb: fused3w.pallas_fused3w_bwd(
                g, p, (16, 16, 16), cfg, 50, q_block=qb)[0, 0, 0, 0, 0], pts)
        print(f"v5 bwd q_block={qb:4d}: {sec * 1e3:7.2f} ms", flush=True)

    # diagnostic only: how much of the kernel is MXU passes?
    mxu.EXACT_PASSES = 2
    sec = timed_scan(
        lambda p: fused3w.pallas_fused3w_blend(
            cells, p, cfg, q_block=512, interpret=False)[0, 0, 1], pts)
    print(f"v5 fwd 2-pass (diag) : {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
