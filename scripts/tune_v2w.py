"""q_block sweep for the v5 2D windowed kernels (reference 2D workload)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused2w

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
    cells = jnp.asarray(rng.rand(96, 4, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 2)), jnp.float32)
    cfg = SamplerConfig(dim=2)
    g = jnp.asarray(rng.rand(5, 4, 100_000), jnp.float32)

    for qb in (128, 256, 512, 1024):
        sec = timed_scan(
            lambda p, qb=qb: fused2w.pallas_fused2w_blend(
                cells, p, cfg, q_block=qb)[0, 0, 0], pts)
        print(f"v2w fwd q_block={qb:4d}: {sec * 1e3:7.2f} ms", flush=True)
    for qb in (128, 256, 512, 1024):
        sec = timed_scan(
            lambda p, qb=qb: fused2w.pallas_fused2w_bwd(
                g, p, (16, 16), cfg, 96, q_block=qb)[0, 0, 0, 0], pts)
        print(f"v2w bwd q_block={qb:4d}: {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
