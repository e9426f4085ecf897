"""A/B timing: v5 windowed 3D kernels vs the v3 anchor (untouched across
sessions, so the v5/v3 ratio cancels tunnel contention)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3s, fused3w

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
        float(r.ravel()[0] if hasattr(r, "ravel") else r)
        return time.perf_counter() - t0

    return min(one(pts * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def main():
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(50, 4, 16, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 3)), jnp.float32)
    cfg = SamplerConfig(dim=3)
    g = jnp.asarray(rng.rand(7, 4, 100_000), jnp.float32)

    sec = timed_scan(
        lambda p: fused3s.pallas_fused3s_blend(cells, p, cfg)[0, 0, 0], pts)
    print(f"v3 fwd : {sec * 1e3:7.2f} ms", flush=True)
    v3 = sec
    sec = timed_scan(
        lambda p: fused3w.pallas_fused3w_blend(cells, p, cfg)[0, 0, 0], pts)
    print(f"v5 fwd : {sec * 1e3:7.2f} ms  (v5/v3 = {sec / v3:.3f})",
          flush=True)
    sec = timed_scan(
        lambda p: fused3w.pallas_fused3w_bwd(
            g, p, (16, 16, 16), cfg, 50)[0, 0, 0, 0, 0], pts)
    print(f"v5 bwd : {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
