"""Isolate the XLA-side prep cost of the v5 windowed kernels: binning
(sort + inverse + padding maps), window-array build, and the coordinate /
output permutation gathers — everything around the pallas_call."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3b, fused3w

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
    d = h = w = 16
    q_block = fused3w.V3W_Q_BLOCK
    wp = fused3w._xpad(w)
    rows = fused3w._win_rows(wp)
    gy = rows - 2
    nby, nbz, nbins, hp = fused3b._geom(d, h, gy)
    npad = fused3w._npad(50)

    def bin_only(p):
        positions, occ, z0, y0, hasv, qp = fused3b._brick_bin(
            p, d, h, cfg, q_block, gy)
        return (positions[0] + occ[0] + z0[0] + y0[0] + hasv[0]).astype(
            jnp.float32)

    sec = timed_scan(bin_only, pts)
    print(f"brick_bin only      : {sec * 1e3:7.2f} ms", flush=True)

    def prep_all(p):
        positions, occ, z0, y0, hasv, qp = fused3b._brick_bin(
            p, d, h, cfg, q_block, gy)
        pts_p = fused3b.scatter_to_slots(p.astype(jnp.float32), positions,
                                         qp)
        cells_p = jnp.pad(cells, ((0, npad - 50),) + ((0, 0),) * 4)
        vol = fused3b._pad_volume(cells_p, d, h, w, hp, wp)
        wins = fused3w._windows(vol, nbins, nby, gy, rows)
        fake = wins[0, 0, 0] + pts_p[0, 0]
        out = jnp.broadcast_to(fake, (28, occ.shape[0]))
        return out[:, positions].reshape(7, 4, 100_000)[0, 0, 0]

    sec = timed_scan(prep_all, pts)
    print(f"prep + out permute  : {sec * 1e3:7.2f} ms", flush=True)

    sec = timed_scan(
        lambda p: fused3w.pallas_fused3w_blend(cells, p, cfg)[0, 0, 0], pts)
    print(f"v5 fwd full         : {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
