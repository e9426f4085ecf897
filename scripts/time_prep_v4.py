"""Isolate _brick_bin + prep cost at the 128^3 / 1M-query v4 config."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3b

compile_cache.enable()

REPS = 20
N, C, S, Q = 16, 4, 128, 1_000_000


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
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    cfg = SamplerConfig(dim=3, kernel="cosine", multicell=True)
    gy = fused3b.V3B_GY

    def sort_only(p):
        key = (p[:, 2] * 1000).astype(jnp.int32)
        skey, perm = jax.lax.sort_key_val(key, jnp.arange(Q, dtype=jnp.int32))
        return (skey[0] + perm[0]).astype(jnp.float32)

    sec = timed_scan(sort_only, pts)
    print(f"raw sort_key_val 1M : {sec * 1e3:7.2f} ms", flush=True)

    def bin_only(p):
        positions, occ, z0, y0, hasv, qp = fused3b._brick_bin(
            p, S, S, cfg, fused3b.V3B_Q_BLOCK, gy)
        return (positions[0] + occ[0] + z0[0] + y0[0] + hasv[0]).astype(
            jnp.float32)

    sec = timed_scan(bin_only, pts)
    print(f"brick_bin 1M/8450   : {sec * 1e3:7.2f} ms", flush=True)

    # staged breakdown of the sort path
    from cosinesampler_tpu.ops.pallas.prep import bin_base
    q_block = fused3b.V3B_Q_BLOCK
    nby, nbz, nbins, _ = fused3b._geom(S, S, gy)

    def stage(p, upto):
        q = p.shape[0]
        bz_f = bin_base(p[:, 2].astype(jnp.float32), S, cfg)
        by_f = bin_base(p[:, 1].astype(jnp.float32), S, cfg)
        fz = jnp.floor(jax.lax.stop_gradient(bz_f)).astype(jnp.int32)
        fy = jnp.floor(jax.lax.stop_gradient(by_f)).astype(jnp.int32)
        bz = jnp.clip(fz + 2, 0, nbz - 1)
        by = jnp.clip((fy + 2) // gy, 0, nby - 1)
        key = (bz * nby + by).astype(jnp.int32)
        qp = ((q + q_block - 1) // q_block + nbins) * q_block
        iota = jnp.arange(q, dtype=jnp.int32)
        if upto == 0:
            return key.sum().astype(jnp.float32)
        skey, perm = jax.lax.sort_key_val(key, iota)
        if upto == 1:
            return (skey[0] + perm[0]).astype(jnp.float32)
        iperm = jnp.zeros((q,), jnp.int32).at[perm].set(iota)
        if upto == 2:
            return iperm.sum().astype(jnp.float32)
        edges = jnp.searchsorted(
            skey, jnp.arange(nbins + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = edges[1:] - edges[:-1]
        padded = ((counts + q_block - 1) // q_block) * q_block
        offs = jnp.cumsum(padded).astype(jnp.int32) - padded
        if upto == 3:
            return offs.sum().astype(jnp.float32)
        start = edges[:-1]
        spos = offs[skey] + (iota - start[skey])
        positions = spos[iperm]
        if upto == 4:
            return positions.sum().astype(jnp.float32)
        inv = jnp.full((qp,), -1, jnp.int32).at[positions].set(iota)
        return inv.sum().astype(jnp.float32)

    for upto, name in [(0, "key"), (1, "+sort"), (2, "+iperm scatter"),
                       (3, "+searchsorted"), (4, "+positions"),
                       (5, "+inv scatter")]:
        sec = timed_scan(lambda p, u=upto: stage(p, u), pts)
        print(f"stage {name:16s}: {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
