"""Micro-timing of _brick_bin subexpressions on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache

compile_cache.enable()

Q = 100_000
NBINS = 54
QP = 224 * 512
REPS = 20


def timed(fn, *args):
    @jax.jit
    def many(x, *rest):
        def body(x, _):
            out = fn(x, *rest)
            return x + 1e-30 * out, out
        carry, ticks = jax.lax.scan(body, x, None, length=REPS)
        return ticks.sum() + carry.sum()

    jax.block_until_ready(many(*args))

    def one(x, *rest):
        t0 = time.perf_counter()
        r = many(x, *rest)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    outs = []
    for i in range(3):
        outs.append(one(args[0] * (0.999 - 1e-4 * i), *args[1:]))
    return min(outs) / REPS


def main():
    rng = np.random.RandomState(0)
    keyf = jnp.asarray(rng.uniform(0, NBINS, (Q,)), jnp.float32)

    def mk_key(kf):
        return jnp.clip(kf.astype(jnp.int32), 0, NBINS - 1)

    sec = timed(lambda kf: mk_key(kf).sum().astype(jnp.float32), keyf)
    print(f"key build            : {sec * 1e3:7.2f} ms", flush=True)

    def onehot_counts(kf):
        key = mk_key(kf)
        oh = (key[:, None] == jnp.arange(NBINS, dtype=jnp.int32)[None, :]
              ).astype(jnp.int32)
        return oh.sum(axis=0).sum().astype(jnp.float32)

    sec = timed(onehot_counts, keyf)
    print(f"onehot + counts      : {sec * 1e3:7.2f} ms", flush=True)

    def onehot_cumsum(kf):
        key = mk_key(kf)
        oh = (key[:, None] == jnp.arange(NBINS, dtype=jnp.int32)[None, :]
              ).astype(jnp.int32)
        srank = ((jnp.cumsum(oh, axis=0) - 1) * oh).sum(axis=1)
        return srank.sum().astype(jnp.float32)

    sec = timed(onehot_cumsum, keyf)
    print(f"onehot cumsum ranks  : {sec * 1e3:7.2f} ms", flush=True)

    def tri_ranks(kf):
        key = mk_key(kf)
        g, l = Q // 500, 500
        oh = (key.reshape(g, l)[:, :, None]
              == jnp.arange(NBINS, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)
        cnt = oh.sum(axis=1)                                   # (G, nbins)
        gpfx = jnp.cumsum(cnt, axis=0) - cnt                   # (G, nbins)
        tril = jnp.tril(jnp.ones((l, l), jnp.float32), k=-1)
        intra = jax.lax.dot_general(
            oh, tril, (((1,), (1,)), ((0,), ())))              # (G, nbins, L)
        intra = intra.transpose(0, 2, 1)
        rank = ((gpfx[:, None, :] + intra) * oh).sum(axis=2)
        return rank.sum().astype(jnp.float32)

    sec = timed(tri_ranks, keyf)
    print(f"tri-matmul ranks     : {sec * 1e3:7.2f} ms", flush=True)

    iota = jnp.arange(Q, dtype=jnp.int32)

    def scatter_inv(kf):
        pos = jnp.clip(kf * (QP / NBINS), 0, QP - 1).astype(jnp.int32)
        inv = jnp.full((QP,), -1, jnp.int32).at[pos].set(iota)
        return inv.sum().astype(jnp.float32)

    sec = timed(scatter_inv, keyf)
    print(f"inv scatter (100k)   : {sec * 1e3:7.2f} ms", flush=True)

    gsrc = jnp.asarray(rng.rand(28, QP), jnp.float32)

    def out_gather(kf):
        pos = jnp.clip(kf * (QP / NBINS), 0, QP - 1).astype(jnp.int32)
        return gsrc[:, pos].sum()

    sec = timed(out_gather, keyf)
    print(f"out[:, positions]    : {sec * 1e3:7.2f} ms", flush=True)

    pts3 = jnp.asarray(rng.uniform(-1, 1, (QP, 3)), jnp.float32)

    def pts_gather(kf):
        pos = jnp.clip(kf * (Q / NBINS), 0, Q - 1).astype(jnp.int32)
        pos = jnp.pad(pos, (0, QP - Q))
        return pts3[pos].sum()

    sec = timed(pts_gather, keyf)
    print(f"pts gather (qp x 3)  : {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
