"""Is the ~3 ms/rep on a trivial scan body per-iteration or per-call?"""
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


def run(reps):
    @jax.jit
    def many(x):
        def body(x, _):
            out = jnp.clip(x.astype(jnp.int32), 0, 53).sum().astype(
                jnp.float32)
            return x + 1e-30 * out, out
        carry, ticks = jax.lax.scan(body, x, None, length=reps)
        return ticks.sum() + carry.sum()

    x = jnp.asarray(np.random.RandomState(0).uniform(0, 54, (Q,)),
                    jnp.float32)
    jax.block_until_ready(many(x))
    best = None
    for i in range(3):
        xi = x * (0.999 - 1e-4 * i)
        t0 = time.perf_counter()
        r = many(xi)
        jax.block_until_ready(r)
        float(r)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"reps={reps:4d}: total {best * 1e3:8.2f} ms = "
          f"{best / reps * 1e3:6.3f} ms/rep", flush=True)


for reps in (5, 20, 100, 400):
    run(reps)
