"""TPU smoke + throughput for the over-VMEM per-cell surface.

Interpret-mode tests (tests/test_slab.py, test_percell.py) pin the math;
this script proves Mosaic compiles the route on hardware and records its
throughput: per-cell queries on a 128^3-class volume, fwd and
cell-gradient, iterated inside a jitted lax.scan (the pattern that faults
the XLA fallback, BENCHMARKS.md).  Since round 5 this workload routes to
the BINNED v7 kernels (percell.py, 4.1 Mpts/s fwd); sparse clouds below
the pair floor still ride the slab route (1.34 Mpts/s).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample

compile_cache.enable()

N, C, S = 4, 4, 128
REPS = 20


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    # per-cell distinct grids: the reference surface with no prior route
    grid = jnp.asarray(rng.uniform(-0.95, 0.95, (N, 16, 16, 16, 3)),
                       jnp.float32)
    q_total = N * 16**3
    print(f"device: {jax.devices()[0]}  vol {N}x{C}x{S}^3 "
          f"({cells.nbytes / 1e6:.0f} MB), {q_total} per-cell points",
          flush=True)

    # correctness on hardware, small query count vs the XLA oracle
    # (single XLA calls are safe; only scanned ones fault)
    g_small = grid[:, :2, :2, :2]
    got = sample(cells, g_small, cfg)
    want = generic.blend(cells, g_small, cfg, (0, 0, 0))
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"hw parity vs XLA oracle (n={g_small.size // 3} pts): "
          f"max abs err {err:.2e}", flush=True)
    assert err < 1e-4

    @jax.jit
    def many_fwd(c, g):
        def body(c, _):
            o = sample(c, g, cfg)
            return c * 1.0000001, o.ravel()[0]
        _, ticks = jax.lax.scan(body, c, None, length=REPS)
        return ticks.sum()

    t0 = time.perf_counter()
    jax.block_until_ready(many_fwd(cells, grid))
    print(f"fwd compile+first-run {time.perf_counter() - t0:.1f}s",
          flush=True)
    sec = min(timed(many_fwd, cells * (0.999 - 1e-4 * i), grid)
              for i in range(3)) / REPS
    print(f"slab fwd (scan x{REPS}): {sec * 1e3:.1f} ms = "
          f"{q_total / sec / 1e6:.2f} Mpts/s", flush=True)

    gradf = jax.grad(lambda c, g: (sample(c, g, cfg) ** 2).sum())

    @jax.jit
    def many_grad(c, g):
        def body(c, _):
            gr = gradf(c, g)
            return c + 1e-30 * gr.ravel()[0], gr.ravel()[0]
        _, ticks = jax.lax.scan(body, c, None, length=REPS)
        return ticks.sum()

    t0 = time.perf_counter()
    jax.block_until_ready(many_grad(cells, grid))
    print(f"grad compile+first-run {time.perf_counter() - t0:.1f}s",
          flush=True)
    sec = min(timed(many_grad, cells * (0.999 - 1e-4 * i), grid)
              for i in range(3)) / REPS
    print(f"slab fwd+grad (scan x{REPS}): {sec * 1e3:.1f} ms = "
          f"{q_total / sec / 1e6:.2f} Mpts/s", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
