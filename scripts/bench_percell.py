"""Per-cell (distinct-grid) query throughput: v1 Pallas vs XLA on TPU.

VERDICT r2 item 4: the reference kernels serve arbitrary per-cell
``(N, H_out, W_out, d)`` grids at the same per-thread speed as shared
clouds (the grid is indexed per (n,h,w) thread,
cosine_sampler_2d_kernel.cu:297-308); the repo's fused generations all
require a SHARED (Q, d) point cloud, so per-cell grids route to the v1
per-order kernels or XLA — correct (verify drive 6b) but with no
recorded throughput until this script.

Measures, on the reference 2D/3D workload shapes with each cell given
its OWN query grid (total points ~ 100k, matching the shared-cloud
bench):

  fwd        : sample() forward                       (v1 pallas vs xla)
  fwd+grad   : + full cell-gradient (splat transpose) (v1 pallas vs xla)

and prints per-point rates next to the shared-cloud fused flagship's
(from BENCH extras) for the "how far off the fast path" comparison.

Known result (BENCHMARKS.md "Per-cell" section): v1 Pallas serves these
4x FASTER per point than the fused ensemble op (per-cell queries read
one cell, not the N-cell blend), so no fused per-cell generation is
needed.  The 3D XLA leg reproducibly crashes the TPU worker when the op
is iterated inside lax.scan (single calls are fine) — an upstream
XLA:TPU runtime fault, recorded, not routed to by default.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample

compile_cache.enable()

REPS = int(os.environ.get("PC_REPS", "50"))
INTERPRET = bool(int(os.environ.get("PC_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")


def timed_scan(fn, cells, grid, reps=REPS):
    @jax.jit
    def many(cells, grid):
        def body(c, _):
            out = fn(c, grid)
            return c * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, cells, None, length=reps)
        return ticks.sum()

    jax.block_until_ready(many(cells, grid))

    def one(i):
        t0 = time.perf_counter()
        r = many(cells * (0.999 - 1e-4 * i), grid)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    return min(one(i) for i in range(3)) / reps


def bench_dim(dim: int):
    rng = np.random.RandomState(0)
    if dim == 2:
        n, c, s = 96, 4, 16
        hw = (32, 32)                 # 96 x 1024 = 98,304 points
        cells = jnp.asarray(rng.rand(n, c, s, s), jnp.float32)
        grid = jnp.asarray(rng.uniform(-0.95, 0.95, (n, *hw, 2)),
                           jnp.float32)
    else:
        n, c, s = 50, 4, 16
        hw = (1, 45, 45)              # 50 x 2025 = 101,250 points
        cells = jnp.asarray(rng.rand(n, c, s, s, s), jnp.float32)
        grid = jnp.asarray(rng.uniform(-0.95, 0.95, (n, *hw, 3)),
                           jnp.float32)
    q_total = n * int(np.prod(hw))

    for backend in ("pallas", "xla"):
        cfg = SamplerConfig(dim=dim, kernel="cosine", multicell=True,
                            backend=backend)
        fwd = lambda cl, g: sample(cl, g, cfg)
        # quadratic loss: the op is LINEAR in cells, so a .sum() loss lets
        # XLA DCE the entire forward out of the gradient (measured: grad
        # faster than fwd); squaring keeps the fwd on the timed path
        gradf = jax.grad(lambda cl, g: (sample(cl, g, cfg) ** 2).sum())
        try:
            t_f = timed_scan(fwd, cells, grid)
            t_g = timed_scan(gradf, cells, grid)
        except Exception as e:
            print(f"{dim}D {backend}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"{dim}D per-cell [{backend:6s}] fwd {t_f*1e3:7.2f} ms "
              f"({q_total/t_f/1e6:6.1f} Mpts/s)   fwd+grad {t_g*1e3:7.2f} ms"
              f" ({q_total/t_g/1e6:6.1f} Mpts/s)", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    bench_dim(2)
    bench_dim(3)


if __name__ == "__main__":
    main()
