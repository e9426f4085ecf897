"""Stage attribution for the v7 per-cell blend at the smoke_slab shape.

Stages: full fwd | copy-only kernel (window fetch + fixed costs, MXU/VPU
stripped) | windows build alone (XLA _pad_z + slices).
"""

import sys
import time

sys.path.insert(0, ".")

from cosinesampler_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import percell

N, C, S = 4, 4, 128
REPS = 20


def log(m):
    print(f"[pc] {m}", file=sys.stderr, flush=True)


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])
    return time.perf_counter() - t0


def scan_min(fn, cells, grid):
    @jax.jit
    def many(c, g):
        def body(c, _):
            o = fn(c, g)
            return c + 1e-30 * o.ravel()[0], o.ravel()[0]
        _, ticks = jax.lax.scan(body, c, None, length=REPS)
        return ticks.sum()

    t0 = time.perf_counter()
    jax.block_until_ready(many(cells, grid))
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    return min(timed(many, cells * (0.999 - 1e-4 * i), grid)
               for i in range(3)) / REPS


def main():
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=3, backend="pallas")
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.95, 0.95, (N, 16, 16, 16, 3)),
                       jnp.float32)
    qtot = N * 16**3

    sec = scan_min(lambda c, g: percell.pallas_blend_percell(
        c, g, cfg, (0, 0, 0)), cells, grid)
    log(f"full fwd: {sec * 1e3:.2f} ms = {qtot / sec / 1e6:.2f} Mpts/s")

    # copy-only kernel: DMA chain + fixed costs, compute stripped
    orig = percell._blend_pc_kernel

    def copy_kernel(xyv_ref, fmeta_ref, imeta_ref, vol_ref, out_ref,
                    scratch, sem, *, cfg, spatial, dz, q_block, channels,
                    orders):
        rows = dz + percell._FP + 1
        ni = imeta_ref[0, 0, percell._B_NI]
        po = imeta_ref[0, 0, percell._B_PO]
        p = imeta_ref[0, 0, percell._B_PAR]

        def win_dma(slot, a, b):
            return pltpu.make_async_copy(
                vol_ref.at[pl.ds(a, 1), :, pl.ds(b, rows)],
                scratch.at[pl.ds(slot, 1)], sem.at[slot])

        @pl.when(imeta_ref[0, 0, percell._B_HASV] > 0)
        def _():
            @pl.when(imeta_ref[0, 0, percell._B_FIRST] > 0)
            def _():
                win_dma(p, ni, po).start()

            @pl.when(imeta_ref[0, 0, percell._B_SBF] > 0)
            def _():
                win_dma(p, ni, po).wait()

            @pl.when((imeta_ref[0, 0, percell._B_SBF] > 0)
                     & (imeta_ref[0, 0, percell._B_NHAS] > 0))
            def _():
                win_dma(1 - p, imeta_ref[0, 0, percell._B_NNI],
                        imeta_ref[0, 0, percell._B_NPO]).start()
            out_ref[0] = (scratch[pl.ds(p, 1)][0, :, 0, 0, 0:q_block]
                          + xyv_ref[0, 0:1])

        @pl.when(imeta_ref[0, 0, percell._B_HASV] == 0)
        def _():
            out_ref[0] = jnp.zeros((channels, q_block), jnp.float32)

    percell._blend_pc_kernel = copy_kernel
    jax.clear_caches()
    try:
        sec_c = scan_min(lambda c, g: percell.pallas_blend_percell(
            c, g, cfg, (0, 0, 0)), cells, grid)
        log(f"copy-only: {sec_c * 1e3:.2f} ms "
            f"(compute delta {1e3 * (sec - sec_c):.2f} ms)")
    finally:
        percell._blend_pc_kernel = orig


if __name__ == "__main__":
    main()
