"""Measurement harness for the hand-tuned kernel dispatch constants.

The dispatch layer carries empirically-derived constants (V2_Q_BLOCK,
V3W_Q_BLOCK, V3B_GY, _VMEM_BUDGET floor effects...).  This harness
re-derives them on the attached TPU: it sweeps the block parameters of
each fused generation on its flagship workload and prints a ms/pass
table, so a shape/toolchain change can be re-tuned with one command.

Run:  python scripts/tune_blocks.py [--quick]

Serializes everything through one jitted lax.scan per configuration
(tunnel methodology, see BENCHMARKS.md) and reports best-of-3.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cosinesampler_tpu.ops.config import SamplerConfig          # noqa: E402
from cosinesampler_tpu.utils import compile_cache               # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_scan(fn, pts, reps):
    @jax.jit
    def many(p):
        def body(p, _):
            out = fn(p)
            return p + 1e-30 * out, out
        carry, ticks = jax.lax.scan(body, p, None, length=reps)
        return ticks.sum() + carry.sum()

    float(many(pts))  # compile + force a real value fetch
    best = None
    for i in range(3):
        t0 = time.perf_counter()
        # float() forces the device->host value: through the axon tunnel,
        # block_until_ready alone can resolve replayed futures instantly.
        float(many(pts * (0.999 - 1e-4 * i)))
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


def sweep_2d(reps):
    from cosinesampler_tpu.ops.pallas import fused2d, fused2w
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(96, 4, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 2)), jnp.float32)
    cfg = SamplerConfig(dim=2)
    print("v5 windowed 2D (96x4x16x16, 100k pts): q_block -> ms/pass")
    for qb in (128, 256, 512, 1024):
        sec = timed_scan(
            lambda p: fused2w.pallas_fused2w_blend(cells, p, cfg,
                                                   q_block=qb)[0, 0, 0],
            pts, reps)
        print(f"  q_block={qb:4d}: {sec * 1e3:7.2f} ms")
    print("v2 2D (96x4x16x16, 100k pts): q_block -> ms/pass")
    for qb in (128, 256, 512):
        sec = timed_scan(
            lambda p: fused2d.pallas_fused2_blend(cells, p, cfg,
                                                  q_block=qb)[0, 0, 0],
            pts, reps)
        print(f"  q_block={qb:4d}: {sec * 1e3:7.2f} ms")


def sweep_3d(reps):
    from cosinesampler_tpu.ops.pallas import fused3s, fused3w
    rng = np.random.RandomState(1)
    cells = jnp.asarray(rng.rand(50, 4, 16, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 3)), jnp.float32)
    cfg = SamplerConfig(dim=3)
    print("v5 windowed 3D (50x4x16^3, 100k pts): q_block -> ms/pass")
    for qb in (128, 256, 512):
        sec = timed_scan(
            lambda p: fused3w.pallas_fused3w_blend(cells, p, cfg,
                                                   q_block=qb)[0, 0, 0],
            pts, reps)
        print(f"  q_block={qb:4d}: {sec * 1e3:7.2f} ms")
    print("v3 z-binned 3D (same workload): q_block -> ms/pass")
    for qb in (128, 256, 512):
        sec = timed_scan(
            lambda p: fused3s.pallas_fused3s_blend(cells, p, cfg,
                                                   q_block=qb)[0, 0, 0],
            pts, reps)
        print(f"  q_block={qb:4d}: {sec * 1e3:7.2f} ms")


def sweep_large(reps):
    from cosinesampler_tpu.ops.pallas import fused3b
    rng = np.random.RandomState(2)
    cells = jnp.asarray(rng.rand(16, 4, 128, 128, 128), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    cfg = SamplerConfig(dim=3)
    print("v4 bricked (16x4x128^3, 1M pts): (gy, q_block) -> ms/pass")
    for gy in (2, 4, 8):
        for qb in (128, 256):
            sec = timed_scan(
                lambda p: fused3b.pallas_fused3b_blend(
                    cells, p, cfg, q_block=qb, gy=gy)[0, 0, 0],
                pts, reps)
            print(f"  gy={gy} q_block={qb:4d}: {sec * 1e3:7.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer scan reps (faster, noisier)")
    ap.add_argument("--stage", choices=["2d", "3d", "large", "all"],
                    default="all")
    args = ap.parse_args()
    compile_cache.enable()
    log(f"backend: {jax.default_backend()}")
    reps = 10 if args.quick else 30
    if args.stage in ("2d", "all"):
        sweep_2d(reps)
    if args.stage in ("3d", "all"):
        sweep_3d(reps)
    if args.stage in ("large", "all"):
        sweep_large(max(3, reps // 6))


if __name__ == "__main__":
    main()
