"""Micro-benchmark: fused v2 kernel passes at mxu.EXACT_PASSES in {6,3,2}.

Run from the repo root on the TPU (the axon tunnel is single-client; don't
run concurrently with tests).  Times each kernel inside one jitted lax.scan
with a serializing data dependency (per-dispatch tunnel latency is ~15 ms,
see CLAUDE.md), on fresh inputs so the runtime can't replay.

2026-08-16 measurements (v5e via tunnel, 100k queries; reference workloads
96x4x16x16 / 50x4x16^3):

    passes=6 (Precision.HIGHEST)   f2 14.9ms  b2 22.2ms  f3 175ms  b3 160ms
    passes=3 (exact bf16 split)    f2 16.6ms  b2 20.3ms  f3  98ms  b3  15ms
    passes=2 (~3e-6 rel err)       f2 15.7ms  b2 18.1ms  f3  75ms  b3  75ms

2D is not MXU-pass-bound (differences are tunnel noise); 3D is (K=4096
one-hot contractions) and the exact 3-pass split nearly halves it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import mxu, fused2d, fused3d, fused3s

Q = 100_000


def timeit(fn, a0, a1, reps=30):
    @jax.jit
    def run(x0, x1):
        def body(c, _):
            out = fn(c, x1)
            return c + 1e-30 * out.ravel()[0], out.ravel()[0]
        c, vals = jax.lax.scan(body, x0, None, length=reps)
        return vals.sum()

    r = run(a0, a1); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(a0 * 0.999, a1); jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    compile_cache.enable()
    rng = np.random.RandomState(0)
    cfg2 = SamplerConfig(dim=2, kernel="cosine", padding_mode="zeros",
                         align_corners=True, multicell=True, backend="pallas")
    cells2 = jnp.asarray(rng.randn(96, 4, 16, 16), jnp.float32)
    pts2 = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 2)), jnp.float32)
    g2 = jnp.asarray(rng.randn(5, 4, Q), jnp.float32)

    cfg3 = SamplerConfig(dim=3, kernel="cosine", padding_mode="zeros",
                         align_corners=True, multicell=True, backend="pallas")
    cells3 = jnp.asarray(rng.randn(50, 4, 16, 16, 16), jnp.float32)
    pts3 = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    g3 = jnp.asarray(rng.randn(7, 4, Q), jnp.float32)

    cases = {
        "f2": lambda c, p: fused2d.pallas_fused2_blend(c, p, cfg2),
        "b2": lambda gg, p: fused2d.pallas_fused2_bwd(gg, p, (16, 16), cfg2, 96),
        "f3": lambda c, p: fused3d.pallas_fused3_blend(c, p, cfg3),
        "b3": lambda gg, p: fused3d.pallas_fused3_bwd(gg, p, (16, 16, 16), cfg3, 50),
        "f3s": lambda c, p: fused3s.pallas_fused3s_blend(c, p, cfg3),
        "b3s": lambda gg, p: fused3s.pallas_fused3s_bwd(gg, p, (16, 16, 16), cfg3, 50),
    }
    args = {"f2": (cells2, pts2), "b2": (g2, pts2),
            "f3": (cells3, pts3), "b3": (g3, pts3),
            "f3s": (cells3, pts3), "b3s": (g3, pts3)}

    ref = {}
    for passes in (6, 3, 2):
        mxu.EXACT_PASSES = passes
        jax.clear_caches()  # EXACT_PASSES is read at trace time
        for name, fn in cases.items():
            t = timeit(fn, *args[name])
            out = np.asarray(fn(*args[name]))
            if passes == 6:
                ref[name] = out
                err = ""
                if name.endswith("s"):  # v3 vs v2 cross-kernel parity
                    base = ref[name[:-1]]
                    err = (f" vs-v2 relerr="
                           f"{np.abs(out - base).max() / np.abs(base).max():.2e}")
            else:
                scale = np.abs(ref[name]).max()
                err = f" relerr={np.abs(out - ref[name]).max() / scale:.2e}"
            print(f"passes={passes} {name} {t*1e3:.2f} ms{err}", flush=True)


if __name__ == "__main__":
    main()
