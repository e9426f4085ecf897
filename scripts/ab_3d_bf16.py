"""Same-session A/B: the 3D bf16 train step at q_block 512 (tuned) vs 128.

The bf16 v3w sweep measured q_block=512 best on the standalone fwd+bwd
pair (8.00 vs 8.64 ms), but the first full-step runs straddled two bench
sessions with ~10% tunnel drift, so the in-step winner was ambiguous.
This times the COMPLETE train step at both block sizes inside one
process/session, interleaved A/B/A/B to cancel drift.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# isolate from the shipped table: we inject each candidate via the overlay
overlay = "/tmp/ab_overlay.json"
os.environ["COSINESAMPLER_TUNE_CACHE"] = overlay

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.utils import autotune, compile_cache
from cosinesampler_tpu.models import pinn

compile_cache.enable()

REPS = 50


def step_fn(qb):
    """A train step whose kernels run at q_block=qb, via the overlay."""
    import json
    cfg = pinn.PINNConfig(dim=3, n_cells=50, cell_dim=4, cell_size=16,
                          kernel="cosine", pde="helmholtz", backend="auto",
                          precision="bf16")
    key = autotune.key("v3w", (50, 4, 16, 16, 16), cfg.sampler, 100_000)
    with open(overlay, "w") as f:
        json.dump({key: {"q_block": qb}}, f)
    autotune.reset_cache()
    optimizer = optax.adam(1e-3)
    step = jax.jit(pinn.make_train_step(cfg, optimizer, slot_resident=True))

    @jax.jit
    def many(params, opt_state, pts):
        def body(carry, _):
            p, s = carry
            p, s, lval = step(p, s, pts)
            return (p, s), lval
        (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=REPS)
        return losses
    params = pinn.init_params(jax.random.PRNGKey(1), cfg)
    return many, params, optimizer.init(params)


def timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 3)), jnp.float32)
    arms = {}
    for qb in (512, 128):
        many, params, opt_state = step_fn(qb)
        jax.block_until_ready(many(params, opt_state, pts))
        arms[qb] = (many, params, opt_state)
    times = {512: [], 128: []}
    for trial in range(4):
        for qb in (512, 128):
            many, params, opt_state = arms[qb]
            dt = timed(many, params, opt_state,
                       pts * (0.999 - 1e-4 * trial))
            times[qb].append(dt / REPS * 1e3)
            print(f"trial {trial} qb={qb}: {dt / REPS * 1e3:.2f} ms/step",
                  flush=True)
    for qb in (512, 128):
        print(f"qb={qb}: best {min(times[qb]):.2f} ms/step  "
              f"all={[round(t, 2) for t in times[qb]]}", flush=True)


if __name__ == "__main__":
    main()
