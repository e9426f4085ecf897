"""Focused sb (sub-blocks per grid step) sweep for the v5 2D kernels.

The full autotune grid recompiles every candidate through the remote
tunnel; this narrows to the sub-blocking question at the already-tuned
q_block=128 on the reference 2D workload.  Records the winner to the user
overlay only when run with --save.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cosinesampler_tpu.utils import autotune, compile_cache

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

from cosinesampler_tpu.ops.config import SamplerConfig  # noqa: E402

CANDS = [{"q_block": 128},
         {"q_block": 128, "sb": 4},
         {"q_block": 128, "sb": 8}]


def main():
    save = "--save" in sys.argv
    autotune._candidates = lambda gen: CANDS
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=2, backend="pallas")
    cells = jnp.asarray(rng.rand(96, 4, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, 2)), jnp.float32)
    res = autotune.tune("v2w", cells, pts, cfg, reps=100, save=save)
    print("result:", res)


if __name__ == "__main__":
    main()
