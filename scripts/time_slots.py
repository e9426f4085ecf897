"""A/B: slot-resident vs query-ordered fused train steps (2D + 3D
reference workloads), plus the padded v4 kernels at the 128^3 sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn

compile_cache.enable()

REPS = 100


def bench_step(step, params, opt_state, pts, reps=REPS):
    @jax.jit
    def many(params, opt_state, pts):
        def body(carry, _):
            p, s = carry
            p, s, lval = step(p, s, pts)
            return (p, s), lval
        (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=reps)
        return losses

    r = many(params, opt_state, pts)
    jax.block_until_ready(r)

    def one(p):
        t0 = time.perf_counter()
        out = many(params, opt_state, p)
        jax.block_until_ready(out)
        float(out[0])
        return time.perf_counter() - t0

    return min(one(pts * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def run(dim, n_cells, cell_size, pde, q=100_000, reps=REPS):
    rng = np.random.RandomState(dim)
    cfg = pinn.PINNConfig(dim=dim, n_cells=n_cells, cell_dim=4,
                          cell_size=cell_size, pde=pde, backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(dim), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, dim)), jnp.float32)
    for name, kw in (("query-ordered", dict(fused=True)),
                     ("slot-resident", dict(slot_resident=True))):
        step = jax.jit(pinn.make_train_step(cfg, opt, **kw))
        sec = bench_step(step, params, opt_state, pts, reps=reps)
        print(f"{dim}D {pde} {name:>14}: {sec * 1e3:7.2f} ms/step",
              flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "3d"):
        run(3, 50, 16, "helmholtz")
    if which in ("all", "2d"):
        run(2, 96, 16, "allen_cahn")
    if which in ("all", "large"):
        run(3, 16, 128, "helmholtz", q=1_000_000, reps=10)


if __name__ == "__main__":
    main()
