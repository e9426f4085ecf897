"""A/B: planned vs per-step-binned train step at the reference workloads
(2D 96x4x16^2 Allen-Cahn, 3D 50x4x16^3 Helmholtz, 100k points each)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops.fused import make_sample_plan

compile_cache.enable()

REPS = 100


def bench_dim(dim):
    import optax
    rng = np.random.RandomState(0)
    pcfg = pinn.PINNConfig(
        dim=dim, n_cells=96 if dim == 2 else 50, cell_dim=4, cell_size=16,
        pde="allen_cahn" if dim == 2 else "helmholtz", backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(0), pcfg)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (100_000, dim)), jnp.float32)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    shape = params["cells"].shape

    step = jax.jit(pinn.make_train_step(pcfg, optimizer, slot_resident=True))
    step_pl = jax.jit(pinn.make_train_step(pcfg, optimizer, planned=True))
    plan_of = jax.jit(lambda p: make_sample_plan(p, shape, pcfg.sampler))

    def scan_of(stepfn):
        @jax.jit
        def many(params, opt_state, p, *ex):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = stepfn(pp, ss, p, *ex)
                return (pp, ss), lval
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=REPS)
            return losses
        return many

    many = scan_of(step)
    many_pl = scan_of(step_pl)

    def timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    jax.block_until_ready(many(params, opt_state, pts))
    plan = plan_of(pts)
    jax.block_until_ready(plan)
    jax.block_until_ready(many_pl(params, opt_state, pts, plan))

    sec = min(timed(many, params, opt_state, pts * (0.999 - 1e-4 * i))
              for i in range(3)) / REPS
    print(f"{dim}D unplanned: {sec * 1e3:6.2f} ms/step "
          f"({1 / sec:.0f} it/s)", flush=True)

    def one_trial(i):
        p = pts * (0.999 - 1e-4 * i)
        pl = plan_of(p)
        jax.block_until_ready(pl)
        return timed(many_pl, params, opt_state, p, pl)

    sec = min(one_trial(i) for i in range(3)) / REPS
    print(f"{dim}D planned  : {sec * 1e3:6.2f} ms/step "
          f"({1 / sec:.0f} it/s)", flush=True)


def main():
    bench_dim(2)
    bench_dim(3)


if __name__ == "__main__":
    main()
