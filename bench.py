"""Benchmark: the reference's 2D PINN training workload on TPU.

Workload = test/test_2d.py:20-26,221-230 of the reference: 96 cells x 4ch x
16x16 grids, 100k collocation points, cosine+multicell, Allen-Cahn residual
with u, u_y, u_xx, full gradient to the cells (third-order chain), Adam step.

Prints ONE JSON line:
  value       = PINN training iterations/sec with the cosinesampler_tpu chain
  vs_baseline = speedup over "naive JAX": the same pipeline with derivatives
                obtained by letting JAX trace nested autodiff through the
                plain XLA gather program (no custom_vjp chain, no kernels) —
                the baseline the reference's custom CUDA chain was built to
                beat (README.md:3), and BASELINE.md's >=10x target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig

N_POINTS = 100_000
N_WARMUP = 3
N_ITERS = 10


def _pinn_cfg(backend: str) -> pinn.PINNConfig:
    return pinn.PINNConfig(dim=2, n_cells=96, cell_dim=4, cell_size=16,
                           kernel="cosine", pde="allen_cahn", backend=backend)


def _naive_field(params, pts, cfg: pinn.PINNConfig):
    """Same model, but the sampler is the raw XLA program (JAX retraces all
    derivative orders instead of using the custom chain)."""
    cells = params["cells"]
    n = cells.shape[0]
    q = pts.shape[0]
    grid = jnp.broadcast_to(pts[None, None], (n, 1, q, 2))
    scfg = SamplerConfig(dim=2, kernel=cfg.kernel, padding_mode="zeros",
                         multicell=True, backend="xla")
    out = generic.blend(cells, grid, scfg, (0, 0))
    feats = out.reshape(n, cfg.cell_dim, q).sum(0)
    return pinn._mlp(params, feats.T)


def _make_loss(cfg, field_fn):
    def u(params, pts):
        return field_fn(params, pts, cfg)

    def u_d(params, pts, ax):
        return jax.grad(lambda p: u(params, p).sum())(pts)[:, ax]

    def u_dd(params, pts, ax):
        return jax.grad(lambda p: u_d(params, p, ax).sum())(pts)[:, ax]

    def loss(params, pts):
        uv = u(params, pts)
        f = (2.0 * u_d(params, pts, 1) + 5.0 * uv**3 - 5.0 * uv
             - 1e-4 * u_dd(params, pts, 0))
        return jnp.mean(f**2)

    return loss


def _bench_step(loss_fn, params, pts, optimizer):
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, pts):
        lval, grads = jax.value_and_grad(loss_fn)(params, pts)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, g: p + g, params, updates)
        return params, opt_state, lval

    # compile + warmup
    for _ in range(N_WARMUP):
        params, opt_state, lval = step(params, opt_state, pts)
    jax.block_until_ready(lval)

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        params, opt_state, lval = step(params, opt_state, pts)
    jax.block_until_ready(lval)
    dt = time.perf_counter() - t0
    return N_ITERS / dt, float(lval)


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(N_POINTS, 2)),
                      dtype=jnp.float32)
    optimizer = optax.adam(1e-3)

    cfg = _pinn_cfg(backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)

    ours_loss = _make_loss(cfg, pinn.field)
    ours_ips, _ = _bench_step(ours_loss, params, pts, optimizer)

    naive_loss = _make_loss(cfg, _naive_field)
    naive_ips, _ = _bench_step(naive_loss, params, pts, optimizer)

    print(json.dumps({
        "metric": "2D multicell PINN train iters/sec "
                  "(96x4x16x16 cells, 100k pts, 3rd-order chain)",
        "value": round(ours_ips, 3),
        "unit": "iters/sec",
        "vs_baseline": round(ours_ips / naive_ips, 3),
    }))


if __name__ == "__main__":
    main()
