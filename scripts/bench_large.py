"""Large-volume sweep bench (BASELINE config 5): 16 cells x 4ch x 128^3, 1M pts.

Times the v4 bricked kernels (ops/pallas/fused3b.py) and the XLA gather
forward on the real TPU.  The XLA scatter backward is intentionally NOT run:
it is the known device-faulter this kernel replaces (BENCHMARKS.md), and a
fault wedges the single-client tunnel.

Each op is timed inside one jitted lax.scan with a serializing data
dependency on fresh-ish inputs (CLAUDE.md: per-dispatch tunnel latency and
replay short-circuiting make Python-loop timing meaningless here).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import fused3b

N, C, S, Q = 16, 4, 128, 1_000_000
REPS = 10


def scan_time(fn, *args, reps=REPS, name=""):
    """Run fn reps times in one jitted scan, carrying a points perturbation."""

    @jax.jit
    def many(pts, rest):
        def body(p, _):
            out = fn(p, *rest)
            tick = jnp.asarray(out[0] if isinstance(out, tuple) else out
                               ).ravel()[0]
            return p + 1e-30 * tick, tick
        carry, ticks = jax.lax.scan(body, pts, None, length=reps)
        return ticks.sum() + carry.sum()

    pts, rest = args[0], args[1:]
    t0 = time.perf_counter()
    r = many(pts, rest)
    jax.block_until_ready(r)
    print(f"[large] {name}: compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    r = many(pts * 0.999, rest)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"[large] {name}: {dt * 1e3:.1f} ms/pass "
          f"({Q / dt / 1e6:.1f} Mpts/s)", file=sys.stderr, flush=True)
    return dt


def main():
    compile_cache.enable()
    rng = np.random.RandomState(0)
    cfg = SamplerConfig(dim=3, kernel="cosine", multicell=True)
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    g = jnp.asarray(rng.rand(7, C, Q), jnp.float32)

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    # parity probe at full scale (single call each)
    got = fused3b.pallas_fused3b_blend(cells, pts[:100_000], cfg)
    want = fused.xla_fused_blend(cells, pts[:100_000], cfg)
    scale = float(jnp.abs(want).max())
    err = float(jnp.abs(got - want).max()) / scale
    print(f"[large] v4 blend vs XLA @100k rel err {err:.2e}",
          file=sys.stderr, flush=True)

    t_v4_fwd = scan_time(
        lambda p, c: fused3b.pallas_fused3b_blend(c, p, cfg),
        pts, cells, name="v4 blend 1M")
    t_v4_bwd = scan_time(
        lambda p, gg: fused3b.pallas_fused3b_bwd(gg, p, (S, S, S), cfg, N),
        pts, g, name="v4 bwd 1M")
    t_xla_fwd = scan_time(
        lambda p, c: fused.xla_fused_blend(c, p, cfg),
        pts, cells, name="xla blend 1M")

    # End-to-end PINN training step at 128^3 (previously impossible: the
    # XLA scatter gradient faulted; the v4 bricked bwd makes it trainable).
    import optax
    from cosinesampler_tpu.models import pinn
    pcfg = pinn.PINNConfig(dim=3, n_cells=N, cell_dim=C, cell_size=S,
                           kernel="cosine", pde="helmholtz", backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(0), pcfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = pinn.make_train_step(pcfg, optimizer, fused=True)

    def one_step(p, prm, st):
        prm, st, lval = step(prm, st, p)
        return lval + prm["b2"][0] * 1e-30
    t_train = scan_time(lambda p, prm, st: one_step(p, prm, st),
                        pts, params, opt_state, name="train step 128^3 1M")
    print(f"[large] summary: v4 fwd {t_v4_fwd*1e3:.1f} ms, "
          f"v4 bwd {t_v4_bwd*1e3:.1f} ms, xla fwd {t_xla_fwd*1e3:.1f} ms, "
          f"train {t_train*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
