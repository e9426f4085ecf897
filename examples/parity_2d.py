"""Reference parity demo: the max-error table of test/test_2d.py, in JAX.

Replays the reference's 2D acceptance scenario (96 cells x 4ch x 16x16,
100k points, cosine+multicell, tiny MLP, Allen-Cahn residual) comparing the
custom-VJP sampler chain against the natively-differentiated XLA oracle for
every derivative the reference prints (test_2d.py:210-219), then asserts
dloss/dcells parity (test_2d.py:244).

Runs on CPU or TPU:  python examples/parity_2d.py [--points 2000]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--cells", type=int, default=96)
    args = ap.parse_args()

    rng = np.random.RandomState(51)
    n_cell, cell_dim, size = args.cells, 4, 16
    q = args.points
    cells = jnp.asarray(rng.rand(n_cell, cell_dim, size, size), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 2)), jnp.float32)
    w1 = jnp.asarray(rng.randn(cell_dim, 16) * 0.5, jnp.float32)
    w2 = jnp.asarray(rng.randn(16, 1) * 0.5, jnp.float32)
    cfg = SamplerConfig(dim=2, kernel="cosine", padding_mode="zeros",
                        multicell=True)

    def mlp(feats):
        return (jnp.tanh(feats @ w1) @ w2)[..., 0]

    def u_fn(sampler):
        def u(cells, p):
            grid = p.reshape(1, 1, q, 2)
            out = sampler(cells, grid).reshape(n_cell, cell_dim, q).sum(0)
            return mlp(out.T)
        return u

    chain = u_fn(lambda c, g: sample(c, g, cfg))
    oracle = u_fn(lambda c, g: generic.blend(c, g, cfg, (0, 0)))

    def derivs(u):
        val = u(cells, pts)
        u_c = jax.grad(lambda c: u(c, pts).sum())(cells)
        g1 = lambda ax: jax.grad(lambda p: u(cells, p).sum())(pts)[:, ax]
        u_x, u_y = g1(0), g1(1)
        g2 = lambda ax: jax.grad(
            lambda p: jax.grad(lambda pp: u(cells, pp).sum())(p)[:, ax].sum()
        )(pts)[:, ax]
        u_xx, u_yy = g2(0), g2(1)
        gc = lambda f: jax.grad(lambda c: f(c).sum())(cells)
        u_x_c = gc(lambda c: jax.grad(lambda p: u(c, p).sum())(pts)[:, 0])
        u_y_c = gc(lambda c: jax.grad(lambda p: u(c, p).sum())(pts)[:, 1])

        def uxx_of(c, ax):
            return jax.grad(lambda p: jax.grad(
                lambda pp: u(c, pp).sum())(p)[:, ax].sum())(pts)[:, ax]

        u_xx_c = gc(lambda c: uxx_of(c, 0))
        u_yy_c = gc(lambda c: uxx_of(c, 1))

        def loss(c):
            uv = u(c, pts)
            f = 2 * g1y(c) + 5 * uv**3 - 5 * uv - 1e-4 * uxx_of(c, 0)
            return jnp.mean(f**2)

        def g1y(c):
            return jax.grad(lambda p: u(c, p).sum())(pts)[:, 1]

        dloss = jax.grad(loss)(cells)
        return dict(val=val, u_cell=u_c, u_x=u_x, u_y=u_y, u_xx=u_xx,
                    u_yy=u_yy, u_x_cell=u_x_c, u_y_cell=u_y_c,
                    u_xx_cell=u_xx_c, u_yy_cell=u_yy_c, dloss=dloss)

    a = derivs(chain)
    b = derivs(oracle)
    for k in a:
        err = float(jnp.abs(a[k] - b[k]).max())
        print(f"{k:>10s} == oracle, max_error: {err:.3e}")
    np.testing.assert_allclose(np.asarray(a["dloss"]), np.asarray(b["dloss"]),
                               rtol=1e-4, atol=1e-5)
    print("dloss parity at rtol=1e-4: OK (the reference's acceptance bar, "
          "test_2d.py:244)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
