"""Randomized cross-implementation consistency sweep.

For random shapes/configs/orders: the Pallas kernels (interpret), the XLA
backend, and — for order 0 — a brute-force per-query NumPy evaluation must
agree.  Catches shape-edge bugs the fixed-size tests miss (odd query
counts, single cells, rectangular grids, C=1).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas.kernels import pallas_blend, pallas_splat


def _brute_force_2d(cells, grid, cfg):
    """Direct per-query NumPy evaluation of the documented semantics."""
    n, c, hh, ww = cells.shape
    gf = np.asarray(grid).reshape(grid.shape[0], -1, 2)
    q = gf.shape[1]
    offs = (np.linspace(0, 1 - 1 / n, n, dtype=np.float32)
            if cfg.multicell else np.zeros(n, np.float32))
    out = np.zeros((n, c, q), np.float32)
    cells_np = np.asarray(cells)

    def w(t):
        if cfg.kernel == "cosine":
            return 0.5 * (1 - np.cos(np.pi * t))
        if cfg.kernel == "smoothstep":
            return t * t * (3 - 2 * t)
        return t

    for ni in range(n):
        gxy = gf[0] if gf.shape[0] == 1 else gf[ni]
        for qi in range(q):
            acc = np.zeros(c, np.float32)
            coords = []
            for ax, size in ((0, ww), (1, hh)):
                eff = size - 1 if cfg.multicell else size
                x = (gxy[qi, ax] + 1) / 2 * (eff - 1) + offs[ni]
                coords.append(x)
            fx, fy = np.floor(coords[0]), np.floor(coords[1])
            tx, ty = coords[0] - fx, coords[1] - fy
            for py, px in itertools.product((0, 1), repeat=2):
                xi, yi = int(fx) + px, int(fy) + py
                if 0 <= xi < ww and 0 <= yi < hh:
                    wgt = ((w(tx) if px else 1 - w(tx))
                           * (w(ty) if py else 1 - w(ty)))
                    acc += wgt * cells_np[ni, :, yi, xi]
            out[ni, :, qi] = acc
    return out.reshape(n, c, *grid.shape[1:-1])


@pytest.mark.parametrize("seed", range(6))
def test_random_config_consistency(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 7))
    c = int(rng.randint(1, 5))
    hh = int(rng.choice([5, 8, 11, 16]))
    ww = int(rng.choice([5, 8, 13, 16]))
    q = int(rng.randint(3, 90))
    kernel = str(rng.choice(["cosine", "linear", "smoothstep"]))
    multicell = bool(rng.randint(2))
    shared = bool(rng.randint(2))

    cfg = SamplerConfig(dim=2, kernel=kernel, multicell=multicell,
                        backend="xla")
    cells = jnp.asarray(rng.rand(n, c, hh, ww), jnp.float32)
    ng = 1 if shared else n
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (ng, 1, q, 2)), jnp.float32)

    ref = _brute_force_2d(cells, grid, cfg)
    got_xla = generic.blend(cells, grid, cfg, (0, 0))
    np.testing.assert_allclose(got_xla, ref, rtol=2e-5, atol=2e-5,
                               err_msg=f"xla vs brute {seed}")

    got_pal = pallas_blend(cells, grid, cfg, (0, 0), q_block=64,
                           interpret=True)
    np.testing.assert_allclose(got_pal, ref, rtol=2e-5, atol=2e-5,
                               err_msg=f"pallas vs brute {seed}")

    # splat transpose property: <splat(g), cells> == <g, blend(cells)>
    g = jnp.asarray(rng.rand(*got_xla.shape), jnp.float32)
    sp = pallas_splat(g, grid, (hh, ww), cfg, (0, 0), q_block=64,
                      interpret=True)
    lhs = float((sp * cells).sum())
    rhs = float((g * got_xla).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=2e-4)
