"""Independent-oracle parity: torch.grid_sample and a torch autograd oracle.

Two independent ground truths, both running on CPU:

1. ``torch.nn.functional.grid_sample`` — the linear / multicell=False mode
   must match it bit-for-bit-ish (the reference claims this equivalence,
   README.md:26-27).

2. A freshly written torch implementation of the *documented multicell
   semantics* (unnormalize to size-2 + per-cell offset, kernel-weighted
   4/8-corner blend — the math of test/grid_sampler.py:33-87), whose
   derivatives come from torch autograd.  This mirrors the reference's own
   oracle pattern (test/test_2d.py compares CUDA vs pure-torch autograd)
   with an implementation that shares no code with ours.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.sampler import sample

torch.set_default_dtype(torch.float64)


def _torch_multicell_2d(cells, pts, kernel="cosine"):
    """Torch oracle for 2D multicell sampling at query points (Q, 2).

    cells: (N, C, H, W) tensor; returns (N, C, Q).  Differentiable by torch
    autograd to any order.
    """
    n, c, h, w_sz = cells.shape
    q = pts.shape[0]
    if kernel == "cosine":
        wfun = lambda v: 0.5 * (1 - torch.cos(torch.pi * v))
    elif kernel == "smoothstep":
        wfun = lambda v: v * v * (3 - 2 * v)
    else:
        wfun = lambda v: v
    off = torch.linspace(0, 1 - 1.0 / n, n, dtype=cells.dtype).view(n, 1)
    gx = (pts[:, 0].view(1, q) + 1) / 2 * (w_sz - 2) + off
    gy = (pts[:, 1].view(1, q) + 1) / 2 * (h - 2) + off
    fx = torch.floor(gx).detach()
    fy = torch.floor(gy).detach()
    tx = wfun(gx - fx)
    ty = wfun(gy - fy)
    out = torch.zeros(n, c, q, dtype=cells.dtype)
    flat = cells.reshape(n, c, h * w_sz)
    for px, py in itertools.product((0, 1), repeat=2):
        cx = (fx + px).long()
        cy = (fy + py).long()
        ok = ((cx >= 0) & (cx < w_sz) & (cy >= 0) & (cy < h)).double()
        idx = (cy.clamp(0, h - 1) * w_sz + cx.clamp(0, w_sz - 1))
        vals = torch.gather(flat, 2, idx.view(n, 1, q).expand(n, c, q))
        wx = tx if px else 1 - tx
        wy = ty if py else 1 - ty
        out = out + vals * (wx * wy * ok).view(n, 1, q)
    return out


def _jax_sample_2d(cells_np, pts_np, cfg):
    cells = jnp.asarray(cells_np)
    n = cells.shape[0]
    q = pts_np.shape[0]
    grid = jnp.broadcast_to(jnp.asarray(pts_np)[None, None], (n, 1, q, 2))
    return sample(cells, grid, cfg).reshape(n, -1, q)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_linear_no_multicell_matches_torch_grid_sample(padding_mode,
                                                       align_corners):
    rng = np.random.RandomState(0)
    n, c, h, w_sz, q = 2, 3, 9, 7, 64
    cells = rng.rand(n, c, h, w_sz)
    pts = rng.uniform(-1.6, 1.6, size=(n, 5, q, 2))  # includes OOB queries

    want = F.grid_sample(
        torch.tensor(cells), torch.tensor(pts), mode="bilinear",
        padding_mode=padding_mode if padding_mode != "zeros" else "zeros",
        align_corners=align_corners,
    ).numpy()

    cfg = SamplerConfig(dim=2, kernel="linear", padding_mode=padding_mode,
                        align_corners=align_corners, multicell=False,
                        backend="xla")
    got = sample(jnp.asarray(cells), jnp.asarray(pts), cfg)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_linear_no_multicell_3d_matches_torch_grid_sample(padding_mode,
                                                          align_corners):
    rng = np.random.RandomState(1)
    n, c, d, h, w_sz = 2, 2, 5, 6, 7
    pts = rng.uniform(-1.4, 1.4, size=(n, 3, 4, 8, 3))
    cells = rng.rand(n, c, d, h, w_sz)

    want = F.grid_sample(
        torch.tensor(cells), torch.tensor(pts), mode="bilinear",
        padding_mode=padding_mode if padding_mode != "zeros" else "zeros",
        align_corners=align_corners,
    ).numpy()

    cfg = SamplerConfig(dim=3, kernel="linear", padding_mode=padding_mode,
                        align_corners=align_corners, multicell=False,
                        backend="xla")
    got = sample(jnp.asarray(cells), jnp.asarray(pts), cfg)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kernel", ["cosine", "smoothstep", "linear"])
def test_multicell_values_and_derivatives_match_torch_autograd(kernel):
    """Values, u_x, u_xx, u_x_cell, u_xx_cell vs the independent torch oracle
    — the reference's full parity list (test_2d.py:210-219)."""
    rng = np.random.RandomState(5)
    n, c, h, w_sz, q = 4, 2, 8, 8, 32
    cells_np = rng.rand(n, c, h, w_sz)
    pts_np = rng.uniform(-0.9, 0.9, size=(q, 2))
    wproj = rng.rand(c)

    # --- torch side -------------------------------------------------------
    tc = torch.tensor(cells_np, requires_grad=True)
    tp = torch.tensor(pts_np, requires_grad=True)
    tw = torch.tensor(wproj)

    def torch_u(cells, pts):
        out = _torch_multicell_2d(cells, pts, kernel)
        return torch.einsum("cq,c->q", out.sum(0), tw)

    tu = torch_u(tc, tp)
    ones = torch.ones_like(tu)
    tux = torch.autograd.grad(tu, tp, ones, create_graph=True)[0][:, 0]
    tuxx = torch.autograd.grad(tux, tp, torch.ones_like(tux),
                               create_graph=True)[0][:, 0]
    tux_cell = torch.autograd.grad(tux.sum(), tc, create_graph=True,
                                   retain_graph=True)[0]
    tuxx_cell = torch.autograd.grad(tuxx.sum(), tc, retain_graph=True)[0]

    # --- jax side ---------------------------------------------------------
    cfg = SamplerConfig(dim=2, kernel=kernel, padding_mode="zeros",
                        multicell=True, backend="xla")
    wj = jnp.asarray(wproj)

    def jax_u(cells, pts):
        out = _jax_sample_2d(cells, pts, cfg)
        return jnp.einsum("ncq,c->q", out, wj)

    cells_j = jnp.asarray(cells_np)
    pts_j = jnp.asarray(pts_np)
    ju = jax_u(cells_j, pts_j)

    def ux_fn(cells, pts):
        return jax.grad(lambda p: jax_u(cells, p).sum())(pts)[:, 0]

    def uxx_fn(cells, pts):
        return jax.grad(lambda p: ux_fn(cells, p).sum())(pts)[:, 0]

    jux = ux_fn(cells_j, pts_j)
    juxx = uxx_fn(cells_j, pts_j)
    jux_cell = jax.grad(lambda cl: ux_fn(cl, pts_j).sum())(cells_j)
    juxx_cell = jax.grad(lambda cl: uxx_fn(cl, pts_j).sum())(cells_j)

    np.testing.assert_allclose(ju, tu.detach().numpy(), rtol=1e-11)
    np.testing.assert_allclose(jux, tux.detach().numpy(), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(juxx, tuxx.detach().numpy(), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(jux_cell, tux_cell.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(juxx_cell, tuxx_cell.detach().numpy(),
                               rtol=1e-9, atol=1e-11)
