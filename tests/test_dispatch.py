"""Backend dispatcher routing: which Pallas generation serves which shape.

The fused kernel generations (fused2d / fused3s / fused3b / fused3d /
fused) are individually parity-tested; these tests pin the DISPATCH —
`_fused_blend`/`_fused_bwd` in ops/pallas/__init__.py picking the intended
implementation per (volume size, query count, config) — by spying on the
`supports()` gates and the chosen wrapper.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import (fused2d, fused2w, fused3b, fused3d,
                                          fused3s, fused3w)


def _route_blend(monkeypatch, cells_shape, q, cfg):
    """Run the dispatcher with every kernel stubbed; return who was picked."""
    picked = []

    def spy(module, name, tag):
        orig = getattr(module, name)

        def wrapper(*a, **k):
            picked.append(tag)
            return "STUB"
        monkeypatch.setattr(module, name, wrapper)
        return orig

    spy(fused2d, "pallas_fused2_blend", "2d")
    spy(fused2w, "pallas_fused2w_blend", "2w")
    spy(fused3w, "pallas_fused3w_blend", "3w")
    spy(fused3s, "pallas_fused3s_blend", "3s")
    spy(fused3b, "pallas_fused3b_blend", "3b")
    spy(fused3d, "pallas_fused3_blend", "3d")
    spy(pb, "pallas_fused_blend", "v1")
    cells = jnp.zeros(cells_shape, jnp.float32)
    pts = jnp.zeros((q, cfg.dim), jnp.float32)
    out = pb._fused_blend(cells, pts, cfg)
    if out is None:
        return "xla"
    assert picked, "a kernel wrapper should have been invoked"
    return picked[0]


CFG3 = SamplerConfig(dim=3, backend="pallas")


def test_small_3d_volume_large_q_routes_to_v5(monkeypatch):
    # reference 3D workload: windowed kernels (v5)
    assert _route_blend(monkeypatch, (50, 4, 16, 16, 16), 100_000,
                        CFG3) == "3w"


def test_mid_3d_volume_routes_to_v5(monkeypatch):
    # 64^3 exceeds the VMEM-resident budget but fits the window array
    assert _route_blend(monkeypatch, (16, 4, 64, 64, 64), 1_000_000,
                        CFG3) == "3w"


def test_small_3d_volume_small_q_routes_to_v2(monkeypatch):
    # tiny clouds skip the z-binning (bin padding dominates)
    assert _route_blend(monkeypatch, (50, 4, 16, 16, 16), 120, CFG3) == "3d"


def test_mid_3d_volume_small_q_routes_to_v3(monkeypatch):
    # the fused3s regime: the volume exceeds nothing (32^3 x 2 x 2 fits the
    # VMEM residency budget) but the query cloud is too small for v5's
    # per-bin minimum (_MIN_Q_PER_BIN * nbins ~ 9k at 32^3), so the
    # z-slab-binned VMEM-resident generation takes the route
    assert _route_blend(monkeypatch, (2, 2, 32, 32, 32), 2048, CFG3) == "3s"


def test_large_3d_volume_large_q_routes_to_v4(monkeypatch):
    # 128^3 sweep: HBM-resident volume, 1M queries
    assert _route_blend(monkeypatch, (16, 4, 128, 128, 128), 1_000_000,
                        CFG3) == "3b"


def test_large_3d_volume_small_q_falls_back_to_xla(monkeypatch):
    assert _route_blend(monkeypatch, (16, 4, 128, 128, 128), 5_000,
                        CFG3) == "xla"


def test_large_3d_volume_unaligned_w_routes_to_v4(monkeypatch):
    # W=96 not 128-aligned: v4 lane-pads the volume internally
    assert _route_blend(monkeypatch, (16, 4, 128, 128, 96), 1_000_000,
                        CFG3) == "3b"


def test_border_padding_routes_to_windowed(monkeypatch):
    # border is supported by the shared-support generations since round 2
    cfg = SamplerConfig(dim=3, padding_mode="border", backend="pallas")
    assert _route_blend(monkeypatch, (50, 4, 16, 16, 16), 100_000,
                        cfg) == "3w"


def test_reflection_padding_routes_to_v5(monkeypatch):
    # reflection runs through the windowed kernels via the widened 4-shift
    # patch (prep.n_shifts == 4); small clouds still fall back to v2
    cfg = SamplerConfig(dim=3, padding_mode="reflection", backend="pallas")
    assert _route_blend(monkeypatch, (50, 4, 16, 16, 16), 100_000,
                        cfg) == "3w"
    assert _route_blend(monkeypatch, (50, 4, 16, 16, 16), 200, cfg) == "3d"


def test_2d_large_q_routes_to_v5_2d(monkeypatch):
    # reference 2D workload: windowed kernels (v5, K = 128 not 256)
    cfg = SamplerConfig(dim=2, backend="pallas")
    assert _route_blend(monkeypatch, (96, 4, 16, 16), 100_000, cfg) == "2w"


def test_2d_small_q_routes_to_v2_2d(monkeypatch):
    # tiny clouds skip the y-binning (bin padding dominates)
    cfg = SamplerConfig(dim=2, backend="pallas")
    assert _route_blend(monkeypatch, (96, 4, 16, 16), 200, cfg) == "2d"


def test_2d_reflection_routes_to_v5_2d(monkeypatch):
    cfg = SamplerConfig(dim=2, padding_mode="reflection", backend="pallas")
    assert _route_blend(monkeypatch, (96, 4, 16, 16), 100_000, cfg) == "2w"
    assert _route_blend(monkeypatch, (96, 4, 16, 16), 200, cfg) == "2d"


@pytest.mark.parametrize(
    "shape,q,want",
    [((50, 4, 16, 16, 16), 100_000, "3w"),
     ((16, 4, 128, 128, 128), 1_000_000, "3b"),
     ((50, 4, 16, 16, 16), 120, "3d")])
def test_bwd_dispatch_mirrors_blend(monkeypatch, shape, q, want):
    picked = []

    def spy(module, name, tag):
        def wrapper(*a, **k):
            picked.append(tag)
            return "STUB"
        monkeypatch.setattr(module, name, wrapper)

    spy(fused2d, "pallas_fused2_bwd", "2d")
    spy(fused2w, "pallas_fused2w_bwd", "2w")
    spy(fused3w, "pallas_fused3w_bwd", "3w")
    spy(fused3s, "pallas_fused3s_bwd", "3s")
    spy(fused3b, "pallas_fused3b_bwd", "3b")
    spy(fused3d, "pallas_fused3_bwd", "3d")
    spy(pb, "pallas_fused_bwd", "v1")
    n, c = shape[:2]
    g = jnp.zeros((1 + 2 * CFG3.dim, c, q), jnp.float32)
    pts = jnp.zeros((q, CFG3.dim), jnp.float32)
    pb._fused_bwd(g, pts, shape[2:], CFG3, n)
    assert picked and picked[0] == want


def test_2d_wide_grid_routes_to_v5_2d(monkeypatch):
    # large 2D grids fit the windowed kernels with an adaptively smaller
    # q_block (K = rows*Wp = 4096 at W=1024); previously they fell to XLA
    cfg = SamplerConfig(dim=2, backend="pallas")
    assert _route_blend(monkeypatch, (16, 4, 1024, 1024), 1_000_000,
                        cfg) == "2w"


def test_2d_wide_grid_big_ensemble_falls_back_to_xla(monkeypatch):
    # window scratch scales with N*C*K: no q_block candidate fits
    cfg = SamplerConfig(dim=2, backend="pallas")
    assert _route_blend(monkeypatch, (96, 4, 1024, 1024), 1_000_000,
                        cfg) == "xla"
