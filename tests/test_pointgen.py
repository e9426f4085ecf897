"""Native point generator: build, determinism, native==numpy stream parity."""

import numpy as np
import pytest

from cosinesampler_tpu.utils.pointgen import (PointGenerator, _build_library,
                                              _philox2x32)


def _kat(c0, c1, key):
    ctr = np.array([np.uint64(c0) | (np.uint64(c1) << np.uint64(32))],
                   dtype=np.uint64)
    return [int(v) for v in _philox2x32(ctr, np.uint32(key))[0]]


def test_philox2x32_known_answer_vectors():
    """The generator is real Philox-2x32-10: it reproduces the Random123
    known-answer test vectors (kat_vectors, philox2x32 10 rounds).  The
    2x32 variant has a single multiplier (0xD256D193) by design — only
    4x32 uses a pair."""
    assert _kat(0x00000000, 0x00000000, 0x00000000) == [0xFF1DAE59, 0x6CD10DF2]
    assert _kat(0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF) == [0x2C3F628B, 0xAB4FD7AD]
    assert _kat(0x243F6A88, 0x85A308D3, 0x13198A2E) == [0xDD7CE038, 0xF62A4C12]


def test_philox_stream_uniformity():
    """Basic statistical checks on the uniform stream: moment match,
    chi-square over 64 bins, and per-bit balance of the raw words."""
    n = 1 << 16
    g = PointGenerator(n, 1, seed=123, lo=0.0, hi=1.0, force_numpy=True)
    u = g.batch(0).reshape(-1).astype(np.float64)
    assert abs(u.mean() - 0.5) < 4.0 / np.sqrt(12 * n)       # ~4 sigma
    assert abs(u.var() - 1.0 / 12.0) < 0.001
    counts = np.bincount((u * 64).astype(int), minlength=64)
    expect = n / 64.0
    chi2 = float(((counts - expect) ** 2 / expect).sum())    # df = 63
    assert chi2 < 120.0                                      # p ~ 1e-5 bound
    ctr = np.arange(n, dtype=np.uint64)
    bits = _philox2x32(ctr, np.uint32(9)).reshape(-1)
    for b in range(32):
        frac = float(((bits >> np.uint32(b)) & np.uint32(1)).mean())
        assert abs(frac - 0.5) < 0.01


def test_numpy_fallback_deterministic():
    g1 = PointGenerator(128, 2, seed=7, force_numpy=True)
    g2 = PointGenerator(128, 2, seed=7, force_numpy=True)
    np.testing.assert_array_equal(g1.batch(3), g2.batch(3))
    assert not np.array_equal(g1.batch(3), g1.batch(4))


def test_range_and_shape():
    g = PointGenerator(1000, 3, seed=1, lo=-1.0, hi=1.0, force_numpy=True)
    b = g.batch(0)
    assert b.shape == (1000, 3) and b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() < 1.0
    # roughly uniform
    assert abs(b.mean()) < 0.05


def test_native_builds_and_matches_numpy_stream():
    lib = _build_library()
    if lib is None:
        pytest.skip("no g++ available")
    gn = PointGenerator(64, 2, seed=42)
    assert gn.is_native
    gp = PointGenerator(64, 2, seed=42, force_numpy=True)
    for step in [0, 1, 5, 2]:  # includes out-of-order (resume) access
        np.testing.assert_array_equal(gn.batch(step), gp.batch(step),
                                      err_msg=f"step {step}")
    gn.close()


def test_native_sequential_throughput_smoke():
    lib = _build_library()
    if lib is None:
        pytest.skip("no g++ available")
    g = PointGenerator(4096, 2, seed=0)
    seen = [g.batch(i) for i in range(8)]
    ref = PointGenerator(4096, 2, seed=0, force_numpy=True)
    for i, b in enumerate(seen):
        np.testing.assert_array_equal(b, ref.batch(i))
    g.close()
