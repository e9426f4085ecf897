"""Native point generator: build, determinism, native==numpy stream parity."""

import numpy as np
import pytest

from cosinesampler_tpu.utils.pointgen import PointGenerator, _build_library


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
