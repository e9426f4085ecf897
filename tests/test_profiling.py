"""Profiling/roofline helper math."""

import jax.numpy as jnp

from cosinesampler_tpu.utils.profiling import (roofline, sampler_bytes,
                                               time_fn)


def test_sampler_bytes():
    b = sampler_bytes(96, 4, (16, 16), 100_000, shared_queries=True)
    cells = 96 * 4 * 256 * 4
    coords = 100_000 * 2 * 4
    out = 96 * 4 * 100_000 * 4
    assert b == cells + coords + out


def test_roofline():
    r = roofline(seconds=1e-3, bytes_moved=819_000_000 // 10)
    assert abs(r["hbm_pct"] - 10.0) < 0.1


def test_time_fn_runs():
    f = lambda x: x * 2.0
    sec = time_fn(f, jnp.ones((128,)), iters=2, warmup=1)
    assert sec > 0


def test_time_fn_pytree_output_and_int_args():
    # first arg integer (skipped), second is the serialization leaf;
    # pytree output: the tick threads through the first leaf
    f = lambda n, x: {"y": x * n, "z": x + 1.0}
    sec = time_fn(f, jnp.int32(3), jnp.ones((8, 8)), iters=2, warmup=1)
    assert sec > 0


def test_time_fn_requires_float_arg():
    import pytest

    with pytest.raises(ValueError, match="floating-point"):
        time_fn(lambda n: n + 1, jnp.int32(1), iters=2)
