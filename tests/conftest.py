"""Test harness: CPU backend with 8 virtual devices (sharding tests) and x64.

The reference has no test harness at all (two CUDA-only scripts,
test/test_2d.py, test/test_3d.py).  Here the whole matrix runs hermetically
on CPU: XLA paths directly, Pallas paths in interpret mode, sharding on a
virtual 8-device mesh.

NOTE: the environment force-registers a remote TPU PJRT plugin ("axon")
that overrides the JAX_PLATFORMS env var; jax.config.update after import is
the only reliable way to pin tests to CPU.  Tests must never touch the TPU
— it is a single-client resource shared with benchmarks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_count():
    """Free compiled executables between test modules.

    Full-suite runs (~350 tests, one process) have segfaulted inside
    XLA:CPU's backend_compile_and_load after several hundred cumulative
    compilations — at different tests on different runs, each of which
    passes in isolation.  Dropping the executable caches at module
    boundaries bounds the live-program count; the recompiles cost far
    less than a crashed suite."""
    yield
    import jax
    jax.clear_caches()
