"""Persistent XLA compilation cache for the benchmark/driver scripts.

Remote-TPU compiles through the axon tunnel cost 15s (small kernels) to
~2 min (the 3D fused training step) per new program.  JAX's persistent
compilation cache works through the tunnel (verified: a fused2d compile
drops 2.2s -> 0.8s across processes), so the operational scripts opt in.
The library itself never sets global config — only entry-point scripts
call this.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    import jax

    path = path or os.environ.get("COSINESAMPLER_CACHE_DIR", DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
