"""Multi-host initialization for pod-scale sweeps.

The reference has no distributed story at all (SURVEY.md section 2.3).  The
TPU-native equivalent needs no custom transport: processes join via
``jax.distributed``, the mesh spans all chips (ICI within a slice, DCN
across slices), and the sharding layer (sharding.py) is topology-agnostic —
query points shard over the full mesh, the cell-grad psum rides ICI first.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Join the jax.distributed cluster (no-op for single-process runs).

    Returns the global device count.  On Cloud TPU the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.device_count()
