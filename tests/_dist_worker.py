"""Worker process for the multi-process jax.distributed test.

Launched (2x) by tests/test_distributed.py.  Each process owns 4 virtual
CPU devices; jax.distributed.initialize joins them into one 8-device
cluster, and the sharded PINN train step runs over the global mesh with
the cell-grad reduction crossing the process boundary.

Usage: python _dist_worker.py <coordinator> <process_id> <num_processes> <outfile>
"""

import json
import os
import sys
import traceback

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coord, pid, nproc, outfile = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    from cosinesampler_tpu.parallel import distributed

    ndev = distributed.initialize(coord, nproc, pid)
    assert ndev == 8, f"expected 8 global devices, got {ndev}"
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    import optax

    from cosinesampler_tpu.models import pinn
    from cosinesampler_tpu.parallel.sharding import make_mesh, shard_pinn_step

    cfg = pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                          hidden=8, backend="xla")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    pts = np.random.RandomState(0).uniform(-0.9, 0.9, (64, 2))

    step = pinn.make_train_step(cfg, optimizer)
    mesh = make_mesh()            # spans both processes' devices
    assert len(mesh.devices.ravel()) == 8
    p2, _, l2 = shard_pinn_step(step, mesh)(params, opt_state, jnp.asarray(pts))

    if pid == 0:
        # outputs are fully replicated: every process addresses a full copy
        leaves = jax.tree_util.tree_leaves(p2)
        result = {
            "loss": float(l2),
            "param_sum": float(sum(float(jnp.sum(x)) for x in leaves)),
            "cells_00": float(jnp.ravel(p2["cells"])[0]),
        }
        with open(outfile, "w") as f:
            json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
