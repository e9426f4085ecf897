"""Real multi-process jax.distributed: 2 CPU processes x 4 devices.

Exercises parallel/distributed.initialize end-to-end: two OS processes
join one cluster, build an 8-device global mesh, and run the sharded PINN
train step with the cell-gradient reduction crossing the process
boundary.  The result must match the single-process 8-virtual-device run
(the same workload as tests/test_sharding.py).
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cosinesampler_tpu.models import pinn

_WORKER = pathlib.Path(__file__).resolve().parent / "_dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    cfg = pinn.PINNConfig(dim=2, n_cells=4, cell_dim=2, cell_size=8,
                          hidden=8, backend="xla")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (64, 2)))
    step = jax.jit(pinn.make_train_step(cfg, optimizer))
    p1, _, l1 = step(params, opt_state, pts)
    leaves = jax.tree_util.tree_leaves(p1)
    return (float(l1),
            float(sum(float(jnp.sum(x)) for x in leaves)),
            float(jnp.ravel(p1["cells"])[0]))


def test_two_process_sharded_step_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    outfile = tmp_path / "result.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(_WORKER.parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), coord, str(pid), "2",
             str(outfile)],
            cwd=str(_WORKER.parents[1]), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed:\n{out}\n--- other worker ---\n"
            f"{outs[1 - pid]}")
    got = json.loads(outfile.read_text())

    want_loss, want_sum, want_c00 = _single_process_reference()
    np.testing.assert_allclose(got["loss"], want_loss, rtol=1e-10)
    np.testing.assert_allclose(got["param_sum"], want_sum, rtol=1e-9)
    np.testing.assert_allclose(got["cells_00"], want_c00, rtol=1e-9)
