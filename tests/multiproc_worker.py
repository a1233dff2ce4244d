"""Worker for the 2-process jax.distributed test (run via subprocess).

Each process joins the cluster, contributes its LOCAL column slice of the
data through ``multihost.shard_host_data``, runs the sharded fit, and
process 0 writes the result for the parent test to compare — the real
multi-host seam (no host ever holds the full sharded state).

Usage: python multiproc_worker.py <process_id> <port> <out.npz>
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import rcppml_tpu as rt  # noqa: E402
from rcppml_tpu.parallel import multihost  # noqa: E402

info = multihost.initialize()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

# deterministic data, columns split across the two processes
rs = np.random.RandomState(0)
A = np.abs(rs.rand(24, 32)).astype(np.float32)
local = A[:, pid * 16:(pid + 1) * 16]

mesh = Mesh(np.array(jax.devices()).reshape(1, 4), ("rows", "cols"))
A_global = multihost.shard_host_data(local, mesh, axis="cols")
assert A_global.shape == (24, 32)
assert not A_global.is_fully_addressable     # genuinely distributed

cfg = rt.build_config(4, seed=42, maxit=20, tol=0.0, sort_model=False)
from rcppml_tpu.parallel.mesh import fit_sharded  # noqa: E402

res = fit_sharded(A_global, cfg, mesh)

if pid == 0:
    np.savez(out, W=res.W, H=res.H, d=res.d,
             train_loss=res.train_loss, iterations=res.iterations)
print(f"proc {pid} done", flush=True)
