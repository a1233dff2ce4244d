"""Multi-host (multi-process) execution setup.

The reference has no distributed axis at all (SURVEY.md §2.10: OpenMP +
one GPU); this module is the pod-scale entry point for the TPU build.

One process per host, each seeing its local chips; `jax.distributed`
links them so `jax.devices()` returns the GLOBAL device list and every
jitted computation (including the whole ALS/CV/IRLS stack) runs SPMD
across hosts with GSPMD collectives riding ICI within a pod slice.

Typical pod usage (same script on every host):

    from rcppml_tpu.parallel import multihost, mesh
    multihost.initialize()                    # TPU pod: auto-detected env
    m = mesh.default_mesh()                   # spans ALL hosts' chips
    model = rt.nmf(A, k, mesh=m)              # same API as single host

On GCE TPU pods `jax.distributed.initialize()` discovers the coordinator
and process count from the TPU metadata; elsewhere pass them explicitly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Join the multi-process JAX runtime (idempotent).

    With no arguments, relies on the TPU pod auto-detection; on CPU/GPU
    clusters pass ``coordinator_address`` ("host:port"),
    ``num_processes``, and this host's ``process_id``.

    Returns a summary dict: process_index, process_count, local and
    global device counts.
    """
    global _initialized
    if not _initialized and (coordinator_address is not None
                             or num_processes is not None
                             or jax.process_count() == 1):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
            _initialized = True
        except (RuntimeError, ValueError):
            # single-process fallback (already initialized, or no cluster
            # env): everything below still reports correctly
            pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shard_host_data(A: np.ndarray, mesh, *, axis: str = "cols"):
    """Place a host-local shard of A into the global sharded array.

    Every process passes ITS slice of A (split along ``axis`` by
    process_index); the result is one global jax.Array laid out with the
    canonical (rows, cols) sharding — the multi-host analog of
    ``shard_arrays``.  Uses ``jax.make_array_from_process_local_data``,
    so no host ever materializes the full matrix.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("rows", "cols"))
    return jax.make_array_from_process_local_data(sharding, A)
