"""GSPMD scaling trend on the virtual CPU mesh (VERDICT r3 item 6).

No pod is reachable from this environment, so true multi-host efficiency
(BASELINE.md >=80% target) cannot be measured.  What CAN be measured —
and what catches GSPMD layout regressions — is the *partitioning
overhead curve*: the same fixed-size fit, jitted over 1/2/4/8-device
meshes of virtual CPU devices (all backed by the same physical cores, so
compute time is common-mode and the DELTA is partitioning + collective
+ layout cost), plus the same fit split across 2 OS processes via
jax.distributed (adds real cross-process RPC to every collective — the
DCN-shaped term).

Interpretation contract (documented for gate 6):
- overhead_ratio(D) = t_iter(D devices) / t_iter(1 device) on the SAME
  total problem.  A healthy GSPMD layout keeps this near 1 with a mild
  slope (k x k Gram psums + halo-free column shards); a broken sharding
  (e.g. an accidental all-gather of A) jumps it by >2x.
- proc2_penalty = t_iter(2 procs x 4 dev) / t_iter(1 proc x 8 dev):
  every psum now crosses a process boundary — the upper-bound shape of
  the DCN term at constant device count.

Pod-run recipe (for real hardware, not runnable here): start one process
per host with the same program; call
``rcppml_tpu.parallel.multihost.initialize(coordinator, num_processes,
process_id)``; build the (rows, cols) mesh over ``jax.devices()``; feed
each host's column slice through ``multihost.shard_host_data``; then
``fit_sharded`` exactly as tests/multiproc_worker.py does — the k x k
Gram all-reduces ride ICI within a slice and DCN across slices, and the
curve below bounds the constant.

Usage: python tools/weak_scaling.py [--m 2048] [--n 4096] [--k 16]
Emits one JSON line; bench.py embeds it in its extras.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = "_WEAK_SCALING_CHILD" in os.environ


def _child_main() -> None:
    """Time one mesh configuration in a fresh process (clean XLA device
    count; the flag must be set before jax imports)."""
    spec = json.loads(os.environ["_WEAK_SCALING_CHILD"])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               f"{spec['local_devices']}")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if spec.get("coordinator"):
        jax.distributed.initialize(coordinator_address=spec["coordinator"],
                                   num_processes=spec["num_processes"],
                                   process_id=spec["process_id"])
    import numpy as np
    from jax.sharding import Mesh

    import rcppml_tpu as rt
    from rcppml_tpu.parallel import multihost
    from rcppml_tpu.parallel.mesh import fit_sharded

    m, n, k = spec["m"], spec["n"], spec["k"]
    rs = np.random.RandomState(0)
    total_devs = spec["local_devices"] * spec.get("num_processes", 1)
    mesh = Mesh(np.array(jax.devices()).reshape(1, total_devs),
                ("rows", "cols"))

    if spec.get("coordinator"):
        cols_per_proc = n // spec["num_processes"]
        j0 = spec["process_id"] * cols_per_proc
        local = np.abs(rs.rand(m, n))[:, j0:j0 + cols_per_proc] \
            .astype(np.float32)
        A = multihost.shard_host_data(local, mesh, axis="cols")
    else:
        A = np.abs(rs.rand(m, n)).astype(np.float32)

    def run(maxit):
        cfg = rt.build_config(k, seed=42, maxit=maxit, tol=0.0,
                              sort_model=False)
        fit_sharded(A, cfg, mesh)        # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fit_sharded(A, cfg, mesh)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(2), run(22)
    per_iter_ms = (t_hi - t_lo) / 20.0 * 1e3
    if spec.get("process_id", 0) == 0:
        with open(spec["out"], "w") as f:
            json.dump({"per_iter_ms": per_iter_ms}, f)
    print(f"child done pid={spec.get('process_id', 0)}", flush=True)


def _run_single(devices: int, m: int, n: int, k: int, out: str) -> float:
    spec = {"local_devices": devices, "m": m, "n": n, "k": k, "out": out}
    env = dict(os.environ, _WEAK_SCALING_CHILD=json.dumps(spec))
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, capture_output=True, timeout=900)
    with open(out) as f:
        return float(json.load(f)["per_iter_ms"])


def _run_two_proc(devs_per_proc: int, m: int, n: int, k: int,
                  out: str, port: int) -> float:
    procs = []
    for pid in range(2):
        spec = {"local_devices": devs_per_proc, "m": m, "n": n, "k": k,
                "out": out, "coordinator": f"127.0.0.1:{port}",
                "num_processes": 2, "process_id": pid}
        env = dict(os.environ, _WEAK_SCALING_CHILD=json.dumps(spec))
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    try:
        for p in procs:
            if p.wait(timeout=900) != 0:
                raise RuntimeError("weak-scaling worker failed")
    finally:
        # a failed/timed-out worker must not orphan its sibling (it would
        # block on the coordinator port indefinitely — round-4 review)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    with open(out) as f:
        return float(json.load(f)["per_iter_ms"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--port", type=int, default=12631)
    args = ap.parse_args()

    import tempfile
    curve = {}
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "t.json")
        for d in (1, 2, 4, 8):
            curve[d] = _run_single(d, args.m, args.n, args.k, out)
        t2p = _run_two_proc(4, args.m, args.n, args.k, out, args.port)

    result = {
        "workload": f"{args.m}x{args.n} k={args.k} MSE ALS, (1,D) col mesh",
        "per_iter_ms": {str(d): round(t, 2) for d, t in curve.items()},
        "overhead_ratio": {str(d): round(curve[d] / curve[1], 3)
                           for d in curve},
        "two_proc_4x2_per_iter_ms": round(t2p, 2),
        "proc2_penalty_vs_8dev": round(t2p / curve[8], 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if _CHILD:
        _child_main()
    else:
        raise SystemExit(main())
