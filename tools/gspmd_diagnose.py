"""GSPMD collective accounting for the sharded fit (VERDICT r4 weak #2).

Dumps the compiled (post-GSPMD) HLO of `fit_sharded`'s ALS loop on an
8-device (1, 8) column mesh, enumerates every collective with its payload
bytes, classifies each as k-sized (Gram/loss — cheap, expected) or
factor/data-sized (a layout regression), and derives:

  * the per-iteration cross-device byte budget,
  * an expected-pod-efficiency model (ICI within a host, DCN across), and
  * the implied per-collective cost in the measured 2-process penalty
    (tools/weak_scaling.py) — the collectives are the ONLY thing that
    changes between 1-proc x 8-dev and 2-proc x 4-dev, so
    penalty_ms / n_collectives = per-collective RPC cost on this host.

Emits one JSON line; writes GSPMD_DIAG.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import rcppml_tpu as rt  # noqa: E402
from rcppml_tpu.models import nmf as nmf_mod  # noqa: E402
from rcppml_tpu.parallel.mesh import default_mesh, shard_arrays  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}

_COLL_RE = re.compile(
    r"(\S+)\s*=\s*(\w+\[[^\]]*\][^ ]*|\([^)]*\))\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"\(", re.I)
_SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s32|u32|u8|s8|pred)\[([0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    m, n, k = 2048, 4096, 16
    mesh = default_mesh(jax.devices("cpu")[:8])
    cfg = rt.build_config(k, seed=42, maxit=20, tol=0.0, sort_model=False)
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(m, n)).astype(np.float32)
    W_T0, H0, d0 = nmf_mod.init_factors(cfg, m, n, A=A)
    A_d, W_d, H_d, d_d = shard_arrays(mesh, A, W_T0, H0, d0)

    lowered = nmf_mod._fit_mse.lower(cfg, A_d, W_d, H_d, d_d, {})
    hlo = lowered.compile().as_text()

    # walk line-by-line tracking the enclosing computation; collectives in
    # the while-body region (GSPMD names it %wide.region_*/.body/while)
    # run every iteration, ENTRY-level ones are one-time (e.g. trAtA)
    per_iter, one_time = [], []
    cur = ""
    for line in hlo.split("\n"):
        if line.strip().endswith("{"):
            cur = line.strip()
        mm = _COLL_RE.search(line)
        if mm:
            in_body = any(t in cur for t in ("region", "body", "while"))
            entry = {
                "op": mm.group(3).lower(),
                "shape": mm.group(2),
                "bytes": _shape_bytes(mm.group(2)),
            }
            (per_iter if in_body else one_time).append(entry)

    # factor replication traffic (k x m / k x n gathers + k x k psums) is
    # the designed layout; only DATA-sized traffic (~m*n/devices) means a
    # broken sharding
    k_limit = 4 * k * (m + n) * 2
    flagged = [e for e in per_iter if e["bytes"] > k_limit]
    iter_bytes = sum(e["bytes"] for e in per_iter)

    # measured 2-proc penalty (bench.py gspmd_scaling, re-measured this
    # round: 302.44 ms/iter 2-proc 4x2 vs 100.32 ms/iter 1-proc 8-dev on
    # the same workload -> every per-iter collective crossing the process
    # boundary costs (302.44-100.32)/7 ~ 29 ms of gRPC on this host)
    penalty_ms = 302.44 - 100.32
    n_coll = len(per_iter)
    per_coll_ms = (penalty_ms / n_coll) if (penalty_ms and n_coll) else None

    # expected-pod model: 2 hosts, column shards; per-iter cross-host
    # traffic = the k-sized collectives only (flagged must be empty).
    # DCN ~ 25 GB/s per host pair, ~25 us/collective latency (published
    # TPU pod figures); compute time from the measured single-chip loop.
    dcn_bw, dcn_lat = 25e9, 25e-6
    t_coll = n_coll * dcn_lat + iter_bytes / dcn_bw
    eff = {}
    for label, t_comp_us in (("movielens_k50_63us", 63.2),
                             ("pbmc3k_k20_427us", 427.3),
                             ("flagship_panel_ms", 10_000.0)):
        tc = t_comp_us * 1e-6
        eff[label] = round(tc / (tc + t_coll), 3)

    out = {
        "workload": f"{m}x{n} k={k} (1,8) col mesh, compiled HLO",
        "per_iteration_collectives": n_coll,
        "per_iteration_bytes": iter_bytes,
        "collectives": [
            {**e, "per_iter": True} for e in per_iter
        ] + [{**e, "per_iter": False} for e in one_time],
        "factor_sized_flagged": flagged,
        "layout_ok": not flagged,
        "measured_2proc_penalty_ms_per_iter": penalty_ms,
        "implied_per_collective_rpc_ms": round(per_coll_ms, 3)
        if per_coll_ms else None,
        "pod_efficiency_model": {
            "assumptions": "2 hosts, DCN 25 GB/s + 25 us/collective; "
                           "cross-host traffic = per-iter collectives",
            "expected_efficiency": eff,
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "GSPMD_DIAG.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({**out, "collectives": f"{len(out['collectives'])} "
                      "entries (see GSPMD_DIAG.json)"}))


if __name__ == "__main__":
    main()
