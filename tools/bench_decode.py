"""Decode-throughput parity bench (VERDICT r4 Missing #3).

Reference published rates (vignettes/streampress.Rmd:83,371-400):
  ~9 MB/s compressed per thread (~21 MB/s decompressed), and parallel read
  scaling 3.04x @4T (on a 40-core HPC node; this host has 4 cores).

Measures spz_decode_mt on an scRNA-like synthetic matrix: MB/s/thread
(compressed and decompressed) and the thread-scaling curve.  Emits one JSON
line and writes DECODE_BENCH.json.
"""

from __future__ import annotations

import ctypes
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_scrna(m=12000, n=6000, mean_nnz_per_col=900, seed=0):
    """Negative-binomial count matrix with gene-frequency skew — the
    workload class the codec is tuned for."""
    import scipy.sparse as sp
    rs = np.random.RandomState(seed)
    gene_w = rs.dirichlet(np.full(m, 0.05))
    cols = []
    for j in range(n):
        nnz = max(1, int(rs.poisson(mean_nnz_per_col)))
        rows = np.unique(rs.choice(m, size=nnz, p=gene_w))
        vals = rs.negative_binomial(2, 0.3, size=rows.size).astype(np.float32)
        vals[vals == 0] = 1
        cols.append((rows, vals))
    indptr = np.zeros(n + 1, np.int64)
    for j, (r, _) in enumerate(cols):
        indptr[j + 1] = indptr[j] + r.size
    indices = np.concatenate([r for r, _ in cols]).astype(np.int32)
    data = np.concatenate([v for _, v in cols])
    return sp.csc_matrix((data, indices, indptr), shape=(m, n))


def main():
    from rcppml_tpu.io import spz

    A = synth_scrna()
    raw_csc_bytes = A.data.nbytes + A.indices.nbytes + A.indptr.nbytes
    blob = spz.compress_to_spz_bytes(A, with_transpose=False)
    comp_mb = len(blob) / 1e6
    decomp_mb = raw_csc_bytes / 1e6

    lib = spz._load_lib()
    info = spz.spz_info_bytes(blob)
    m, n, nnz = info["m"], info["n"], info["nnz"]
    p = np.zeros(n + 1, dtype=np.int64)
    i = np.zeros(nnz, dtype=np.int32)
    x = np.zeros(nnz, dtype=np.float32)
    buf = spz._as_buf(blob)

    def decode(threads):
        rc = lib.spz_decode_mt(
            buf, len(blob), 0,
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            threads)
        assert rc == 0, spz._err(lib)

    results = {}
    for threads in (1, 2, 4):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            decode(threads)
            best = min(best, time.perf_counter() - t0)
        results[threads] = best

    t1 = results[1]
    out = {
        "matrix": f"{m}x{n} nnz={nnz}",
        "compressed_mb": round(comp_mb, 1),
        "decompressed_mb_cscf32": round(decomp_mb, 1),
        "ratio": round(decomp_mb / comp_mb, 2),
        "decode_s": {str(k): round(v, 3) for k, v in results.items()},
        "mb_per_s_per_thread_compressed": round(comp_mb / t1, 1),
        "mb_per_s_per_thread_decompressed": round(decomp_mb / t1, 1),
        "scaling": {str(k): round(t1 / v, 2) for k, v in results.items()},
        "reference_published": {
            "mb_per_s_per_thread_compressed": 9,
            "mb_per_s_per_thread_decompressed": 21,
            "scaling_4t": 3.04,
            "source": "streampress.Rmd:83,371-400",
        },
        "vs_reference_per_thread": round((comp_mb / t1) / 9.0, 2),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "DECODE_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
