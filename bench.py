"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): ALS iters/sec at k=50 on movielens, single chip.
``vs_baseline`` is our throughput over the estimated 56-thread Xeon Gold
6238R baseline.  No movielens-k=50 CPU time is published; the estimate
scales the published pbmc3k k=20 CPU result (2.18 s / 20 iters,
vignettes/gpu-acceleration.Rmd:105-133) by per-iteration work
(nnz*k + k^2*(m+n)): pbmc3k 2.24M nnz * k20 vs movielens 75K nnz * k50
=> ~9.17 iters/s * 9.0 ~= 83 iters/s.  Conservatively rounded UP to 100
iters/s so vs_baseline understates our speedup.
"""

import json
import time

import numpy as np

CPU_BASELINE_ITERS_PER_SEC = 100.0   # estimated 56-thread CPU (see docstring)


def main():
    import rcppml_tpu as rt
    from rcppml_tpu import datasets

    A = datasets.movielens()          # 3,867 x 610 sparse ratings
    k = 50
    maxit_timed = 50

    # warm-up / compile (same shapes, 2 iters)
    rt.nmf(A, k, seed=1, maxit=2, tol=0.0, solver="cd", sort_model=False)

    t0 = time.perf_counter()
    res = rt.nmf(A, k, seed=1, maxit=maxit_timed, tol=0.0, solver="cd",
                 sort_model=False)
    elapsed = time.perf_counter() - t0
    iters_per_sec = res.iterations / elapsed

    print(json.dumps({
        "metric": "movielens_k50_als_iters_per_sec",
        "value": round(iters_per_sec, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / CPU_BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
