"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): ALS iters/sec at k=50 on movielens, single chip.
Measures steady-state device throughput: the data matrix is resident in
device HBM (as in any production loop); the timed call covers the full
jitted ALS while-loop (H-update, W-update, loss, convergence logic) plus
host-side init/result marshalling.

``vs_baseline`` divides by the estimated 56-thread Xeon Gold 6238R
baseline.  No movielens-k=50 CPU time is published; the estimate scales
the published pbmc3k k=20 CPU result (2.18 s / 20 iters,
vignettes/gpu-acceleration.Rmd:105-133) by per-iteration work
(nnz*k + k^2(m+n)): ~9.17 iters/s * ~9 => ~83 iters/s, rounded UP to 100
so vs_baseline understates our speedup.
"""

import json
import time

import numpy as np

CPU_BASELINE_ITERS_PER_SEC = 100.0   # estimated 56-thread CPU (see docstring)


def main():
    import jax.numpy as jnp

    import rcppml_tpu as rt
    from rcppml_tpu import datasets
    from rcppml_tpu.models.nmf import nmf_fit

    A = np.asarray(datasets.movielens().todense(), dtype=np.float32)
    A_dev = jnp.asarray(A)           # resident in HBM, like production
    k = 50
    maxit = 300

    cfg = rt.build_config(k, seed=1, maxit=maxit, tol=0.0, sort_model=False)

    nmf_fit(A, cfg, device_A=A_dev)          # compile + warm
    # best-of-3: steady-state throughput, robust to transient link noise
    # (the remote-tunnel dispatch overhead fluctuates several-fold while
    # device compute is stable — see BENCH_NOTES.md)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = nmf_fit(A, cfg, device_A=A_dev)
        best = min(best, time.perf_counter() - t0)
    iters_per_sec = res.iterations / best

    print(json.dumps({
        "metric": "movielens_k50_als_iters_per_sec",
        "value": round(iters_per_sec, 1),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / CPU_BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
