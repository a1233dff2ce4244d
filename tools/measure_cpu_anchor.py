"""Measured CPU anchor for gate 2 — replaces the FLOP-model extrapolation.

Method (VERDICT r4 "Missing #2"): the reference published CV NMF k=16 on its
pbmc subset at 4.04 s / 20 iters on a 56-thread Xeon Gold 6238R
(vignettes/gpu-acceleration.Rmd:105-133).  We cannot run that Xeon, but the
oracle (native/oracle.cpp — a faithful port of the reference CPU hot loop)
runs HERE.  So:

  1. run the oracle on the SAME published calibration workload on this host
     -> host_vs_xeon = t_host / 4.04  (captures cores, clocks, compiler,
     and the oracle's double vs the reference's fp32 — the ratio method
     cancels all of it, since the same factors apply to step 2);
  2. run the oracle on the GATE-2 workload (movielens k=50 CV, L1 on H,
     CD solver per the reference's auto rule nmf_thin.R:363-377) on this
     host -> t_ml_host per iter;
  3. estimated Xeon rate = t_ml_host / host_vs_xeon -> the anchor is now a
     measurement cross-scaled by a published measurement of the same code
     family on the same workload family.

Calibration fidelity notes:
  * the pbmc subset is rebuilt per the vignette recipe (500 cells, top-8000
    variable genes, log1p column normalization) from the bundled pbmc3k;
    nnz lands near the published ~412K.
  * the reference R entry runs NMFConfig<float>; the oracle runs double.
    Both calibration and target workloads share the penalty, so it cancels
    in the ratio.  (Direction check: if double hurts the larger-k workload
    more, the anchor comes out FASTER and the gate bar HARDER — safe.)

Emits one JSON line and writes CPU_ANCHOR.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import oracle  # noqa: E402

PUBLISHED_PBMC_CV_S = 4.04     # CV NMF k=16, 20 iters, 56T Xeon
PUBLISHED_PBMC_NMF_S = 2.18    # NMF k=20, 20 iters, 56T Xeon (2nd calib)
ITERS = 20


def pbmc_subset():
    """Vignette recipe (gpu-acceleration.Rmd:90-95): 500 cells, top-8000
    variable genes, log1p(1e4/libsize) normalization."""
    import scipy.sparse as sp
    from rcppml_tpu import datasets
    pb = sp.csc_matrix(datasets.pbmc3k())
    rs = np.random.RandomState(42)
    cols = rs.choice(pb.shape[1], 500, replace=False)
    sub = pb[:, cols]
    d = np.asarray(sub.todense(), dtype=np.float64)
    var = d.var(axis=1)
    top = np.argsort(var)[::-1][:8000]
    d = d[np.sort(top)]
    lib = d.sum(axis=0)
    lib[lib == 0] = 1.0
    norm = np.log1p(d * (1e4 / lib)[None, :])
    return sp.csc_matrix(norm)


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from rcppml_tpu import datasets

    pb = pbmc_subset()
    # --- calibration 1: CV NMF k=16 (R auto rule: k<32, L1=0 -> cholesky) ---
    t_pbmc_cv = best_of(lambda: oracle.nmf_fit_cv(
        pb, 16, seed=1, cv_seed=1, test_fraction=0.1, max_iter=ITERS,
        tol=0.0, cv_patience=10**6, solver_mode=1))
    # --- calibration 2: standard NMF k=20 (cholesky) ---
    t_pbmc_nmf = best_of(lambda: oracle.nmf_fit(
        pb, 20, seed=1, max_iter=ITERS, tol=0.0, patience=10**6,
        solver_mode=1))

    f_cv = t_pbmc_cv / PUBLISHED_PBMC_CV_S
    f_nmf = t_pbmc_nmf / PUBLISHED_PBMC_NMF_S

    # --- gate-2 workload: movielens k=50 CV, L1_H=0.01
    # (R auto rule nmf_thin.R:371-375: k >= 32 or L1 != 0 -> CD) ---
    ml = datasets.movielens()
    t_ml = best_of(lambda: oracle.nmf_fit_cv(
        ml, 50, seed=1, cv_seed=1, test_fraction=0.1, max_iter=ITERS,
        tol=0.0, cv_patience=10**6, solver_mode=2, L1=(0.0, 0.01)))
    ml_host_per_iter = t_ml / ITERS

    # cross-scale with the SAME-family calibration (CV -> CV)
    ml_xeon_per_iter = ml_host_per_iter / f_cv
    anchor_ips = 1.0 / ml_xeon_per_iter

    out = {
        "method": "oracle measurement cross-scaled by published Xeon time",
        "host_threads": os.cpu_count(),
        "pbmc_subset_shape": list(pb.shape),
        "pbmc_subset_nnz": int(pb.nnz),
        "published_pbmc_cv_s": PUBLISHED_PBMC_CV_S,
        "host_pbmc_cv_s": round(t_pbmc_cv, 3),
        "host_vs_xeon_cv": round(f_cv, 3),
        "published_pbmc_nmf_s": PUBLISHED_PBMC_NMF_S,
        "host_pbmc_nmf_s": round(t_pbmc_nmf, 3),
        "host_vs_xeon_nmf": round(f_nmf, 3),
        "host_movielens_cv_s_per_iter": round(ml_host_per_iter, 4),
        "xeon_est_movielens_cv_s_per_iter": round(ml_xeon_per_iter, 4),
        "movielens_cv_anchor_iters_per_sec": round(anchor_ips, 3),
        "note": "anchor = estimated 56T-Xeon reference CD-CV throughput on "
                "the gate-2 workload; gate-2 bar = 5x this",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "CPU_ANCHOR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
