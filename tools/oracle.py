"""ctypes wrapper for native/liboracle.so — the reference-execution oracle.

The oracle is a plain C++/OpenMP port of the REFERENCE CPU hot loop (see
native/oracle.cpp header for the file:line map).  It is a parity tool, not
part of the framework: tests/test_golden_oracle.py asserts factor-level
equivalence of rcppml_tpu against it, and tools/measure_cpu_anchor.py uses
it to turn gate 2's CPU anchor into a measurement.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def load():
    global _LIB
    if _LIB is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(here, "native", "liboracle.so")
        if not os.path.exists(path):
            import subprocess
            subprocess.run(["make", "-C", os.path.join(here, "native"),
                            "liboracle.so"], check=True, capture_output=True)
        _LIB = ctypes.CDLL(path)
        _LIB.oracle_pos_hash.restype = ctypes.c_uint64
        _LIB.oracle_pos_hash.argtypes = [ctypes.c_uint64, ctypes.c_uint32,
                                         ctypes.c_uint32]
    return _LIB


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _split_input(A):
    """Return (dense_ptr, p_ptr, i_ptr, x_ptr, keepalive) for dense ndarray
    or scipy sparse input."""
    import scipy.sparse as sp
    if sp.issparse(A):
        A = A.tocsc()
        A.sum_duplicates()
        p = np.ascontiguousarray(A.indptr, dtype=np.int64)
        i = np.ascontiguousarray(A.indices, dtype=np.int32)
        x = np.ascontiguousarray(A.data, dtype=np.float64)
        return (None, p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _dp(x),
                (p, i, x), A.shape)
    Ad = np.asfortranarray(np.asarray(A, dtype=np.float64))
    return (_dp(Ad), None, None, None, (Ad,), Ad.shape)


def fill_uniform(seed: int, rows: int, cols: int) -> np.ndarray:
    lib = load()
    out = np.zeros((rows, cols), dtype=np.float64, order="F")
    lib.oracle_fill_uniform(ctypes.c_uint64(seed), rows, cols, _dp(out))
    return out


def pos_hash(seed: int, i: int, j: int) -> int:
    return int(load().oracle_pos_hash(ctypes.c_uint64(seed),
                                      ctypes.c_uint32(i),
                                      ctypes.c_uint32(j)))


def nmf_fit(A, k: int, *, seed: int = 42, max_iter: int = 100,
            tol: float = 1e-4, patience: int = 5, solver_mode: int = 1,
            cd_maxit: int = 100,
            cd_tol: float = 1e-8, L1=(0.0, 0.0), L2=(0.0, 0.0),
            norm_type: int = 1, threads: int = 0):
    """Reference-semantics standard ALS fit.  Returns dict with W (m,k),
    d (k), H (k,n), loss_history, iterations, converged."""
    lib = load()
    dense, p, i, x, keep, (m, n) = _split_input(A)
    W_T = np.zeros((k, m), dtype=np.float64, order="F")
    d = np.zeros(k, dtype=np.float64)
    H = np.zeros((k, n), dtype=np.float64, order="F")
    hist = np.zeros(max_iter, dtype=np.float64)
    conv = ctypes.c_int(0)
    iters = lib.oracle_nmf_fit(
        m, n, dense, p, i, x, k, ctypes.c_uint32(seed), max_iter,
        ctypes.c_double(tol), patience, solver_mode, cd_maxit,
        ctypes.c_double(cd_tol),
        ctypes.c_double(L1[0]), ctypes.c_double(L1[1]),
        ctypes.c_double(L2[0]), ctypes.c_double(L2[1]), norm_type, threads,
        _dp(W_T), _dp(d), _dp(H), _dp(hist), ctypes.byref(conv))
    if iters < 0:
        raise ValueError("oracle_nmf_fit failed")
    del keep
    return {"W": W_T.T.copy(), "d": d, "H": H,
            "loss_history": hist[:iters].copy(), "iterations": int(iters),
            "converged": bool(conv.value),
            "train_loss": float(hist[iters - 1]) if iters else float("nan")}


def nmf_fit_cv(A, k: int, *, seed: int = 42, cv_seed: int = 0,
               test_fraction: float = 0.1, mask_zeros: bool = False,
               max_iter: int = 100, tol: float = 1e-4, cv_patience: int = 5,
               solver_mode: int = 0, cd_maxit: int = 100, L1=(0.0, 0.0),
               norm_type: int = 1, threads: int = 0):
    """Reference-semantics speckled-CV fit (per-column Gram correction)."""
    lib = load()
    dense, p, i, x, keep, (m, n) = _split_input(A)
    W_T = np.zeros((k, m), dtype=np.float64, order="F")
    d = np.zeros(k, dtype=np.float64)
    H = np.zeros((k, n), dtype=np.float64, order="F")
    tr_hist = np.zeros(max_iter, dtype=np.float64)
    te_hist = np.zeros(max_iter, dtype=np.float64)
    best_iter = ctypes.c_int(0)
    best_test = ctypes.c_double(0)
    iters = lib.oracle_nmf_fit_cv(
        m, n, dense, p, i, x, k, ctypes.c_uint32(seed),
        ctypes.c_uint32(cv_seed), ctypes.c_double(test_fraction),
        int(mask_zeros), max_iter, ctypes.c_double(tol), cv_patience,
        solver_mode, cd_maxit,
        ctypes.c_double(L1[0]), ctypes.c_double(L1[1]),
        norm_type, threads, _dp(W_T), _dp(d), _dp(H), _dp(tr_hist),
        _dp(te_hist), ctypes.byref(best_iter), ctypes.byref(best_test))
    if iters < 0:
        raise ValueError("oracle_nmf_fit_cv failed")
    del keep
    return {"W": W_T.T.copy(), "d": d, "H": H,
            "train_loss_history": tr_hist[:iters].copy(),
            "test_loss_history": te_hist[:iters].copy(),
            "train_loss": float(tr_hist[iters - 1]) if iters else None,
            "test_loss": float(te_hist[iters - 1]) if iters else None,
            "best_iter": int(best_iter.value),
            "best_test_loss": float(best_test.value),
            "iterations": int(iters)}


def auto_rank(A, *, k_init: int = 2, max_k: int = 50, bracket_tol: int = 2,
              seed: int = 0, cv_seed: int = 0, test_fraction: float = 0.1,
              max_iter: int = 100, tol: float = 1e-4, cv_patience: int = 5,
              cd_maxit: int = 100, threads: int = 0):
    """Reference exponential + golden-section rank search."""
    lib = load()
    dense, p, i, x, keep, (m, n) = _split_input(A)
    k_low = ctypes.c_int(-1)
    k_high = ctypes.c_int(-1)
    overfit = ctypes.c_int(0)
    k_opt = lib.oracle_auto_rank(
        m, n, dense, p, i, x, k_init, max_k, bracket_tol,
        ctypes.c_uint32(seed), ctypes.c_uint32(cv_seed),
        ctypes.c_double(test_fraction), max_iter, ctypes.c_double(tol),
        cv_patience, cd_maxit, threads, ctypes.byref(k_low),
        ctypes.byref(k_high), ctypes.byref(overfit))
    del keep
    return {"k_optimal": int(k_opt), "k_low": int(k_low.value),
            "k_high": int(k_high.value),
            "overfitting_detected": bool(overfit.value)}
