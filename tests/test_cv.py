"""Speckled CV, masking, multi-rank sweep, auto-rank.

Reference models: test_cross_validation semantics in fit_cv.hpp,
test_masking.R, rank_cv.hpp.
"""

import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.models.nmf_cv import build_speckled_mask, cv_sweep
from rcppml_tpu.models.rank_cv import find_optimal_rank
from rcppml_tpu.utils.simulate import simulate_nmf


@pytest.fixture(scope="module")
def sim():
    return simulate_nmf(m=70, n=90, k=4, noise=0.03, seed=21)


def test_speckled_mask_deterministic(sim):
    A = sim["A"]
    cfg = rt.build_config(4, test_fraction=0.1, cv_seed=7)
    m1 = build_speckled_mask(cfg, A)
    m2 = build_speckled_mask(cfg, A)
    np.testing.assert_array_equal(m1, m2)
    assert 0.05 < m1.mean() < 0.15


def test_cv_fit_basic(sim):
    A = sim["A"]
    res = rt.nmf(A, 4, test_fraction=0.1, cv_seed=3, seed=42, maxit=50)
    assert np.isfinite(res.test_loss)
    assert np.isfinite(res.train_loss)
    assert res.test_loss_history is not None
    assert res.best_iter >= 0
    # with the right rank, test loss should drop well below initial
    assert res.test_loss_history[-1] < res.test_loss_history[0]


def test_cv_reproducible(sim):
    A = sim["A"]
    r1 = rt.nmf(A, 4, test_fraction=0.1, cv_seed=3, seed=1, maxit=15)
    r2 = rt.nmf(A, 4, test_fraction=0.1, cv_seed=3, seed=1, maxit=15)
    assert r1.test_loss == r2.test_loss
    np.testing.assert_allclose(r1.W, r2.W, rtol=1e-6, atol=1e-7)


def test_cv_rank_discrimination():
    """Test error should be minimized near the true rank."""
    sim = simulate_nmf(m=80, n=100, k=4, noise=0.05, seed=33,
                       factor_sparsity=0.3)
    A = sim["A"]
    rows = cv_sweep(A, [1, 4, 16], cv_seed=1, seed=42, maxit=60,
                    test_fraction=0.1)
    by_k = {r["k"]: r["best_test_loss"] for r in rows}
    assert by_k[4] < by_k[1]      # true rank beats underfit rank


def test_mask_zeros_mode():
    """mask_zeros: only nonzeros eligible for holdout (recommender CV)."""
    sim = simulate_nmf(m=60, n=60, k=3, noise=0.02, dropout=0.5, seed=5)
    A = sim["A"]
    cfg = rt.build_config(3, test_fraction=0.2, cv_seed=2, mask_zeros=True)
    M = build_speckled_mask(cfg, A)
    assert (A[M] != 0).all()
    import scipy.sparse as sp
    res = rt.nmf(sp.csc_matrix(A), 3, test_fraction=0.2, cv_seed=2,
                 mask_zeros=True, seed=42, maxit=30)
    assert np.isfinite(res.test_loss)


def test_user_mask(sim):
    """User-supplied mask: masked entries excluded from the fit."""
    A = sim["A"].copy()
    rs = np.random.RandomState(0)
    M = rs.uniform(size=A.shape) < 0.2
    A_corrupt = A.copy()
    A_corrupt[M] = 99.0   # corrupted entries, masked out
    res = rt.nmf(A_corrupt, 4, mask=M, seed=42, maxit=60)
    rec = res.reconstruct()
    # reconstruction at masked positions should look like the TRUE data,
    # not the corrupted 99s
    err_vs_truth = np.abs(rec[M] - A[M]).mean()
    err_vs_corrupt = np.abs(rec[M] - 99.0).mean()
    assert err_vs_truth < err_vs_corrupt


def test_multi_rank_returns_rows(sim):
    A = sim["A"]
    rows = rt.nmf(A, [2, 3], test_fraction=0.1, cv_seed=1, seed=42, maxit=15)
    assert isinstance(rows, list) and len(rows) == 2
    assert {"k", "rep", "train_mse", "test_mse"} <= set(rows[0].keys())


def test_cv_multiple_reps(sim):
    A = sim["A"]
    rows = cv_sweep(A, [3], cv_seed=[1, 2], seed=42, maxit=15,
                    test_fraction=0.1)
    assert len(rows) == 2
    assert rows[0]["test_mse"] != rows[1]["test_mse"]  # different masks


def test_auto_rank():
    sim = simulate_nmf(m=60, n=80, k=3, noise=0.08, seed=13,
                       factor_sparsity=0.3)
    res = find_optimal_rank(sim["A"], k_init=1, max_k=16, seed=42, maxit=40,
                            cv_seed=1)
    search = res.misc["rank_search"]
    assert 1 <= search["k_optimal"] <= 16
    assert len(search["evaluations"]) >= 2


def test_cv_irls(sim):
    """CV composes with IRLS distributions (train-entry weighting)."""
    from rcppml_tpu.utils.simulate import simulate_counts
    counts = simulate_counts(m=40, n=50, k=3, seed=3)
    res = rt.nmf(counts["A"], 3, loss="gp", dispersion="none",
                 test_fraction=0.1, cv_seed=5, seed=42, maxit=15)
    assert np.isfinite(res.test_loss)
    assert np.isfinite(res.train_loss)


def test_cv_sweep_distribution_columns():
    """GP sweeps report mean_theta; MSE sweeps report NaN distribution
    columns (test_g1_g6_fixes.R G5)."""
    from rcppml_tpu.models.nmf_cv import cv_sweep
    from rcppml_tpu.utils.simulate import simulate_counts
    A = simulate_counts(m=30, n=40, k=2, seed=6)["A"]
    rows_gp = cv_sweep(A, [2], cv_seed=1, maxit=6, loss="gp",
                       dispersion="per_row", test_fraction=0.15)
    assert np.isfinite(rows_gp[0]["mean_theta"])
    rows_mse = cv_sweep(A, [2], cv_seed=1, maxit=6, test_fraction=0.15)
    assert np.isnan(rows_mse[0]["mean_theta"])
    assert np.isnan(rows_mse[0]["mean_dispersion"])
