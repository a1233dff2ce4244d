"""Core NMF behavior: convergence, reproducibility, recovery, solvers.

Mirrors the reference's test strategy layers 2-4 (SURVEY.md §4):
ground-truth recovery, loss monotonicity, seed determinism.
"""

import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.utils.simulate import simulate_nmf

pytestmark = pytest.mark.tpu_ok  # numerics-critical: runs on the real chip


def _mse(res, A):
    rec = res.reconstruct()
    return float(np.mean((A - rec) ** 2))


def test_basic_fit_reduces_loss(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=42, maxit=50)
    assert res.W.shape == (60, 4)
    assert res.H.shape == (4, 80)
    assert res.d.shape == (4,)
    base = float(np.mean((A - A.mean()) ** 2))
    assert _mse(res, A) < 0.25 * base


def test_loss_monotonic(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=42, maxit=40, tol=0.0, sort_model=False)
    h = res.loss_history
    assert h is not None and len(h) == 40
    # loss never increases. Tolerance: the Gram-trick loss is a difference of
    # O(tr(A'A)) fp32 terms, so jitter of ~tr(A'A)*eps is inherent.
    diffs = np.diff(h)
    assert np.all(diffs <= np.abs(h[0]) * 1e-6 + 1e-6)


def test_seed_reproducibility(small_factors):
    A = small_factors["A"]
    r1 = rt.nmf(A, 4, seed=7, maxit=20)
    r2 = rt.nmf(A, 4, seed=7, maxit=20)
    np.testing.assert_allclose(r1.W, r2.W, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(r1.H, r2.H, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(r1.d, r2.d, rtol=1e-6, atol=1e-7)


def test_different_seeds_differ(small_factors):
    A = small_factors["A"]
    r1 = rt.nmf(A, 4, seed=1, maxit=5)
    r2 = rt.nmf(A, 4, seed=2, maxit=5)
    assert not np.allclose(r1.W, r2.W)


def test_solvers_agree(small_factors):
    A = small_factors["A"]
    r_chol = rt.nmf(A, 4, seed=3, maxit=60, solver="cholesky")
    r_cd = rt.nmf(A, 4, seed=3, maxit=60, solver="cd")
    # Both reach comparable reconstruction quality
    assert abs(_mse(r_chol, A) - _mse(r_cd, A)) < 0.05 * _mse(r_cd, A) + 1e-6


def test_ground_truth_recovery():
    sim = simulate_nmf(m=100, n=120, k=3, noise=0.01, seed=11,
                       factor_sparsity=0.6)
    A = sim["A"]
    res = rt.nmf(A, 3, seed=42, maxit=200, tol=1e-6)
    # reconstruction close to truth
    truth = sim["W"] @ sim["H"]
    rec = res.reconstruct()
    rel_err = np.linalg.norm(rec - truth) / np.linalg.norm(truth)
    assert rel_err < 0.05


def test_convergence_flags():
    # Noisier data: residual SSE stays well above the fp32 Gram-trick
    # cancellation floor (~tr(A'A)*eps), so the relative tolerance is
    # actually attainable — matching realistic reference use (tol=1e-4).
    sim = simulate_nmf(m=60, n=80, k=4, noise=0.5, seed=55)
    res = rt.nmf(sim["A"], 4, seed=42, maxit=500, tol=1e-4)
    assert res.converged
    assert res.iterations < 500
    assert res.final_tol < 1e-4
    assert np.isfinite(res.train_loss)


def test_nonneg_outputs(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=42, maxit=20)
    assert (res.W >= 0).all()
    assert (res.H >= 0).all()
    assert (res.d > 0).all()


def test_l1_increases_sparsity(small_factors):
    A = small_factors["A"]
    r0 = rt.nmf(A, 4, seed=5, maxit=40, solver="cd")
    r1 = rt.nmf(A, 4, seed=5, maxit=40, L1=(0.0, 0.05), solver="cd")
    assert r1.sparsity()["H"] > r0.sparsity()["H"]


def test_l2_shrinks(small_factors):
    A = small_factors["A"]
    r1 = rt.nmf(A, 4, seed=5, maxit=40, L2=(0.5, 0.5))
    assert np.isfinite(r1.train_loss)
    assert _mse(r1, A) >= 0


def test_norm_types(small_factors):
    A = small_factors["A"]
    for norm in ("L1", "L2"):
        res = rt.nmf(A, 4, seed=9, maxit=15, norm=norm, sort_model=False)
        rows = (np.abs(res.H).sum(axis=1) if norm == "L1"
                else np.sqrt((res.H ** 2).sum(axis=1)))
        np.testing.assert_allclose(rows, 1.0, rtol=1e-4)


def test_d_sorted(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=9, maxit=15, sort_model=True)
    assert (np.diff(res.d) <= 1e-7).all()


def test_upper_bound(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=9, maxit=15, upper_bound=(0.5, 0.02), norm="none",
                 sort_model=False)
    assert res.W.max() <= 0.5 + 1e-6
    assert res.H.max() <= 0.02 + 1e-6


def test_projective(small_factors):
    A = small_factors["A"]
    res = rt.nmf(A, 4, seed=9, maxit=25, projective=True)
    assert np.isfinite(res.train_loss)
    assert (res.H >= 0).all()


def test_symmetric():
    rs = np.random.RandomState(0)
    X = rs.uniform(0, 1, (50, 4)).astype(np.float32)
    A = (X @ X.T).astype(np.float32)
    res = rt.nmf(A, 4, seed=3, maxit=100, tol=1e-6, symmetric=True)
    np.testing.assert_allclose(res.H, res.W.T, rtol=1e-6, atol=1e-7)
    rec = res.reconstruct()
    rel = np.linalg.norm(rec - A) / np.linalg.norm(A)
    assert rel < 0.15


def test_w_init(small_factors):
    A = small_factors["A"]
    w0 = np.abs(np.random.RandomState(1).normal(size=(60, 4))).astype(np.float32)
    res = rt.nmf(A, 4, w_init=w0, maxit=20)
    assert np.isfinite(res.train_loss)


def test_validation_errors(small_factors):
    A = small_factors["A"]
    with pytest.raises(ValueError):
        rt.nmf(A, 0)
    with pytest.raises(ValueError):
        rt.nmf(A, 4, maxit=0)
    with pytest.raises(ValueError):
        rt.nmf(A, 4, solver="cholesky", loss="nb")
    with pytest.raises(ValueError):
        rt.nmf(A, 4, projective=True, symmetric=True)
    with pytest.raises(ValueError):
        rt.nmf(A, 1000)  # rank > min(dim)
