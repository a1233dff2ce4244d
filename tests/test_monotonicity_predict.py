"""Loss-monotonicity, predict(), upper-bound, and nnls-target behaviors
(reference: test_loss_monotonicity.R, test_predict.R, test_upper_bound.R,
test_target_regularization.R:135-160).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import rcppml_tpu as rt
from rcppml_tpu.models.project import nnls, predict


@pytest.fixture(scope="module")
def sim():
    s = rt.simulate_nmf(m=50, n=40, k=3, noise=0.1, dropout=0.3, seed=42)
    return s["A"].astype(np.float32)


def _history(A, **kw):
    res = rt.nmf(A, 3, maxit=40, tol=0.0, seed=123, track_train_loss=True,
                 **kw)
    h = np.asarray(res.loss_history, dtype=np.float64)
    return h[np.isfinite(h)]


# ---------------------------------------------------------------------------
# loss monotonicity (test_loss_monotonicity.R:6-176) — the tracked
# objective may never increase beyond numerical noise
# ---------------------------------------------------------------------------

def test_monotone_mse(sim):
    h = _history(sim)
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-4 + 1e-5).all()


def test_monotone_l1(sim):
    h = _history(sim, L1=(0.05, 0.05))
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-4 + 1e-5).all()


def test_monotone_l2(sim):
    """L2 trade-offs allow local wiggle; the reference only asserts an
    overall decrease (test_loss_monotonicity.R:48-67)."""
    h = _history(sim, L2=(0.05, 0.05))
    assert h[-1] < h[0] * 1.1
    # and the wiggle is bounded: no step increases by more than 5%
    assert (np.diff(h) <= np.abs(h[:-1]) * 5e-2).all()


def test_monotone_combined(sim):
    h = _history(sim, L1=(0.02, 0.02), L2=(0.02, 0.02))
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-4 + 1e-5).all()


def test_monotone_huber(sim):
    h = _history(sim, robust=True)
    # IRLS tolerance (test_loss_monotonicity.R:106-122 uses 1e-4 abs)
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-3 + 1e-4).all()


def test_monotone_gp(sim):
    """GP's tracked NLL moves with the per-iteration theta update, so the
    reference instead evaluates a theta-free KL divergence of the
    reconstruction at 20-iteration checkpoints
    (test_loss_monotonicity.R:126-143, helper-test-utils.R:128-133)."""
    A = np.maximum(sim, 0.01).astype(np.float32)

    def kl_div(model):
        rec = np.maximum(np.asarray(model.reconstruct(), np.float64), 1e-10)
        As = np.maximum(A.astype(np.float64), 1e-10)
        return float((As * np.log(As / rec) - As + rec).mean())

    losses = [kl_div(rt.nmf(A, 3, loss="gp", maxit=20 * i, tol=0.0,
                            seed=123)) for i in range(1, 6)]
    for prev, cur in zip(losses, losses[1:]):
        assert cur <= prev + 0.01


def test_monotone_sparse(sim):
    h = _history(sp.csc_matrix(sim.astype(np.float64)))
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-4 + 1e-5).all()


def test_monotone_mask_zeros(sim):
    h = _history(sp.csc_matrix(sim.astype(np.float64)), mask="zeros")
    # masked optimization tolerance (test_loss_monotonicity.R:159-176)
    assert (np.diff(h) <= np.abs(h[:-1]) * 1e-2 + 1e-3).all()


def test_strong_l2_data_loss_bounded(sim):
    """With strong L2 the data loss may wiggle, but must not blow up
    (test_loss_monotonicity.R:178-200)."""
    m1 = rt.nmf(sim, 3, L2=(0.5, 0.5), maxit=10, tol=0.0, seed=123)
    m2 = rt.nmf(sim, 3, L2=(0.5, 0.5), maxit=20, tol=0.0, seed=123)
    d1 = float(np.mean((sim - np.asarray(m1.reconstruct())) ** 2))
    d2 = float(np.mean((sim - np.asarray(m2.reconstruct())) ** 2))
    assert np.isfinite(d1) and np.isfinite(d2)
    assert d2 < d1 * 10


# ---------------------------------------------------------------------------
# predict() (test_predict.R)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fitted(sim):
    return rt.nmf(sim, 3, maxit=30, seed=1)


def test_predict_sparse_and_dense(sim, fitted):
    newdata = sim[:, :10]
    hd = predict(fitted, newdata)
    hs = predict(fitted, sp.csc_matrix(newdata.astype(np.float64)))
    assert hd.shape == (3, 10)
    np.testing.assert_allclose(hd, hs, atol=1e-6)


def test_predict_l1_sparsifies(sim, fitted):
    h0 = predict(fitted, sim)
    h1 = nnls(sim, w=np.asarray(fitted.W), L1=0.5)
    assert (np.asarray(h1) == 0).mean() > (np.asarray(h0) == 0).mean()


def test_predict_preserves_columns_nonneg(sim, fitted):
    h = predict(fitted, sim[:, :7])
    assert h.shape[1] == 7
    assert (np.asarray(h) >= 0).all()


def test_nnls_invalid_penalties_error(sim, fitted):
    with pytest.raises((ValueError, TypeError)):
        nnls(sim, w=np.asarray(fitted.W), L1=-1.0)
    with pytest.raises((ValueError, TypeError)):
        nnls(sim, w=np.asarray(fitted.W), L2=-0.5)


# ---------------------------------------------------------------------------
# upper bound (test_upper_bound.R)
# ---------------------------------------------------------------------------

def test_upper_bound_w_clamps(sim):
    res = rt.nmf(sim, 3, upper_bound=(0.05, 0.0), norm="none", maxit=15,
                 seed=1)
    assert np.asarray(res.W).max() <= 0.05 + 1e-6


def test_upper_bound_h_clamps(sim):
    res = rt.nmf(sim, 3, upper_bound=(0.0, 0.05), norm="none", maxit=15,
                 seed=1)
    assert np.asarray(res.H).max() <= 0.05 + 1e-6


def test_upper_bound_both_and_loss(sim):
    both = rt.nmf(sim, 3, upper_bound=(0.05, 0.05), norm="none", maxit=15,
                  seed=1)
    free = rt.nmf(sim, 3, norm="none", maxit=15, seed=1)
    assert np.asarray(both.W).max() <= 0.05 + 1e-6
    assert np.asarray(both.H).max() <= 0.05 + 1e-6
    # a binding bound cannot fit better than the unconstrained model
    assert float(both.train_loss) >= float(free.train_loss) - 1e-6


def test_upper_bound_zero_is_no_bound(sim):
    a = rt.nmf(sim, 3, upper_bound=(0.0, 0.0), maxit=10, seed=1)
    b = rt.nmf(sim, 3, maxit=10, seed=1)
    np.testing.assert_array_equal(np.asarray(a.W), np.asarray(b.W))


# ---------------------------------------------------------------------------
# nnls with targets (test_target_regularization.R:135-160)
# ---------------------------------------------------------------------------

def test_nnls_target_enrichment(sim, fitted):
    W = np.asarray(fitted.W)
    rs = np.random.RandomState(0)
    T = rs.rand(3, sim.shape[1]).astype(np.float32)
    h_plain = nnls(sim, w=W)
    h_enr = nnls(sim, w=W, target_H=T, target_lambda=5.0)
    assert h_enr.shape == h_plain.shape
    # enrichment pulls the solution toward the target
    assert np.linalg.norm(h_enr - T) < np.linalg.norm(h_plain - T)


def test_nnls_target_proj_adv(sim, fitted):
    W = np.asarray(fitted.W)
    rs = np.random.RandomState(1)
    T = rs.rand(3, sim.shape[1]).astype(np.float32)
    h_adv = nnls(sim, w=W, target_H=T, target_lambda=-1.0)
    assert np.isfinite(h_adv).all()
    assert h_adv.shape == (3, sim.shape[1])


def test_result_predict_method(sim, fitted):
    """NMFResult.predict delegates to the projection solver
    (R predict,nmf S4 method)."""
    np.testing.assert_allclose(fitted.predict(sim[:, :6]),
                               predict(fitted, sim[:, :6]), atol=1e-6)
