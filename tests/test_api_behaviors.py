"""Behavior suites mirroring the remaining reference test files:
test_build_ls_semi_nmf.R (LS / semi-NMF), test_orthogonality.R
(angular decorrelation), test_multi_rank_cv.R, test_align.R,
test_refine.R, test_simulateNMF.R.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import rcppml_tpu as rt


def _mixed_sign(m=40, n=30, k=3, seed=7):
    rs = np.random.RandomState(seed)
    W = rs.normal(0, 1, (m, k))          # mixed sign
    H = np.abs(rs.normal(0, 1, (k, n)))
    return (W @ H + 0.05 * rs.normal(size=(m, n))).astype(np.float32)


def _sse(res, A):
    return float(((np.asarray(A) - res.reconstruct()) ** 2).sum())


# ---------------------------------------------------------------------------
# Unconstrained LS + semi-NMF (test_build_ls_semi_nmf.R)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sparse", [False, True])
def test_unconstrained_ls_beats_nnls_on_mixed_sign(sparse):
    A = _mixed_sign()
    data = sp.csc_matrix(A) if sparse else A
    ls = rt.nmf(data, 3, nonneg=(False, False), maxit=30, seed=1,
                tol=1e-10)
    nn = rt.nmf(np.abs(A) if False else data, 3, maxit=30, seed=1,
                tol=1e-10)
    assert _sse(ls, A) < _sse(nn, A)
    # unconstrained factors actually use negative entries
    assert (np.asarray(ls.W) < 0).any() or (np.asarray(ls.H) < 0).any()


def test_unconstrained_ls_loss_decreases():
    A = _mixed_sign(seed=11)
    m1 = rt.nmf(A, 3, nonneg=(False, False), maxit=1, seed=1, tol=1e-10)
    m30 = rt.nmf(A, 3, nonneg=(False, False), maxit=30, seed=1, tol=1e-10)
    assert _sse(m30, A) < _sse(m1, A)


@pytest.mark.parametrize("sparse", [False, True])
def test_semi_nmf_sign_pattern(sparse):
    A = _mixed_sign(seed=13)
    data = sp.csc_matrix(A) if sparse else A
    res = rt.nmf(data, 3, nonneg=(False, True), maxit=30, seed=1)
    assert (np.asarray(res.H) >= 0).all()        # H constrained
    assert (np.asarray(res.W) < 0).any()         # W free on mixed data
    h = np.asarray(res.loss_history)
    assert h[-1] <= h[0]


def test_semi_nmf_beats_full_nnls_on_mixed_w_data():
    A = _mixed_sign(seed=17)
    semi = rt.nmf(A, 3, nonneg=(False, True), maxit=30, seed=1, tol=1e-10)
    full = rt.nmf(A, 3, maxit=30, seed=1, tol=1e-10)
    assert _sse(semi, A) < _sse(full, A)


# ---------------------------------------------------------------------------
# Angular decorrelation (test_orthogonality.R)
# ---------------------------------------------------------------------------

def _max_offdiag_cos(M, axis_rows):
    F = np.asarray(M, dtype=np.float64)
    if not axis_rows:
        F = F.T
    F = F / (np.linalg.norm(F, axis=1, keepdims=True) + 1e-12)
    C = np.abs(F @ F.T)
    np.fill_diagonal(C, 0.0)
    return C.max()


def test_angular_reduces_w_correlation():
    rs = np.random.RandomState(3)
    base = np.abs(rs.rand(50, 2))
    # highly correlated latent structure
    W = np.hstack([base, base + 0.1 * np.abs(rs.rand(50, 2))])
    H = np.abs(rs.rand(4, 40))
    A = (W @ H).astype(np.float32)
    plain = rt.nmf(A, 4, seed=1, maxit=30)
    ang = rt.nmf(A, 4, seed=1, maxit=30, angular=(2.0, 0.0))
    assert (_max_offdiag_cos(ang.W, False)
            < _max_offdiag_cos(plain.W, False) + 1e-6)


def test_angular_h_reduces_h_row_correlation():
    rs = np.random.RandomState(4)
    base = np.abs(rs.rand(2, 40))
    H = np.vstack([base, base + 0.1 * np.abs(rs.rand(2, 40))])
    W = np.abs(rs.rand(50, 4))
    A = (W @ H).astype(np.float32)
    plain = rt.nmf(A, 4, seed=1, maxit=30)
    ang = rt.nmf(A, 4, seed=1, maxit=30, angular=(0.0, 2.0))
    assert (_max_offdiag_cos(ang.H, True)
            < _max_offdiag_cos(plain.H, True) + 1e-6)


def test_angular_sparse_and_losses():
    rs = np.random.RandomState(5)
    A = sp.csc_matrix(np.abs(rs.rand(40, 30)).astype(np.float32))
    res = rt.nmf(A, 3, seed=1, maxit=15, angular=(0.5, 0.5))
    assert np.isfinite(res.train_loss)
    counts = np.round(np.asarray(A.todense()) * 5).astype(np.float32)
    res_gp = rt.nmf(counts, 3, seed=1, maxit=10, loss="gp",
                    angular=(0.5, 0.0))
    assert np.isfinite(res_gp.train_loss)


def test_angular_combines_with_l1():
    A = np.abs(np.random.RandomState(6).rand(40, 30)).astype(np.float32)
    res = rt.nmf(A, 3, seed=1, maxit=15, angular=(0.5, 0.0), L1=(0.0, 0.2))
    assert np.isfinite(res.train_loss)


# ---------------------------------------------------------------------------
# Multi-rank CV (test_multi_rank_cv.R)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cv_data():
    rs = np.random.RandomState(42)
    A = sp.random(60, 40, density=0.3, random_state=rs, format="csc")
    A.data = np.abs(A.data)
    return A


def test_multi_rank_cv_table(cv_data):
    rows = rt.nmf(cv_data, [2, 3, 4], test_fraction=0.1, cv_seed=1,
                  seed=1, maxit=10)
    assert {r["k"] for r in rows} == {2, 3, 4}
    assert all(r["test_mse"] > 0 for r in rows)
    assert all(r["train_mse"] > 0 for r in rows)


def test_multi_rank_cv_replicates(cv_data):
    rows = rt.nmf(cv_data, [2, 3], test_fraction=0.1, cv_seed=[1, 2],
                  seed=1, maxit=8)
    reps = {r["rep"] for r in rows}
    assert len(reps) == 2
    assert len(rows) == 4


def test_multi_rank_cv_reproducible(cv_data):
    r1 = rt.nmf(cv_data, [2, 3], test_fraction=0.1, cv_seed=7, seed=1,
                maxit=8)
    r2 = rt.nmf(cv_data, [2, 3], test_fraction=0.1, cv_seed=7, seed=1,
                maxit=8)
    for a, b in zip(r1, r2):
        assert a["test_mse"] == b["test_mse"]


def test_single_rank_cv_returns_model(cv_data):
    res = rt.nmf(cv_data, 3, test_fraction=0.1, cv_seed=1, seed=1, maxit=8)
    assert hasattr(res, "W") and np.isfinite(res.test_loss)


# ---------------------------------------------------------------------------
# align (test_align.R)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def two_fits():
    A = rt.simulateNMF(50, 40, 4, noise=0.02, seed=3)["A"]
    ref = rt.nmf(A, 4, seed=1, maxit=30)
    other = rt.nmf(A, 4, seed=9, maxit=30)
    return ref, other, A


def test_align_improves_correlation(two_fits):
    ref, other, _ = two_fits
    aligned = other.align_to(ref)
    def diag_cos(a, b):
        Wa = np.asarray(a.W) / (np.linalg.norm(np.asarray(a.W), axis=0,
                                               keepdims=True) + 1e-12)
        Wb = np.asarray(b.W) / (np.linalg.norm(np.asarray(b.W), axis=0,
                                               keepdims=True) + 1e-12)
        return np.diag(Wa.T @ Wb).sum()
    assert diag_cos(aligned, ref) >= diag_cos(other, ref) - 1e-9
    assert np.asarray(aligned.W).shape == np.asarray(other.W).shape


def test_align_preserves_reconstruction(two_fits):
    ref, other, A = two_fits
    aligned = other.align_to(ref)
    np.testing.assert_allclose(aligned.reconstruct(), other.reconstruct(),
                               rtol=1e-5, atol=1e-5)


def test_align_identity_like(two_fits):
    ref, _, _ = two_fits
    aligned = ref.align_to(ref)
    np.testing.assert_array_equal(np.asarray(aligned.W),
                                  np.asarray(ref.W))


def test_align_cor_method_and_k2():
    A = rt.simulateNMF(30, 25, 2, noise=0.02, seed=5)["A"]
    r1 = rt.nmf(A, 2, seed=1, maxit=20)
    r2 = rt.nmf(A, 2, seed=4, maxit=20)
    aligned = r2.align_to(r1, method="cor")
    assert np.asarray(aligned.W).shape == (30, 2)


def test_align_dim_mismatch_errors(two_fits):
    ref, _, _ = two_fits
    A_small = rt.simulateNMF(20, 15, 3, seed=6)["A"]
    small = rt.nmf(A_small, 3, seed=1, maxit=5)
    with pytest.raises(ValueError):
        small.align_to(ref)


# ---------------------------------------------------------------------------
# refine (test_refine.R)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def labeled_fit():
    rs = np.random.RandomState(8)
    labels = np.repeat([0, 1, 2], 12)
    shift = np.abs(rs.rand(4, 3)) * 3
    H = np.abs(rs.rand(4, 36)) + shift[:, labels]
    W = np.abs(rs.rand(45, 4))
    A = (W @ H).astype(np.float32)
    model = rt.nmf(A, 4, seed=1, maxit=25)
    return model, labels, A


def test_refine_model_in_model_out(labeled_fit):
    model, labels, A = labeled_fit
    out = rt.refine(model, labels)
    assert hasattr(out, "H") and np.asarray(out.H).shape == (4, 36)


def test_refine_matrix_in_matrix_out(labeled_fit):
    model, labels, _ = labeled_fit
    H = np.asarray(model.H)
    out = rt.refine(H, labels)
    assert isinstance(out, np.ndarray) and out.shape == H.shape


def test_refine_lambda_zero_unchanged(labeled_fit):
    model, labels, _ = labeled_fit
    H = np.asarray(model.H)
    out = rt.refine(H, labels, lambda_=0.0)
    np.testing.assert_allclose(out, H, atol=1e-6)


def test_refine_nonneg_default_and_off(labeled_fit):
    model, labels, _ = labeled_fit
    out = rt.refine(np.asarray(model.H), labels)
    assert (out >= 0).all()
    out_free = rt.refine(np.asarray(model.H), labels, nonneg=False,
                         lambda_=1.0)
    assert isinstance(out_free, np.ndarray)


def test_refine_error_paths(labeled_fit):
    model, labels, A = labeled_fit
    with pytest.raises(ValueError):
        rt.refine(model, labels[:-3])          # length mismatch
    with pytest.raises(ValueError):
        rt.refine(model, labels, lambda_=1.5)  # invalid lambda
    with pytest.raises(ValueError):
        rt.refine(model, labels, cycles=2)     # cycles need data


def test_refine_cycles_updates_model(labeled_fit):
    model, labels, A = labeled_fit
    out = rt.refine(model, labels, data=A, cycles=2)
    assert hasattr(out, "W")
    assert np.isfinite(np.asarray(out.W)).all()
    # factors actually moved
    assert not np.allclose(np.asarray(out.H), np.asarray(model.H))


def test_refine_batch_proj_adv(labeled_fit):
    model, labels, A = labeled_fit
    batch = np.tile([0, 1], 18)
    out = rt.refine(model, labels, data=A, batch=batch, cycles=1)
    assert hasattr(out, "W") and np.isfinite(np.asarray(out.W)).all()


def test_refine_sparse_data_cycles(labeled_fit):
    model, labels, A = labeled_fit
    out = rt.refine(model, labels, data=sp.csc_matrix(A), cycles=1)
    assert np.isfinite(np.asarray(out.H)).all()


# ---------------------------------------------------------------------------
# simulateNMF (test_simulateNMF.R)
# ---------------------------------------------------------------------------

def test_simulate_nmf_structure():
    sim = rt.simulateNMF(30, 20, 3, seed=1)
    assert set(sim) >= {"A", "W", "H"}
    assert sim["A"].shape == (30, 20)
    assert sim["W"].shape == (30, 3) and sim["H"].shape == (3, 20)


def test_simulate_nmf_nonnegative_with_and_without_noise():
    assert (rt.simulateNMF(25, 20, 3, noise=0.0, seed=2)["A"] >= 0).all()
    assert (rt.simulateNMF(25, 20, 3, noise=0.3, seed=2)["A"] >= 0).all()


def test_simulate_nmf_dropout_zeros():
    dense = rt.simulateNMF(40, 30, 3, dropout=0.0, seed=3)["A"]
    dropped = rt.simulateNMF(40, 30, 3, dropout=0.4, seed=3)["A"]
    assert (dropped == 0).mean() > (dense == 0).mean() + 0.2


def test_simulate_nmf_seed_reproducible():
    a = rt.simulateNMF(20, 15, 3, seed=11)["A"]
    b = rt.simulateNMF(20, 15, 3, seed=11)["A"]
    c = rt.simulateNMF(20, 15, 3, seed=12)["A"]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_simulate_swimmer_properties():
    sim = rt.simulateSwimmer()
    A = sim["A"]
    assert A.ndim == 2 and (np.asarray(A) >= 0).all()
