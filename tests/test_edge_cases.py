"""Degenerate / edge-case inputs (reference: test_edge_cases.R,
test_degenerate_inputs.R, test_thread_edge_cases.R)."""

import numpy as np
import pytest

import rcppml_tpu as rt


def test_k_equals_one():
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(20, 30)).astype(np.float32)
    res = rt.nmf(A, 1, seed=42, maxit=30)
    assert res.W.shape == (20, 1)
    # rank-1 NMF approximates the dominant singular triplet
    u, s, vt = np.linalg.svd(A)
    rec = res.reconstruct()
    rec1 = s[0] * np.outer(u[:, 0], vt[0])
    assert np.linalg.norm(rec - np.abs(rec1)) / np.linalg.norm(A) < 0.2


def test_zero_columns():
    rs = np.random.RandomState(1)
    A = np.abs(rs.rand(25, 20)).astype(np.float32)
    A[:, 5] = 0
    A[:, 12] = 0
    res = rt.nmf(A, 3, seed=42, maxit=30)
    assert np.isfinite(res.H).all()
    # zero columns get (near-)zero loadings
    assert np.abs(res.H[:, 5]).sum() < 1e-3
    assert np.abs(res.H[:, 12]).sum() < 1e-3


def test_zero_rows():
    rs = np.random.RandomState(2)
    A = np.abs(rs.rand(25, 20)).astype(np.float32)
    A[7] = 0
    res = rt.nmf(A, 3, seed=42, maxit=30)
    assert np.isfinite(res.W).all()
    assert np.abs(res.W[7]).sum() < 1e-3


def test_constant_matrix():
    A = np.full((15, 18), 3.0, dtype=np.float32)
    res = rt.nmf(A, 2, seed=42, maxit=30)
    rel = np.linalg.norm(res.reconstruct() - A) / np.linalg.norm(A)
    assert rel < 1e-2


def test_tiny_matrix():
    A = np.abs(np.random.RandomState(3).rand(3, 4)).astype(np.float32)
    res = rt.nmf(A, 2, seed=42, maxit=50)
    assert np.isfinite(res.train_loss)


def test_k_equals_min_dim():
    rs = np.random.RandomState(4)
    A = np.abs(rs.rand(10, 6)).astype(np.float32)
    # exact NNLS (CD) recovers a full-rank nonneg factorization to fp noise;
    # Cholesky+clip is approximate by design at exact rank
    res = rt.nmf(A, 6, seed=42, maxit=300, solver="cd", tol=1e-7)
    rel = np.linalg.norm(res.reconstruct() - A) / np.linalg.norm(A)
    assert rel < 1e-3


def test_wide_and_tall():
    rs = np.random.RandomState(5)
    for shape in [(5, 200), (200, 5)]:
        A = np.abs(rs.rand(*shape)).astype(np.float32)
        res = rt.nmf(A, 3, seed=42, maxit=20)
        assert res.W.shape == (shape[0], 3)
        assert np.isfinite(res.train_loss)


def test_sparse_all_zero_column_spz_roundtrip(tmp_path):
    import scipy.sparse as sp
    from rcppml_tpu.io.spz import st_read, st_write
    A = sp.csc_matrix(np.diag([1.0, 0.0, 2.0, 0.0, 3.0]).astype(np.float32))
    p = str(tmp_path / "diag.spz")
    st_write(A, p)
    np.testing.assert_allclose(st_read(p).toarray(), A.toarray())


def test_svd_k_larger_than_rank():
    rs = np.random.RandomState(6)
    u = rs.rand(30, 2)
    v = rs.rand(2, 25)
    A = (u @ v).astype(np.float32)      # exact rank 2
    res = rt.svd(A, 10, method="lanczos", seed=1)
    # trailing singular values collapse to ~0
    assert res.d[2] < 1e-3 * res.d[0]


def test_cv_extreme_fraction():
    rs = np.random.RandomState(7)
    A = np.abs(rs.rand(40, 50)).astype(np.float32)
    res = rt.nmf(A, 3, test_fraction=0.5, cv_seed=1, seed=42, maxit=15)
    assert np.isfinite(res.test_loss)


def test_nan_input_auto_masked():
    """NaN in nmf() auto-masks with a warning (test_masking.R:240-262);
    svd() still fails loudly (R/nmf_validation.R NA detection)."""
    A = np.abs(np.random.RandomState(0).normal(size=(10, 8))).astype(np.float32)
    A[3, 4] = np.nan
    with pytest.warns(UserWarning, match="Detected 1 NA"):
        res = rt.nmf(A, 2, maxit=3, seed=1)
    assert np.all(np.isfinite(np.asarray(res.W)))
    with pytest.raises(ValueError, match="NaN"):
        rt.svd(A, 2)
