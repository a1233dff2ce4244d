"""Degenerate / edge-case matrix inputs.

Mirrors the reference suite tests/testthat/test_degenerate_inputs.R
(single row/column, k > min(m, n), 2x2, near-zero, identical rows or
columns, >99%-sparse) plus the t() model method from
test_s4_methods.R:38-45.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import rcppml_tpu as rt


def _recon(res):
    return np.asarray(res.W) @ np.diag(np.asarray(res.d)) @ np.asarray(res.H)


def test_single_column_sparse():
    # test_degenerate_inputs.R:5-13
    A = sp.csc_matrix((np.array([1.0, 2.0, 3.0]),
                       (np.array([0, 2, 4]), np.array([0, 0, 0]))),
                      shape=(5, 1))
    res = rt.nmf(A, 1, maxit=10, seed=42)
    assert res.W.shape == (5, 1)
    assert res.H.shape == (1, 1)
    assert np.all(np.isfinite(_recon(res)))


def test_single_row_sparse():
    # test_degenerate_inputs.R:15-22
    A = sp.csc_matrix((np.array([1.0, 2.0, 3.0]),
                       (np.array([0, 0, 0]), np.array([0, 2, 4]))),
                      shape=(1, 5))
    res = rt.nmf(A, 1, maxit=10, seed=42)
    assert res.W.shape == (1, 1)
    assert res.H.shape == (1, 5)


def test_single_column_dense():
    # test_degenerate_inputs.R:24-30
    A = np.array([[1.0], [0.0], [2.0], [0.0], [3.0]])
    res = rt.nmf(A, 1, maxit=10, seed=42)
    assert res.W.shape == (5, 1) and res.H.shape == (1, 1)


def test_single_row_dense():
    # test_degenerate_inputs.R:32-38
    A = np.array([[1.0, 0.0, 2.0, 0.0, 3.0]])
    res = rt.nmf(A, 1, maxit=10, seed=42)
    assert res.W.shape == (1, 1) and res.H.shape == (1, 5)


def test_k_larger_than_min_dim():
    # test_degenerate_inputs.R:65-73 — erroring is acceptable; crashing
    # or non-finite output is not.
    rs = np.random.RandomState(0)
    A = rs.rand(3, 4)
    try:
        res = rt.nmf(A, 5, maxit=5, seed=42)
    except ValueError:
        return
    assert np.all(np.isfinite(np.asarray(res.W)))


def test_2x2_matrix():
    # test_degenerate_inputs.R:75-81
    A = np.array([[1.0, 3.0], [2.0, 4.0]])
    res = rt.nmf(A, 1, maxit=20, seed=42)
    assert res.W.shape == (2, 1) and res.H.shape == (1, 2)
    rel = np.linalg.norm(A - _recon(res)) / np.linalg.norm(A)
    assert rel < 0.1  # rank-1 SVD error of this matrix is ~0.02


def test_square_k_min_minus_one():
    # test_degenerate_inputs.R:83-88
    rs = np.random.RandomState(1)
    A = rs.rand(5, 5)
    res = rt.nmf(A, 4, maxit=20, seed=42)
    assert res.W.shape == (5, 4)


def test_near_zero_matrix_finite():
    # test_degenerate_inputs.R:90-98
    A = np.full((5, 4), 1e-15, dtype=np.float64)
    A[0, 0] = 1e-10
    res = rt.nmf(A, 2, maxit=20, seed=42)
    assert np.all(np.isfinite(np.asarray(res.W)))
    assert np.all(np.isfinite(np.asarray(res.H)))
    assert np.all(np.isfinite(np.asarray(res.d)))


def test_identical_columns_rank1():
    # test_degenerate_inputs.R:100-109 — identical columns must be
    # captured almost exactly by a rank-1 model.
    col = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    A = np.tile(col[:, None], (1, 4))
    res = rt.nmf(A, 1, maxit=20, seed=42)
    rel = np.linalg.norm(A - _recon(res)) / np.linalg.norm(A)
    assert rel < 0.01


def test_identical_rows():
    # test_degenerate_inputs.R:111-117
    row = np.array([1.0, 2.0, 3.0, 4.0])
    A = np.tile(row[None, :], (5, 1))
    res = rt.nmf(A, 1, maxit=20, seed=42)
    rel = np.linalg.norm(A - _recon(res)) / np.linalg.norm(A)
    assert rel < 0.01


def test_very_sparse_matrix():
    # test_degenerate_inputs.R:119-126 — >99% zeros
    rs = np.random.RandomState(42)
    A = sp.random(100, 50, density=0.005, random_state=rs, format="csc")
    A.data = np.abs(A.data)
    res = rt.nmf(A, 3, maxit=20, seed=42)
    assert res.W.shape == (100, 3)
    assert np.all(np.isfinite(np.asarray(res.W)))


def test_model_transpose_method():
    # test_s4_methods.R:38-45 — t() swaps w and h, keeps d.
    rs = np.random.RandomState(3)
    A = np.abs(rs.rand(12, 9))
    res = rt.nmf(A, 3, maxit=10, seed=42)
    tres = res.t()
    np.testing.assert_array_equal(np.asarray(tres.W),
                                  np.asarray(res.H).T)
    np.testing.assert_array_equal(np.asarray(tres.H),
                                  np.asarray(res.W).T)
    np.testing.assert_array_equal(np.asarray(tres.d), np.asarray(res.d))


def test_transpose_identical_fixture_fit():
    # R/random.R:110-118 — r_matrix(transpose_identical=) pairs; a fit
    # of A and of A.T must describe the same data (equal best
    # reconstruction error) even though factor roles swap.
    from rcppml_tpu.rng import r_matrix
    A1 = r_matrix(30, 80, seed=11, transpose_identical=True)
    A2 = r_matrix(80, 30, seed=11, transpose_identical=True)
    np.testing.assert_array_equal(A1, A2.T)
    r1 = rt.nmf(A1, 4, maxit=50, seed=42, tol=1e-8)
    r2 = rt.nmf(A2, 4, maxit=50, seed=42, tol=1e-8)
    e1 = np.linalg.norm(A1 - _recon(r1))
    e2 = np.linalg.norm(A2 - _recon(r2))
    assert e1 == pytest.approx(e2, rel=0.02)
