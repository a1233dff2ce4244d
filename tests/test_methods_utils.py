"""cosine / evaluate / mse / compute_target / bipartite_match utilities —
mirrors test_cosine.R, test_evaluate.R, test_compute_target.R,
test_bipartiteMatch.R."""
import numpy as np
import pytest
import scipy.sparse as sp

import rcppml_tpu as rt
from rcppml_tpu.models.clustering import bipartite_match
from rcppml_tpu.models.project import evaluate, mse
from rcppml_tpu.utils.guided import compute_target
from rcppml_tpu.utils.metrics import cosine


def test_cosine_self_identity_diag():
    # test_cosine.R:5-19
    A = np.abs(np.random.RandomState(0).rand(10, 4))
    C = cosine(A)
    np.testing.assert_allclose(np.diag(C), 1.0, atol=1e-12)
    assert C.shape == (4, 4)


def test_cosine_two_matrices_and_sparse():
    # test_cosine.R:21-33,72-82
    rs = np.random.RandomState(1)
    A = np.abs(rs.rand(12, 3))
    B = np.abs(rs.rand(12, 5))
    C = cosine(A, B)
    assert C.shape == (3, 5)
    assert np.all(C >= -1e-12) and np.all(C <= 1 + 1e-12)
    Cs = cosine(sp.csc_matrix(A), sp.csc_matrix(B))
    np.testing.assert_allclose(Cs, C, atol=1e-12)


def test_cosine_vectors():
    # test_cosine.R:35-70
    rs = np.random.RandomState(2)
    A = np.abs(rs.rand(12, 3))
    v = np.abs(rs.rand(12))
    assert cosine(A, v).shape in ((3, 1), (3,))
    assert cosine(v, A).shape in ((1, 3), (3,))
    c = np.asarray(cosine(v, v)).ravel()
    assert c.shape == (1,) and abs(float(c[0]) - 1.0) < 1e-12
    with pytest.raises(ValueError):
        cosine(v)               # vector with y=NULL errors (R:84)


def test_evaluate_losses_and_mse_wrapper():
    # test_evaluate.R:5-44,80-105
    rs = np.random.RandomState(3)
    A = np.abs(rs.rand(30, 20)).astype(np.float32)
    m1 = rt.nmf(A, 3, maxit=40, seed=1, tol=1e-6)
    val = evaluate(m1, A)
    assert np.isfinite(val) and val >= 0
    assert mse(m1, A) == pytest.approx(val, rel=1e-6)
    for loss in ("gp", "gamma"):
        assert np.isfinite(evaluate(m1, A + 0.01, loss=loss))
    # better model (higher k, more iters) has lower MSE (R:107)
    m0 = rt.nmf(A, 1, maxit=3, seed=1)
    assert evaluate(m1, A) < evaluate(m0, A)


def test_evaluate_mask_options():
    # test_evaluate.R:45-79
    rs = np.random.RandomState(4)
    A = np.abs(rs.rand(25, 18)).astype(np.float32)
    A[rs.rand(*A.shape) < 0.3] = 0
    m = rt.nmf(A, 3, maxit=20, seed=1)
    full = evaluate(m, A)
    nz = evaluate(m, A, mask_zeros=True)
    assert np.isfinite(nz) and nz != full
    mask = rs.rand(*A.shape) < 0.2
    assert np.isfinite(evaluate(m, A, mask=mask))
    assert np.isfinite(evaluate(m, A, mask=mask, missing_only=True))
    with pytest.raises(ValueError, match="mask"):
        evaluate(m, A, missing_only=True)


def test_compute_target_basic():
    # test_compute_target.R:3-37
    rs = np.random.RandomState(5)
    H = np.abs(rs.rand(4, 30))
    labels = np.array(["a", "b", "c"] * 10)
    T = compute_target(H, labels, whiten=False)
    assert T.shape == (4, 30)
    Tw = compute_target(H, labels, whiten=True)
    assert np.all(np.isfinite(Tw))
    # same-class columns share a target column
    np.testing.assert_allclose(T[:, 0], T[:, 3])


def test_compute_target_single_class_zero():
    # test_compute_target.R:54-63
    H = np.abs(np.random.RandomState(6).rand(3, 12))
    T = compute_target(H, np.array(["x"] * 12), whiten=False)
    np.testing.assert_allclose(T, 0.0, atol=1e-10)


def test_compute_target_dim_mismatch():
    # test_compute_target.R:65+
    H = np.abs(np.random.RandomState(7).rand(3, 12))
    with pytest.raises(ValueError, match="labels"):
        compute_target(H, np.array(["x"] * 5))


def test_bipartite_match_optimality():
    # test_bipartiteMatch.R — Hungarian finds the zero-cost assignment
    C = np.array([[0.0, 5, 5], [5, 0.0, 5], [5, 5, 0.0]])
    out = bipartite_match(C)
    assert out["cost"] == 0.0
    np.testing.assert_array_equal(out["pairs"][:, 0], out["pairs"][:, 1])
    # rectangular cost
    C2 = np.abs(np.random.RandomState(8).rand(3, 5))
    out2 = bipartite_match(C2)
    assert len(out2["pairs"]) == 3


def test_nmf_result_method_roundtrips():
    """t(t(x)) identity, sort(decreasing=False), head, prod
    (test_s4_methods.R:38-96,171-181)."""
    rs = np.random.RandomState(9)
    A = np.abs(rs.rand(20, 15)).astype(np.float32)
    res = rt.nmf(A, 4, maxit=10, seed=1)
    tt = res.t().t()
    np.testing.assert_array_equal(np.asarray(tt.W), np.asarray(res.W))
    asc = rt.nmf(A, 4, maxit=10, seed=1).sort(decreasing=False)
    d = np.asarray(asc.d)
    assert np.all(np.diff(d) >= -1e-7)
    assert res.head(3).shape == (3, 4)
    np.testing.assert_allclose(res.prod(), res.reconstruct())


# ---------------------------------------------------------------------------
# Granular S4-method matrix (test_s4_methods.R, 22 blocks)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def s4_model():
    rs = np.random.RandomState(11)
    A = np.abs(rs.rand(20, 15)).astype(np.float32)
    return A, rt.nmf(A, 4, maxit=10, seed=1)


def test_t_transposes_w_and_h(s4_model):
    _, res = s4_model
    tt = res.t()
    np.testing.assert_array_equal(np.asarray(tt.W), np.asarray(res.H).T)
    np.testing.assert_array_equal(np.asarray(tt.H), np.asarray(res.W).T)
    np.testing.assert_array_equal(np.asarray(tt.d), np.asarray(res.d))


def test_t_preserves_misc(s4_model):
    A, _ = s4_model
    res = rt.nmf(A, 4, maxit=5, seed=1)   # fresh fit: don't mutate the
    res.misc["tag"] = 123                 # module-scoped fixture's misc
    assert res.t().misc.get("tag") == 123


def test_t_carries_typed_state():
    rs = np.random.RandomState(12)
    counts = rs.poisson(2.0, (25, 20)).astype(np.float32)
    res = rt.nmf(counts, 3, maxit=4, seed=1, loss="nb", zi="row")
    tt = res.t()
    assert tt.theta is not None
    np.testing.assert_array_equal(np.asarray(tt.pi_col),
                                  np.asarray(res.pi_row))
    assert tt.test_loss == res.test_loss or (
        np.isnan(tt.test_loss) and np.isnan(res.test_loss))


def test_sort_reorders_by_decreasing_d(s4_model):
    A, _ = s4_model
    res = rt.nmf(A, 4, maxit=10, seed=1, sort_model=False).sort()
    d = np.asarray(res.d)
    assert np.all(np.diff(d) <= 1e-7)
    rec = res.reconstruct()
    base = rt.nmf(A, 4, maxit=10, seed=1, sort_model=False).reconstruct()
    np.testing.assert_allclose(rec, base, rtol=1e-6)   # sort is a relabel


def test_prod_dims_and_value(s4_model):
    A, res = s4_model
    P = res.prod()
    assert P.shape == A.shape
    np.testing.assert_allclose(
        P, np.asarray(res.W) * np.asarray(res.d)[None, :] @ np.asarray(res.H),
        rtol=1e-6)


def test_getitem_factor_subset(s4_model):
    _, res = s4_model
    sub = res[[0, 2]]
    assert sub.k == 2
    np.testing.assert_array_equal(np.asarray(sub.W),
                                  np.asarray(res.W)[:, [0, 2]])
    np.testing.assert_array_equal(np.asarray(sub.H),
                                  np.asarray(res.H)[[0, 2], :])


def test_subset_rows_cols(s4_model):
    _, res = s4_model
    sub = res.subset(rows=range(5), cols=range(7))
    assert sub.W.shape == (5, res.k)
    assert sub.H.shape == (res.k, 7)


def test_dim_and_shape(s4_model):
    A, res = s4_model
    assert res.shape == A.shape
    assert res.k == 4


def test_head_and_repr(s4_model):
    _, res = s4_model
    assert res.head(3).shape == (3, 4)
    s = repr(res)
    assert "k=4" in s and "converged" in s


def test_sparsity_per_factor_structure(s4_model):
    """Reference data.frame shape (test_s4_methods.R:183-191): one row per
    factor per side, values in [0, 1], model in {w, h}."""
    A, _ = s4_model
    res = rt.nmf(A, 4, maxit=10, seed=1, L1=(0.0, 0.3), sort_model=False)
    sp = res.sparsity()
    assert len(sp["factor"]) == 8 and len(sp["sparsity"]) == 8
    assert set(sp["model"]) == {"w", "h"}
    assert all(0.0 <= v <= 1.0 for v in sp["sparsity"])
    # aggregates consistent with the per-factor values
    h_vals = [v for v, m in zip(sp["sparsity"], sp["model"]) if m == "h"]
    np.testing.assert_allclose(np.mean(h_vals), sp["H"], atol=1e-9)
