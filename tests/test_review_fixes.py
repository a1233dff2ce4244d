"""Regression tests for the round-2 code-review findings: silent
argument drops, CV-holdout/user-mask interaction in SVD, streaming
NaN handling, and back-compat shims.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import rcppml_tpu as rt


@pytest.fixture(scope="module")
def lowrank():
    rs = np.random.RandomState(0)
    return (np.abs(rs.randn(50, 40)) @ np.abs(rs.randn(40, 40)) / 40
            ).astype(np.float32)


# ---------------------------------------------------------------------------
# 1: svd CV holdout must exclude user-masked entries
# ---------------------------------------------------------------------------

def test_svd_cv_holdout_excludes_user_mask(lowrank):
    """Corrupt values hidden behind mask= must not pollute test_loss or
    rank selection (svd/test_entries.hpp skips config-masked entries)."""
    A = lowrank.copy()
    rs = np.random.RandomState(1)
    M = rs.rand(*A.shape) < 0.3
    A[M] = 1e4                      # garbage where masked
    res = rt.svd(A, 5, method="deflation", mask=M, test_fraction=0.2,
                 cv_seed=3, seed=1)
    # if masked entries leaked into the holdout, test_loss would be ~1e8
    assert np.isfinite(res.test_loss)
    assert float(res.test_loss) < 10.0


def test_svd_mask_zeros_without_cv_warns(lowrank):
    A = lowrank.copy()
    A[A < np.median(A)] = 0.0
    with pytest.warns(UserWarning, match="no effect"):
        rt.svd(A, 3, method="deflation", mask="zeros", seed=7)


# ---------------------------------------------------------------------------
# 2/5: seed-list multi-restart
# ---------------------------------------------------------------------------

def test_seed_list_with_rank_sweep_errors(lowrank):
    with pytest.raises(ValueError, match="scalar integer k"):
        rt.nmf(lowrank, [2, 3], seed=[1, 2], test_fraction=0.1, maxit=5)
    with pytest.raises(ValueError, match="scalar integer k"):
        rt.nmf(lowrank, "auto", seed=[1, 2], maxit=5)


def test_seed_list_forwards_callback(lowrank):
    calls = []
    rt.nmf(lowrank, 3, seed=[1, 2], maxit=4,
           on_iteration=lambda *a: calls.append(a))
    assert len(calls) > 0


def test_seed_list_forwards_checkpoint(lowrank, tmp_path):
    """Each restart checkpoints to its own file (a shared path would make
    restart i resume restart i-1's state)."""
    p = str(tmp_path / "ck.npz")
    rt.nmf(lowrank, 3, seed=[1, 2], maxit=6, checkpoint_path=p,
           checkpoint_every=2)
    import os
    assert os.path.exists(str(tmp_path / "ck.restart0.npz"))
    assert os.path.exists(str(tmp_path / "ck.restart1.npz"))


# ---------------------------------------------------------------------------
# 3: streaming NaN/Inf validation
# ---------------------------------------------------------------------------

def test_streaming_dense_nan_automasks(lowrank):
    A = lowrank.copy()
    A[2, 3] = np.nan
    with pytest.warns(UserWarning, match="NA values"):
        res = rt.nmf(A, 3, streaming=True, maxit=5, seed=1)
    assert np.isfinite(np.asarray(res.W)).all()
    assert np.isfinite(float(res.train_loss))


def test_streaming_sparse_nan_errors(lowrank):
    A = lowrank.copy()
    A[1, 1] = np.nan
    S = sp.csc_matrix(A.astype(np.float64))
    with pytest.raises(ValueError, match="NaN"):
        rt.nmf(S, 3, streaming=True, maxit=5, seed=1)


def test_streaming_dense_inf_errors(lowrank):
    A = lowrank.copy()
    A[0, 0] = np.inf
    with pytest.raises(ValueError, match="infinite"):
        rt.nmf(A, 3, streaming=True, maxit=5, seed=1)


def test_spz_nan_panel_errors(lowrank, tmp_path):
    from rcppml_tpu.io.spz import st_write_dense
    A = lowrank.copy()
    A[4, 4] = np.nan
    path = str(tmp_path / "bad.spz")
    st_write_dense(A, path)
    with pytest.raises(ValueError, match="non-finite"):
        rt.nmf(path, 3, maxit=5, seed=1)


# ---------------------------------------------------------------------------
# 6: multi-modal silent drops
# ---------------------------------------------------------------------------

def test_multimodal_rejects_unsupported_args(lowrank):
    A1, A2 = lowrank[:20], lowrank[20:]
    M = np.zeros_like(A1, dtype=bool)
    with pytest.raises(ValueError, match="multi-modal"):
        rt.nmf([A1, A2], 3, mask=M, maxit=5)
    with pytest.raises(ValueError, match="multi-modal"):
        rt.nmf([A1, A2], 3, graph_H=np.eye(40, dtype=np.float32), maxit=5)
    with pytest.raises(ValueError, match="multi-modal"):
        rt.nmf({"a": A1, "b": A2}, 3, mesh=object(), maxit=5)
    # the supported form still works
    res = rt.nmf([A1, A2], 3, maxit=5, seed=1)
    assert res is not None


# ---------------------------------------------------------------------------
# 7: score_test_distribution back-compat shim
# ---------------------------------------------------------------------------

def test_score_test_int_model_shim(lowrank):
    counts = np.round(np.abs(lowrank) * 3).astype(np.float32)
    out = rt.score_test_distribution(counts, 5, maxit=10)
    assert "best" in out or "recommendation" in out or len(out) > 0
    out2 = rt.score_test_distribution(counts, maxit=10)
    assert out2 is not None


# ---------------------------------------------------------------------------
# core CV/IRLS review fixes (round-2 second pass)
# ---------------------------------------------------------------------------

def _zi_counts(seed=3, m=60, n=50, dropout=0.4):
    rs = np.random.RandomState(seed)
    mu = np.abs(rs.rand(m, 4)) @ np.abs(rs.rand(4, n)) * 5
    A = rs.poisson(mu).astype(np.float32)
    drop = rs.rand(m, n) < dropout
    A[drop] = 0.0
    return A


def test_zi_col_per_col_dispersion_uses_fitted_values():
    """NB + zi='col' + dispersion='per_col': the ZI dropout prior must be
    computed from the FITTED per-column dispersion, not the init."""
    A = _zi_counts()
    res = rt.nmf(A, 4, loss="nb", zi="col", dispersion="per_col",
                 maxit=15, seed=1)
    assert res.pi_col is not None
    pi = np.asarray(res.pi_col)
    assert pi.shape == (A.shape[1],)
    assert np.isfinite(pi).all() and (pi > 0).all() and (pi < 1).all()
    # the fitted NB size (theta field) must actually vary per column for
    # the EM to have consumed real values
    assert np.asarray(res.theta).std() > 0


def test_cv_zi_matches_plain_when_mask_empty():
    """A masked ZI fit with an all-False mask runs the CV/masked engine;
    its EM accounting must track the plain engine closely (the
    sparse-trick / theta-floor mismatches made them diverge)."""
    A = _zi_counts(seed=5)
    plain = rt.nmf(A, 3, loss="nb", zi="row", maxit=10, seed=2)
    masked = rt.nmf(A, 3, loss="nb", zi="row", maxit=10, seed=2,
                    mask=np.zeros(A.shape, dtype=bool))
    pr_p = np.asarray(plain.pi_row)
    pr_m = np.asarray(masked.pi_row)
    assert np.abs(pr_p - pr_m).max() < 0.1


def test_downdate_path_noninteger_fraction_parity():
    """use_downdate with test_fraction=0.3 (1/f non-integer): the bound
    must cover the real holdout probability 1/3, keeping the downdate
    path equal to the weighted path."""
    from rcppml_tpu.models.nmf_cv import fit_cv_or_masked
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(300, 40)).astype(np.float32)
    cfg = rt.build_config(4, maxit=8, tol=0.0, seed=7, test_fraction=0.3,
                          cv_seed=11, solver="cholesky", sort_model=False)
    a = fit_cv_or_masked(A, cfg, use_downdate=True)
    b = fit_cv_or_masked(A, cfg, use_downdate=False)
    np.testing.assert_allclose(np.asarray(a.W), np.asarray(b.W),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(a.test_loss), float(b.test_loss),
                               rtol=1e-3)


def test_cv_l1_cd_ratio_threshold_semantics():
    """CD-mode L1 inside the CV engine uses the per-coordinate ratio
    threshold, matching the plain engine: an empty-mask L1 CD fit equals
    the unmasked fit's sparsity behavior."""
    rs = np.random.RandomState(1)
    A = np.abs(rs.rand(50, 40)).astype(np.float32)
    plain = rt.nmf(A, 3, L1=(0.0, 0.2), solver="cd", maxit=12, seed=3,
                   norm="none")
    masked = rt.nmf(A, 3, L1=(0.0, 0.2), solver="cd", maxit=12, seed=3,
                    norm="none", mask=np.zeros(A.shape, dtype=bool))
    sp_p = (np.asarray(plain.H) == 0).mean()
    sp_m = (np.asarray(masked.H) == 0).mean()
    assert abs(sp_p - sp_m) < 0.1


# ---------------------------------------------------------------------------
# round-2 session-4 review fixes (SVD gateway / deflation / graph / checkpoint)
# ---------------------------------------------------------------------------

def _lowrank(m=40, n=30, k=3, seed=0):
    rs = np.random.RandomState(seed)
    return (np.abs(rs.rand(m, k)) @ np.abs(rs.rand(k, n))).astype(np.float32)


def test_svd_upper_bound_only_routes_to_constrained_solver():
    """upper_bound alone must count as a constraint: auto-select routes to a
    constraint-honoring method and the bound holds in the result."""
    import rcppml_tpu as rt
    A = _lowrank()
    res = rt.svd(A, 10, upper_bound=(0.05, 0.05))
    assert res.misc["method"] in ("krylov", "deflation")
    assert np.all(np.asarray(res.U) <= 0.05 + 1e-6)
    assert np.all(np.asarray(res.V) <= 0.05 + 1e-6)


def test_svd_explicit_method_warns_on_dropped_constraints():
    """Explicit lanczos/irlba/randomized with elementwise constraints must
    warn (streaming gateway parity), not silently drop them."""
    import warnings
    import rcppml_tpu as rt
    A = _lowrank()
    for meth in ("lanczos", "irlba", "randomized"):
        with pytest.warns(UserWarning, match="does not support"):
            rt.svd(A, 4, nonneg=(True, True), method=meth)
    with pytest.warns(UserWarning, match="robust"):
        rt.svd(A, 4, method="krylov", robust=True)


def test_svd_deflation_upper_bound_survives_gram_schmidt():
    """A bound-only deflation fit must skip the post-ALS Gram-Schmidt:
    re-mixing against prior factors would undo the clip projection applied
    every ALS iteration.  (The bound itself acts on the pre-normalization
    update, reference deflation.hpp:236-237,738 — unit-norm factors may
    legitimately exceed it after scaling.)

    Observable: the clip flattens factors, so consecutive factors stay
    strongly correlated; GS would force them orthogonal to ~1e-8."""
    import rcppml_tpu as rt
    A = _lowrank(60, 50, 4, seed=3)
    res = rt.svd(A, 4, method="deflation", upper_bound=(0.08, 0.08))
    U = np.asarray(res.U)
    UU = U.T @ U
    offdiag = np.max(np.abs(UU - np.diag(np.diag(UU))))
    assert offdiag > 0.01, "bound-constrained factors were orthogonalized"
    # unconstrained factors from the same data ARE orthogonalized
    res2 = rt.svd(A, 4, method="deflation")
    U2 = np.asarray(res2.U)
    UU2 = U2.T @ U2
    assert np.max(np.abs(UU2 - np.diag(np.diag(UU2)))) < 1e-5


def test_pca_sparse_and_result_sdev():
    """pca() accepts scipy.sparse (np.asarray(sparse) is 0-d; must use the
    native shape) and sdev uses n-1."""
    import scipy.sparse as sp
    import rcppml_tpu as rt
    A = _lowrank(50, 40, 4, seed=1)
    As = sp.csr_matrix(A)
    res = rt.pca(As, 3)
    assert res.misc["sdev"].shape == (3,)
    dense = rt.pca(A, 3)
    np.testing.assert_allclose(res.misc["sdev"], dense.misc["sdev"],
                               rtol=1e-4)


def test_single_layer_condition_covariates_used():
    """Single-layer factor_net with a Condition input must append the Z
    covariates (multi-layer and single-layer paths agree on shapes)."""
    from rcppml_tpu.models.graph import (Condition, Input, NMFLayer,
                                         factor_net, fit)
    A = _lowrank(30, 25, 3, seed=5)
    Z = np.abs(np.random.RandomState(7).rand(30, 4)).astype(np.float32)
    inp = Input(A, "x")
    net = factor_net(inp, NMFLayer(Condition(inp, Z), 3, name="L1"),
                     maxit=10, seed=1)
    res = fit(net)
    # Z appends 4 covariate columns -> H spans n + 4 samples
    assert res["L1"].H.shape == (3, 25 + 4)


def test_branched_graph_predict_refuses():
    """predict() on an Add/branched net raises instead of silently chaining
    embeddings through the wrong layers."""
    from rcppml_tpu.models.graph import (Add, Input, NMFLayer, factor_net,
                                         fit)
    A1 = _lowrank(30, 25, 3, seed=8)
    A2 = _lowrank(20, 25, 3, seed=9)
    i1, i2 = Input(A1, "a"), Input(A2, "b")
    l1 = NMFLayer(i1, 3, name="L1")
    l2 = NMFLayer(i2, 3, name="L2")
    top = NMFLayer(Add(l1, l2), 2, name="top")
    net = factor_net([i1, i2], top, maxit=6, seed=1)
    res = fit(net)
    assert not res.chain_topology
    with pytest.raises(ValueError, match="chain"):
        res.predict(A1)


def test_chain_graph_predict_still_works():
    from rcppml_tpu.models.graph import (Input, NMFLayer, factor_net, fit)
    A = _lowrank(30, 25, 3, seed=11)
    inp = Input(A, "x")
    l1 = NMFLayer(inp, 4, name="L1")
    l2 = NMFLayer(l1, 2, name="L2")
    net = factor_net(inp, l2, maxit=6, seed=1)
    res = fit(net)
    assert res.chain_topology
    out = res.predict(A)
    assert out["L1"].shape[0] == 4 and out["L2"].shape[0] == 2


def test_checkpoint_resume_with_smaller_maxit(tmp_path):
    """Resuming with a smaller (but still >= it) maxit must reparse the
    packed state correctly instead of reading scalars out of the middle of
    the stored loss history."""
    import os
    from rcppml_tpu.api import build_config
    from rcppml_tpu.utils.checkpoint import fit_checkpointed, load_fit_state
    rs = np.random.RandomState(13)
    # noise floor so the rel-tol convergence rule actually fires
    A = (np.abs(rs.rand(40, 3)) @ np.abs(rs.rand(3, 30))
         + 0.3 * rs.rand(40, 30)).astype(np.float32)
    path = str(tmp_path / "ck.npz")
    cfg100 = build_config(3, maxit=100, tol=5e-3, seed=4)
    res100 = fit_checkpointed(A, cfg100, path, every=5)
    assert os.path.exists(path)
    it_stored = res100.iterations
    assert it_stored < 60          # converged well before the horizon
    # smaller maxit (>= stored it): hist must be truncated to the new
    # horizon so the packed-state layout parses correctly
    cfg60 = build_config(3, maxit=60, tol=5e-3, seed=4)
    st = load_fit_state(path, cfg60)
    assert st.loss_hist.shape == (60,)
    assert int(st.it) == it_stored
    res60 = fit_checkpointed(A, cfg60, path, every=7)
    np.testing.assert_array_equal(np.asarray(res60.W),
                                  np.asarray(res100.W))
    # shrinking below the stored iteration count is still rejected
    cfg_small = build_config(3, maxit=max(1, it_stored - 1),
                             tol=5e-3, seed=4)
    with pytest.raises(ValueError, match="maxit"):
        load_fit_state(path, cfg_small)


# ---------------------------------------------------------------------------
# round-2 session-4 review fixes, batch 2 (chunked / rank_cv / clustering /
# project)
# ---------------------------------------------------------------------------

def test_streaming_cv_user_mask_test_loss_pure_holdout():
    """Streaming CV + user mask: the test statistic must exclude
    user-masked entries (in-memory parity; fit_cv.hpp:1391-1393)."""
    rs = np.random.RandomState(2)
    A = (np.abs(rs.rand(60, 3)) @ np.abs(rs.rand(3, 50))).astype(np.float32)
    M = rs.rand(*A.shape) < 0.25
    A_bad = A.copy()
    A_bad[M] = 50.0                 # garbage behind the mask
    mem = rt.nmf(A_bad, 3, test_fraction=0.1, cv_seed=5, mask=M,
                 maxit=8, seed=3, tol=0)
    stream = rt.nmf(A_bad, 3, test_fraction=0.1, cv_seed=5, mask=M,
                    maxit=8, seed=3, tol=0, streaming=True, chunk_cols=16)
    # garbage entries are ~2500x the data scale: any leak into the test
    # statistic dominates it
    assert float(stream.test_loss) < 5.0
    assert abs(float(stream.test_loss) - float(mem.test_loss)) \
        / max(float(mem.test_loss), 1e-9) < 0.05


def test_streaming_masked_upper_bound_enforced():
    rs = np.random.RandomState(4)
    A = (np.abs(rs.rand(40, 3)) @ np.abs(rs.rand(3, 30))).astype(np.float32)
    M = rs.rand(*A.shape) < 0.2
    res = rt.nmf(A, 3, mask=M, upper_bound=(0.5, 0.5), maxit=6, seed=1,
                 streaming=True, chunk_cols=8)
    assert np.all(np.asarray(res.W) <= 0.5 + 1e-6)
    assert np.all(np.asarray(res.H) <= 0.5 + 1e-6)


def test_streaming_irls_upper_bound_enforced():
    rs = np.random.RandomState(6)
    A = np.round(np.abs(rs.rand(40, 3)) @ np.abs(rs.rand(3, 30)) * 4
                 ).astype(np.float32)
    res = rt.nmf(A, 3, loss="kl", upper_bound=(0.5, 0.5), maxit=5, seed=1,
                 streaming=True, chunk_cols=8)
    assert np.all(np.asarray(res.W) <= 0.5 + 1e-6)
    assert np.all(np.asarray(res.H) <= 0.5 + 1e-6)


def test_streaming_masked_l21_has_effect():
    rs = np.random.RandomState(8)
    A = (np.abs(rs.rand(50, 6)) @ np.abs(rs.rand(6, 40))).astype(np.float32)
    M = rs.rand(*A.shape) < 0.15
    base = rt.nmf(A, 6, mask=M, maxit=8, seed=2, streaming=True,
                  chunk_cols=10)
    reg = rt.nmf(A, 6, mask=M, L21=(3.0, 3.0), maxit=8, seed=2,
                 streaming=True, chunk_cols=10)
    assert not np.allclose(np.asarray(base.H), np.asarray(reg.H))


def test_rank_search_mask_excludes_corrupt_entries():
    """find_optimal_rank(mask=M) must hold M out of every rank-search fit,
    not only the final refit."""
    from rcppml_tpu.models.rank_cv import find_optimal_rank
    rs = np.random.RandomState(10)
    A = (np.abs(rs.rand(60, 4)) @ np.abs(rs.rand(4, 50))
         + 0.05 * rs.rand(60, 50)).astype(np.float32)
    M = rs.rand(*A.shape) < 0.2
    A_bad = A.copy()
    A_bad[M] = 100.0
    search = find_optimal_rank(A_bad, k_init=2, max_k=8, mask=M,
                               test_fraction=0.1, cv_seed=3, refit=False,
                               maxit=10, seed=1)
    for ev in search["evaluations"]:
        # with the mask honored, train losses live at the data scale;
        # a leak of the 100.0 entries puts them ~3 orders higher
        assert ev["train"] < 5.0


def test_evaluate_nb_uses_fitted_theta():
    A = _zi_counts(seed=21, dropout=0.1)
    model = rt.nmf(A, 4, loss="nb", maxit=12, seed=3)
    from rcppml_tpu.models.project import evaluate
    val = evaluate(model, A, loss="nb")
    assert np.isfinite(val)
    # with theta=0 (the old bug) lgamma(1e-10) ~ +23 pushes the mean NLL
    # above 20 regardless of fit quality
    assert val < 20.0


def test_bipartition_dclust_accept_sparse():
    rs = np.random.RandomState(12)
    A = np.abs(rs.rand(30, 80)).astype(np.float32)
    A[:15, :40] += 2.0               # two blobs
    S = sp.csr_matrix(A)
    bp = rt.bipartition(S, seed=1)
    assert bp.size1 + bp.size2 == 80
    cl = rt.dclust(S, min_samples=30, seed=1)
    assert len(cl) >= 1


def test_bipartition_nonneg_false_unconstrained():
    rs = np.random.RandomState(14)
    A = rs.randn(20, 40).astype(np.float32)      # signed data
    b1 = rt.bipartition(A, nonneg=True, seed=2)
    b2 = rt.bipartition(A, nonneg=False, seed=2)
    # the solves genuinely differ on signed data
    assert not np.allclose(b1.v, b2.v)


def test_predict_explicit_zero_overrides_stored_penalty():
    rs = np.random.RandomState(16)
    A = (np.abs(rs.rand(40, 3)) @ np.abs(rs.rand(3, 30))).astype(np.float32)
    model = rt.nmf(A, 3, L1=(0.0, 0.4), maxit=10, seed=2)
    from rcppml_tpu.models.project import predict
    h_pen = predict(model, A)                    # stored L1=0.4 applies
    h_free = predict(model, A, L1=0.0)           # explicit zero wins
    assert not np.allclose(h_pen, h_free)
    assert float(np.abs(h_free).sum()) >= float(np.abs(h_pen).sum())


def test_nnls_l21_applied():
    rs = np.random.RandomState(18)
    W = np.abs(rs.rand(40, 6)).astype(np.float32)
    A = (W @ np.abs(rs.rand(6, 30))).astype(np.float32)
    h0 = rt.nnls(A, w=W)
    h1 = rt.nnls(A, w=W, L21=5.0)
    assert not np.allclose(h0, h1)


# ---------------------------------------------------------------------------
# round-2 session-4 review fixes, batch 3 (io / metrics / guided /
# diagnostics)
# ---------------------------------------------------------------------------

def test_st_read_device_v3_dense(tmp_path):
    """st_read_device must handle v3 files (st_read_auto returns a dense
    ndarray there, not scipy)."""
    from rcppml_tpu.io.spz import st_write_dense, st_read_device
    rs = np.random.RandomState(1)
    A = rs.rand(20, 15).astype(np.float32)
    path = str(tmp_path / "a.spz")
    st_write_dense(A, path)
    dev = st_read_device(path)
    np.testing.assert_allclose(np.asarray(dev), A, rtol=1e-6)
    devT = st_read_device(path, transpose=True)
    np.testing.assert_allclose(np.asarray(devT), A.T, rtol=1e-6)


def test_st_add_transpose_preserves_encoding(tmp_path):
    """Re-encoding for the transpose stream must keep the original
    value_type (v2) / codec (v3), not silently revert to defaults."""
    from rcppml_tpu.io import spz as spz_mod
    rs = np.random.RandomState(2)
    A = sp.random(40, 30, density=0.2, random_state=3, format="csc",
                  dtype=np.float64)
    A.data = np.round(A.data * 100)
    path = str(tmp_path / "v2.spz")
    spz_mod.st_write(A, path, value_type="uint16", with_transpose=False)
    spz_mod.st_add_transpose(path)
    info = spz_mod.st_info(path)
    assert info["value_type"] == "uint16"
    assert info["has_transpose"]
    # v3: fp16 codec survives
    D = rs.rand(20, 25).astype(np.float32)
    p3 = str(tmp_path / "v3.spz")
    spz_mod.st_write_dense(D, p3, codec="fp16", with_transpose=False)
    size_before = __import__("os").path.getsize(p3)
    spz_mod.st_add_transpose(p3)
    size_after = __import__("os").path.getsize(p3)
    # raw re-encode would be ~2x fp16 (plus the transpose stream doubles
    # payload); with the codec kept, size stays within ~2.6x
    assert size_after < 2.6 * size_before
    out = spz_mod.st_read_dense(p3, transpose=True)
    np.testing.assert_allclose(out, D.T, rtol=2e-3, atol=2e-3)


def test_assess_single_metric_string():
    from rcppml_tpu.utils.metrics import assess
    rs = np.random.RandomState(4)
    X = np.vstack([rs.randn(40, 5), rs.randn(40, 5) + 3.0])
    y = np.repeat([0, 1], 40)
    out = assess(X, y, metrics="ari")
    assert "ari" in out
    with pytest.raises(ValueError, match="unknown metrics"):
        assess(X, y, metrics=["silhouete"])
    with pytest.raises(ValueError, match="batch"):
        assess(X, y, metrics="batch_mixing")


def test_refine_matrix_input_runs_cycles():
    """refine(H_matrix, labels, data=A, cycles=2) must run the refit
    cycles (they were silently skipped for non-model inputs)."""
    from rcppml_tpu.utils.guided import refine
    rs = np.random.RandomState(6)
    W = np.abs(rs.rand(30, 4)); Ht = np.abs(rs.rand(4, 50))
    A = (W @ Ht).astype(np.float32)
    y = rs.randint(0, 3, 50)
    h_only = refine(Ht.astype(np.float32), y, cycles=0)
    h_cyc = refine(Ht.astype(np.float32), y, data=A, cycles=2)
    assert h_cyc.shape == Ht.shape
    assert not np.allclose(h_only, h_cyc)


def test_refine_batch_without_cycles_errors():
    from rcppml_tpu.utils.guided import refine
    rs = np.random.RandomState(8)
    Ht = np.abs(rs.rand(3, 40)).astype(np.float32)
    y = rs.randint(0, 2, 40)
    b = rs.randint(0, 2, 40)
    with pytest.raises(ValueError, match="cycles"):
        refine(Ht, y, batch=b)


def test_auto_distribution_sparse_uses_dense_entry_count():
    """Default sparse fits densify and the SSE spans m*n entries; the
    Gaussian-NLL conversion must use m*n, not nnz."""
    from rcppml_tpu.utils.diagnostics import auto_nmf_distribution
    rs = np.random.RandomState(10)
    dense = (np.abs(rs.rand(40, 3)) @ np.abs(rs.rand(3, 30))).astype(np.float32)
    dense[dense < np.percentile(dense, 60)] = 0.0
    S = sp.csc_matrix(dense)
    out_sp = auto_nmf_distribution(S, 3, distributions=("mse",), maxit=10,
                                   seed=1)
    out_de = auto_nmf_distribution(dense, 3, distributions=("mse",),
                                   maxit=10, seed=1)
    nll_sp = out_sp["comparison"][0]["nll"]
    nll_de = out_de["comparison"][0]["nll"]
    assert abs(nll_sp - nll_de) / max(abs(nll_de), 1e-9) < 1e-6
