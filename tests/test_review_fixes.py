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
