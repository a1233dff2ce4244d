"""Plot-surface smoke tests (reference: test_plotting.R, test_plot_cv.R,
test_plot_consensus.R — 14 blocks).  Every helper must return a savable
matplotlib Figure on the Agg backend.
"""

import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.utils import plots

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)


@pytest.fixture(scope="module")
def fitted():
    rs = np.random.RandomState(3)
    A = np.abs(rs.rand(40, 30)).astype(np.float32)
    return A, rt.nmf(A, 4, seed=1, maxit=20)


def _check_fig(fig, tmp_path, name):
    from matplotlib.figure import Figure
    assert isinstance(fig, Figure)
    fig.savefig(str(tmp_path / f"{name}.png"))
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_loss(fitted, tmp_path):
    _, res = fitted
    _check_fig(plots.plot_loss(res), tmp_path, "loss")


def test_plot_loss_with_test_history(fitted, tmp_path):
    A, _ = fitted
    res = rt.nmf(A, 3, seed=1, maxit=15, test_fraction=0.1, cv_seed=1)
    _check_fig(plots.plot_loss(res), tmp_path, "loss_cv")


def test_plot_cv_table(fitted, tmp_path):
    A, _ = fitted
    rows = rt.nmf(A, [2, 3], seed=1, maxit=8, test_fraction=0.1, cv_seed=1)
    _check_fig(plots.plot_cv(rows), tmp_path, "cv")
    _check_fig(plots.plot_cv(rows, metric="train_mse"), tmp_path, "cv_train")


def test_plot_factor_sparsity(fitted, tmp_path):
    A, _ = fitted
    res = rt.nmf(A, 4, seed=1, maxit=15, L1=(0.0, 0.3))
    _check_fig(plots.plot_factor_sparsity(res), tmp_path, "sparsity")


def test_biplot(fitted, tmp_path):
    _, res = fitted
    _check_fig(plots.biplot(res), tmp_path, "biplot")
    _check_fig(rt.biplot(res, f1=1, f2=2), tmp_path, "biplot_f23")


def test_plot_dclust(tmp_path):
    rs = np.random.RandomState(5)
    centers = rs.rand(4, 8) * 5
    X = np.abs(np.repeat(centers, 25, axis=0)
               + rs.rand(100, 8) * 0.3).astype(np.float32).T
    cl = rt.dclust(X, min_samples=10)
    _check_fig(plots.plot_dclust(cl), tmp_path, "dclust")


def test_plot_consensus(tmp_path):
    rs = np.random.RandomState(6)
    A = np.abs(rs.rand(30, 25)).astype(np.float32)
    cons = rt.consensus_nmf(A, 3, n_runs=3, maxit=10, seed=1)
    _check_fig(plots.plot_consensus(cons), tmp_path, "consensus")


def test_compare_nmf(fitted, tmp_path):
    A, res = fitted
    res2 = rt.nmf(A, 4, seed=2, maxit=20)
    _check_fig(plots.compare_nmf([res, res2], labels=["a", "b"]),
               tmp_path, "compare")
    _check_fig(rt.compare_nmf([res, res2]), tmp_path, "compare_nolab")


def test_plot_convergence(fitted, tmp_path):
    _, res = fitted
    _check_fig(plots.plot_convergence(res), tmp_path, "convergence")


def test_plot_convergence_needs_history():
    from rcppml_tpu.result import NMFResult
    res = NMFResult(W=np.zeros((2, 1), np.float32), d=np.ones(1, np.float32),
                    H=np.zeros((1, 2), np.float32), iterations=1,
                    converged=False, final_tol=0.0, train_loss=0.0,
                    test_loss=float("nan"), best_iter=0,
                    loss_history=[1.0])
    with pytest.raises(ValueError):
        plots.plot_convergence(res)


def test_training_logger_export_and_plot(fitted, tmp_path):
    A, _ = fitted
    logger = rt.training_logger()
    res = rt.nmf(A, 3, seed=1, maxit=12, on_iteration=logger)
    assert len(logger) > 0
    rt.export_log(logger, str(tmp_path / "log.csv"))
    lines = (tmp_path / "log.csv").read_text().strip().splitlines()
    assert len(lines) == len(logger) + 1  # header + rows
    assert "train_loss" in lines[0]
    # loss curves from the logged history
    logger.attach_history(res)
    _check_fig(plots.plot_loss(res), tmp_path, "logged")


def test_export_log_empty_logger(tmp_path):
    logger = rt.training_logger()
    rt.export_log(logger, str(tmp_path / "empty.csv"))
    content = (tmp_path / "empty.csv").read_text()
    assert "train_loss" in content or content.strip() == ""


def test_plot_nmf_dispatcher(tmp_path):
    """plot(model, type=) dispatch incl. regularization annotation
    (R/plot_nmf.R:41-59)."""
    rs = np.random.RandomState(5)
    A = np.abs(rs.rand(40, 30)).astype(np.float32)
    res = rt.nmf(A, 3, seed=1, maxit=15, L1=(0.05, 0.05),
                 track_train_loss=True)
    for t in ("loss", "convergence", "regularization", "sparsity"):
        _check_fig(rt.plot_nmf(res, type=t), tmp_path, f"nmf_{t}")
    with pytest.raises(ValueError):
        rt.plot_nmf(res, type="nope")


def test_plot_exports_top_level():
    for name in ("plot_nmf", "plot_cv", "plot_dclust", "plot_consensus"):
        assert callable(getattr(rt, name))


# ---------------------------------------------------------------------------
# Beyond smoke: content assertions (round-3 VERDICT #9 — "plots beyond
# smoke level"); mirrors test_plot_cv.R's option matrix and
# plot.nmfSummary (R/nmf_plots.R:21-31)
# ---------------------------------------------------------------------------

def test_plot_loss_data_matches_history(fitted, tmp_path):
    _, res = fitted
    fig = plots.plot_loss(res, log=False)
    line = fig.axes[0].lines[0]
    np.testing.assert_allclose(line.get_ydata(),
                               np.asarray(res.loss_history))
    _check_fig(fig, tmp_path, "loss_content")


def test_plot_cv_show_train_series_counts(fitted, tmp_path):
    A, _ = fitted
    rows = rt.nmf(A, [2, 3], seed=1, maxit=8, test_fraction=0.1,
                  cv_seed=[1, 2])
    fig_on = plots.plot_cv(rows, show_train=True)
    fig_off = plots.plot_cv(rows, show_train=False)
    # 2 reps: test+train lines when on, test only when off
    assert len(fig_on.axes[0].lines) == 4
    assert len(fig_off.axes[0].lines) == 2
    # test curve y-data equals the table's test_mse for the first rep
    rep0 = sorted({r["rep"] for r in rows})[0]
    sub = sorted((r for r in rows if r["rep"] == rep0),
                 key=lambda r: r["k"])
    np.testing.assert_allclose(fig_off.axes[0].lines[0].get_ydata(),
                               [r["test_mse"] for r in sub])
    _check_fig(fig_on, tmp_path, "cv_train_on")
    _check_fig(fig_off, tmp_path, "cv_train_off")


def test_plot_consensus_options(tmp_path):
    rs = np.random.RandomState(5)
    n = 30
    labels = np.repeat([0, 1, 2], 10)
    C = 0.2 + 0.6 * (labels[:, None] == labels[None, :])
    C = np.clip(C + rs.normal(0, 0.02, (n, n)), 0, 1)
    C = (C + C.T) / 2
    perm = rs.permutation(n)            # scramble consistently
    out = {"consensus": C[np.ix_(perm, perm)], "labels": labels[perm],
           "cophenetic": 0.9}
    fig_def = plots.plot_consensus(out)
    fig_nr = plots.plot_consensus(out, cluster_rows=False)
    fig_nc = plots.plot_consensus(out, show_clusters=False)
    # clustered view has boundary lines (2 clusters boundaries x2 axes)
    assert len(fig_def.axes[0].lines) == 4
    assert len(fig_nr.axes[0].lines) == 0
    assert len(fig_nc.axes[0].lines) == 0
    # cluster_rows=True reorders into block structure: mean within-block
    # consensus of the displayed image must exceed off-block
    img = fig_def.axes[0].images[0].get_array()
    blk = np.asarray(img[:10, :10]).mean()
    off = np.asarray(img[:10, 20:]).mean()
    assert blk > off + 0.3
    for f, name in ((fig_def, "cons_def"), (fig_nr, "cons_nr"),
                    (fig_nc, "cons_nc")):
        _check_fig(f, tmp_path, name)


def test_plot_summary_stacked_proportions(fitted, tmp_path):
    A, res = fitted
    groups = np.repeat(["a", "b", "c"], 10)
    stats = res.summary(groups)                     # (k, 3)
    fig = plots.plot_summary(stats.T.T, group_names=["a", "b", "c"])
    ax = fig.axes[0]
    # k bars per group, stacked to exactly 1.0 (position='fill')
    k = res.k
    assert len(ax.patches) == 3 * k
    heights = np.zeros(k)
    for p in ax.patches:
        heights[int(round(p.get_x()))] += p.get_height()
    np.testing.assert_allclose(heights, 1.0, atol=1e-6)
    _check_fig(fig, tmp_path, "summary")


def test_plot_regularization_annotation(fitted, tmp_path):
    A, _ = fitted
    res = rt.nmf(A, 3, seed=1, maxit=10, L1=(0.0, 0.2))
    fig = plots.plot_nmf(res, type="regularization")
    title = fig.axes[0].get_title()
    assert "L1" in title
    res0 = rt.nmf(A, 3, seed=1, maxit=10)
    fig0 = plots.plot_nmf(res0, type="regularization")
    assert "No regularization" in fig0.axes[0].get_title()
    _check_fig(fig, tmp_path, "reg")
    _check_fig(fig0, tmp_path, "reg0")
