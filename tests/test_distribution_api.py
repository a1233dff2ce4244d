"""Distribution API behaviors (reference: test_distribution_api.R, 46
blocks): gamma / inverse-Gaussian dispersion modes, robust composition
with every IRLS loss, Tweedie power special cases, the power-family
score test, and the standalone auto-selection helpers.
"""

import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.utils.diagnostics import (auto_nmf_distribution,
                                          diagnose_zero_inflation,
                                          score_test_distribution)
from rcppml_tpu.utils.simulate import simulate_counts


def simulate_gamma(m, n, k, seed=0, phi=0.5):
    """A ~ Gamma(shape=1/phi, scale=mu*phi) so E[A]=mu, Var=phi*mu^2."""
    rs = np.random.RandomState(seed)
    W = rs.gamma(2.0, 1.0, (m, k))
    H = rs.gamma(2.0, 1.0, (k, n))
    mu = W @ H
    A = rs.gamma(1.0 / phi, mu * phi).astype(np.float32)
    return {"A": np.maximum(A, 1e-3), "W": W, "H": H, "mu": mu}


@pytest.fixture(scope="module")
def gamma_data():
    return simulate_gamma(50, 40, 2, seed=123)


# ---------------------------------------------------------------------------
# Dispersion estimation modes (test_distribution_api.R:134-192)
# ---------------------------------------------------------------------------

def test_gamma_dispersion_per_row(gamma_data):
    res = rt.nmf(gamma_data["A"], 2, loss="gamma", dispersion="per_row",
                 maxit=30, tol=1e-6, seed=123)
    disp = np.asarray(res.dispersion)
    assert disp.shape == (50,)
    assert (disp > 0).all()
    # simulated phi = 0.5: estimates within a decade
    assert 0.05 < np.median(disp) < 5.0


def test_invgauss_dispersion_per_row(gamma_data):
    res = rt.nmf(gamma_data["A"], 2, loss="inverse_gaussian",
                 dispersion="per_row", maxit=30, tol=1e-6, seed=123)
    disp = np.asarray(res.dispersion)
    assert disp.shape == (50,)
    assert (disp > 0).all()


def test_gamma_dispersion_per_col():
    sim = simulate_gamma(40, 30, 2, seed=123)
    res = rt.nmf(sim["A"], 2, loss="gamma", dispersion="per_col",
                 maxit=20, tol=1e-6, seed=123)
    disp = np.asarray(res.dispersion)
    assert disp.shape == (30,)
    assert (disp > 0).all()


def test_gamma_dispersion_global():
    sim = simulate_gamma(40, 30, 2, seed=123)
    res = rt.nmf(sim["A"], 2, loss="gamma", dispersion="global",
                 maxit=20, tol=1e-6, seed=123)
    disp = np.asarray(res.dispersion)
    # global mode: one shared value broadcast over the vector
    assert float(np.std(disp)) < 1e-6


def test_gamma_dispersion_none():
    sim = simulate_gamma(30, 20, 2, seed=123)
    res = rt.nmf(sim["A"], 2, loss="gamma", dispersion="none",
                 maxit=15, seed=123)
    if res.dispersion is not None:
        np.testing.assert_allclose(np.asarray(res.dispersion), 1.0,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# Loss decrease (test_distribution_api.R:197-215, 529-580)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss", ["gamma", "inverse_gaussian"])
def test_irls_loss_decreases_overall(gamma_data, loss):
    res = rt.nmf(gamma_data["A"], 2, loss=loss, dispersion="per_row",
                 maxit=30, tol=1e-10, seed=123)
    h = np.asarray(res.loss_history)
    assert len(h) > 1
    assert h[-1] < h[0]


def test_gamma_loss_monotone_after_warmup():
    sim = simulate_gamma(60, 40, 2, seed=123)
    res = rt.nmf(sim["A"], 2, loss="gamma", dispersion="per_row",
                 maxit=50, tol=0.0, seed=123)
    h = np.asarray(res.loss_history, dtype=np.float64)
    assert len(h) >= 10
    stable = h[4:]
    diffs = np.diff(stable)
    assert (diffs < abs(stable[0]) * 1e-3).all(), \
        f"max increase {diffs.max()}"


def test_tweedie_loss_monotone_after_warmup():
    sim = simulate_gamma(60, 40, 2, seed=123)
    res = rt.nmf(sim["A"], 2, loss="tweedie", tweedie_power=1.5,
                 dispersion="per_row", maxit=50, tol=0.0, seed=123)
    h = np.asarray(res.loss_history, dtype=np.float64)
    stable = h[4:]
    assert (np.diff(stable) < abs(stable[0]) * 1e-3).all()


# ---------------------------------------------------------------------------
# Robust composition (test_distribution_api.R:221-263, 484-492)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss,counts", [
    ("gamma", False), ("inverse_gaussian", False),
    ("gp", True), ("nb", True)])
def test_robust_composes_with_irls_losses(loss, counts):
    if counts:
        A = simulate_counts(m=30, n=20, k=2, seed=1)["A"]
    else:
        A = simulate_gamma(30, 20, 2, seed=1)["A"]
    res = rt.nmf(A, 2, loss=loss, robust=True, dispersion="per_row",
                 maxit=15, seed=1)
    assert np.isfinite(res.train_loss)
    assert (np.asarray(res.W) >= 0).all()


def test_robust_custom_delta_gamma():
    A = simulate_gamma(30, 20, 2, seed=1)["A"]
    res = rt.nmf(A, 2, loss="gamma", robust=2.0, maxit=15, seed=1)
    assert np.isfinite(res.train_loss)


def test_robust_tweedie():
    A = simulate_gamma(40, 25, 2, seed=1)["A"]
    res = rt.nmf(A, 2, loss="tweedie", tweedie_power=1.8, robust=True,
                 maxit=20, seed=1)
    assert np.isfinite(res.train_loss)


def test_robust_mse_huber_loss_below_sse():
    """Huber rho <= squared error pointwise, so the tracked robust loss
    must come in below the plain SSE on outlier-laden data
    (test_distribution_api.R:506-526)."""
    rs = np.random.RandomState(42)
    A = np.abs(rs.normal(2.0, 1.0, (40, 25))).astype(np.float32)
    A[:3, :3] = 100.0
    std = rt.nmf(A, 3, maxit=40, tol=1e-10, seed=1)
    rob = rt.nmf(A, 3, robust=True, maxit=40, tol=1e-10, seed=1)
    assert float(rob.train_loss) < float(std.train_loss)


def test_robust_mse_better_clean_reconstruction():
    """Planted outliers: the robust fit reconstructs the CLEAN entries
    at least as well (test_distribution_api.R:582-614)."""
    rs = np.random.RandomState(42)
    m, n, k = 60, 40, 3
    W = np.abs(rs.normal(2, 0.5, (m, k)))
    H = np.abs(rs.normal(2, 0.5, (k, n)))
    A_clean = np.maximum(W @ H + rs.normal(0, 0.1, (m, n)), 0)
    A = A_clean.copy()
    idx = rs.choice(m * n, round(0.05 * m * n), replace=False)
    A.ravel()[idx] += np.abs(rs.normal(50, 10, idx.size))
    clean = np.ones(m * n, bool)
    clean[idx] = False

    std = rt.nmf(A.astype(np.float32), k, maxit=50, tol=1e-8, seed=42)
    rob = rt.nmf(A.astype(np.float32), k, robust=True, maxit=50,
                 tol=1e-8, seed=42)
    mse_std = np.mean((A_clean.ravel()[clean]
                       - std.reconstruct().ravel()[clean]) ** 2)
    mse_rob = np.mean((A_clean.ravel()[clean]
                       - rob.reconstruct().ravel()[clean]) ** 2)
    assert mse_rob < mse_std * 1.5


# ---------------------------------------------------------------------------
# Tweedie power family (test_distribution_api.R:441-482)
# ---------------------------------------------------------------------------

def test_tweedie_default_power_runs():
    A = simulate_gamma(50, 30, 3, seed=42)["A"]
    res = rt.nmf(A, 3, loss="tweedie", maxit=30, seed=42)
    assert np.isfinite(res.train_loss)


def test_tweedie_p2_matches_gamma():
    A = simulate_gamma(40, 25, 2, seed=1)["A"]
    tw = rt.nmf(A, 2, loss="tweedie", tweedie_power=2.0, maxit=40,
                tol=1e-6, seed=1)
    gm = rt.nmf(A, 2, loss="gamma", maxit=40, tol=1e-6, seed=1)
    np.testing.assert_allclose(float(tw.train_loss), float(gm.train_loss),
                               rtol=0.01)


def test_tweedie_p3_matches_invgauss():
    A = simulate_gamma(40, 25, 2, seed=1)["A"]
    tw = rt.nmf(A, 2, loss="tweedie", tweedie_power=3.0, maxit=40,
                tol=1e-6, seed=1)
    ig = rt.nmf(A, 2, loss="inverse_gaussian", maxit=40, tol=1e-6, seed=1)
    np.testing.assert_allclose(float(tw.train_loss), float(ig.train_loss),
                               rtol=0.01)


def test_tweedie_custom_power():
    A = simulate_gamma(40, 25, 2, seed=1)["A"]
    res = rt.nmf(A, 2, loss="tweedie", tweedie_power=2.5, maxit=30, seed=1)
    assert np.isfinite(res.train_loss)


# ---------------------------------------------------------------------------
# Overrides + edge cases (test_distribution_api.R:267-360)
# ---------------------------------------------------------------------------

def test_gamma_phi_init_override():
    A = simulate_gamma(30, 20, 2, seed=1)["A"]
    res = rt.nmf(A, 2, loss="gamma", dispersion="per_row",
                 gamma_phi_init=2.0, maxit=15, seed=1)
    assert np.isfinite(res.train_loss)


def test_unknown_kwarg_rejected():
    A = simulate_gamma(20, 15, 2, seed=1)["A"]
    with pytest.raises(TypeError):
        rt.nmf(A, 2, loss="gamma", bogus_param=42, maxit=5, seed=1)


def test_gamma_k1_and_high_rank():
    A = simulate_gamma(20, 15, 1, seed=1)["A"]
    res = rt.nmf(A, 1, loss="gamma", maxit=15, seed=1)
    assert np.asarray(res.W).shape[1] == 1
    A2 = simulate_gamma(60, 40, 2, seed=1)["A"]
    res8 = rt.nmf(A2, 8, loss="gamma", maxit=15, seed=1)
    assert np.asarray(res8.W).shape[1] == 8


# ---------------------------------------------------------------------------
# score_test_distribution (test_distribution_api.R:293-329)
# ---------------------------------------------------------------------------

def test_score_test_structure():
    sim = simulate_counts(m=40, n=30, k=2, seed=1)
    model = rt.nmf(sim["A"], 2, maxit=15, seed=1)
    diag = score_test_distribution(sim["A"], model)
    assert {"scores", "best_power", "best_distribution"} <= set(diag)
    assert len(diag["scores"]) == 4
    assert diag["best_distribution"] in (
        "gaussian", "gp", "gamma", "inverse_gaussian")
    # integer counts: NB diagnostic attached
    assert "nb_diagnostic" in diag


def test_score_test_dense_and_custom_powers():
    sim = simulate_gamma(30, 20, 2, seed=1)
    model = rt.nmf(sim["A"], 2, maxit=10, seed=1)
    diag = score_test_distribution(sim["A"], model)
    assert diag["best_distribution"] in (
        "gaussian", "gp", "gamma", "inverse_gaussian")
    diag3 = score_test_distribution(sim["A"], model, powers=(0, 1, 2))
    assert len(diag3["scores"]) == 3


def _oracle_model(W, H):
    """NMFResult carrying the TRUE factors, so the score test sees the
    exact mean surface (fitted mu can hit the 1e-6 floor and blow up
    r^2/mu^p for every p>0 — the statistic is only informative when mu
    is bounded away from zero, reference formula included)."""
    from rcppml_tpu.result import NMFResult
    return NMFResult(W=np.asarray(W, np.float32),
                     d=np.ones(W.shape[1], np.float32),
                     H=np.asarray(H, np.float32), iterations=0,
                     converged=True, final_tol=0.0, train_loss=0.0,
                     test_loss=float("nan"), best_iter=0)


def test_score_test_identifies_variance_power():
    """With the exact mean surface: Gamma data (Var = phi mu^2) scores
    best at p=2, Poisson counts (Var = mu) at p=1."""
    gsim = simulate_gamma(80, 60, 3, seed=7, phi=0.4)
    gd = score_test_distribution(
        gsim["A"], _oracle_model(gsim["W"], gsim["H"]))
    assert gd["best_power"] == 2
    rs = np.random.RandomState(7)
    W = rs.gamma(2.0, 1.0, (80, 3))
    H = rs.gamma(2.0, 1.0, (3, 60))
    A = rs.poisson(W @ H).astype(np.float64)
    cd = score_test_distribution(A, _oracle_model(W, H))
    assert cd["best_power"] == 1
    # Poisson is NOT quadratically overdispersed
    assert not cd["nb_diagnostic"]["overdispersed"]


def test_score_test_sparse_nonzeros_only():
    import scipy.sparse as sp
    sim = simulate_counts(m=40, n=30, k=2, seed=3)
    A = np.asarray(sim["A"], np.float64)
    model = rt.nmf(A, 2, maxit=10, seed=1)
    diag_sp = score_test_distribution(sp.csc_matrix(A), model)
    # sparse scoring skips zeros, so T stats differ from dense; it must
    # still produce finite stats + a valid pick
    assert all(np.isfinite(s["T_stat"]) for s in diag_sp["scores"])


# ---------------------------------------------------------------------------
# Standalone selection helpers (test_distribution_api.R:365-437)
# ---------------------------------------------------------------------------

def test_auto_distribution_reference_keys():
    sim = simulate_counts(m=40, n=30, k=3, nb_size=1.0, seed=8)
    out = auto_nmf_distribution(sim["A"], 3, maxit=20, seed=42,
                                distributions=("mse", "gp", "nb"))
    assert out["loss"] in ("mse", "gp", "nb")
    assert len(out["comparison"]) == 3
    assert sum(r["selected"] for r in out["comparison"]) == 1
    assert set(out["models"]) == {"mse", "gp", "nb"}
    # selected loss actually fits
    model = rt.nmf(sim["A"], 3, loss=out["loss"], maxit=10, seed=42)
    assert np.isfinite(model.train_loss)


def test_auto_distribution_sparse():
    import scipy.sparse as sp
    rs = np.random.RandomState(42)
    A = sp.random(50, 30, density=0.3, random_state=rs, format="csc")
    A.data = np.abs(A.data)
    out = auto_nmf_distribution(A, 3, maxit=15, seed=1,
                                distributions=("mse", "gp"))
    assert out["loss"] in ("mse", "gp")


def test_diagnose_zi_model_based_and_composition():
    """diagnose_zero_inflation(data, model) — reference signature with
    fitted-model input; composed with a zi refit."""
    sim = simulate_counts(m=50, n=30, k=3, zi_pi=0.4, seed=42)
    A = sim["A"]
    model = rt.nmf(A, 3, maxit=20, seed=1)
    zi = diagnose_zero_inflation(A, model)
    assert zi["zi_mode"] in ("none", "row", "col")
    assert zi["row_excess"].shape == (50,)
    assert zi["col_excess"].shape == (30,)
    assert 0.0 <= zi["excess_zero_rate"]
    if zi["zi_mode"] != "none":
        refit = rt.nmf(A, 3, loss="gp", zi=zi["zi_mode"], maxit=15, seed=1)
        assert np.isfinite(refit.train_loss)


def test_diagnose_zi_detects_planted_inflation():
    sim = simulate_counts(m=60, n=40, k=3, zi_pi=0.5, seed=9)
    model = rt.nmf(sim["A"], 3, maxit=25, seed=1)
    zi = diagnose_zero_inflation(sim["A"], model)
    clean = simulate_counts(m=60, n=40, k=3, seed=9)
    model_c = rt.nmf(clean["A"], 3, maxit=25, seed=1)
    zi_c = diagnose_zero_inflation(clean["A"], model_c)
    assert zi["excess_zero_rate"] > zi_c["excess_zero_rate"]


def test_diagnose_dispersion_model_based():
    from rcppml_tpu.utils.diagnostics import diagnose_dispersion
    sim = simulate_counts(m=50, n=40, k=2, nb_size=0.5, seed=11)
    model = rt.nmf(sim["A"], 2, maxit=20, seed=1)
    out = diagnose_dispersion(sim["A"], model)
    assert out["mode"] in ("global", "per_row", "per_col")
    assert np.isfinite(out["global_phi"])
    assert np.isfinite(out["row_cv"]) and np.isfinite(out["col_cv"])
    # heavily overdispersed NB data: Pearson dispersion must flag it
    assert out["overdispersed"]
