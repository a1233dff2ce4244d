"""GP / ZIGP behavioral tests — mirrors tests/testthat/test_gp_nmf.R.

Dispersion shapes, NLL-based CV losses, ZIGP pi behavior, irls_max_iter
robustness, and theta evolution under CV.
"""
import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.utils.simulate import simulate_counts


def test_gp_cv_loss_uses_nll():
    # test_gp_nmf.R:172-185 — theta enters the held-out NLL, so the CV
    # loss differs between dispersion='per_row' and 'none'
    sim = simulate_counts(60, 40, 3, theta=1.0, seed=42)
    m1 = rt.nmf(sim["A"], 3, loss="gp", dispersion="per_row",
                test_fraction=0.1, maxit=30, tol=1e-4, seed=42)
    m2 = rt.nmf(sim["A"], 3, loss="gp", dispersion="none",
                test_fraction=0.1, maxit=30, tol=1e-4, seed=42)
    assert abs(m1.test_loss - m2.test_loss) > 1e-12


@pytest.mark.parametrize("zi,attr,length_of", [
    ("row", "pi_row", "m"), ("col", "pi_col", "n")])
def test_zigp_returns_pi(zi, attr, length_of):
    # test_gp_nmf.R:191-215
    sim = simulate_counts(60, 40, 3, theta=0.5, zi_pi=0.2, seed=42)
    res = rt.nmf(sim["A"], 3, loss="gp", dispersion="per_row", zi=zi,
                 maxit=30, tol=1e-4, seed=42)
    pi = np.asarray(getattr(res, attr))
    n_expect = sim["A"].shape[0] if length_of == "m" else sim["A"].shape[1]
    assert pi.shape == (n_expect,)
    assert np.all(pi >= 0) and np.all(pi <= 1)


def test_zigp_no_dropout_pi_moderate():
    # test_gp_nmf.R:215-232 — without artificial dropout mean(pi) < 0.5
    sim = simulate_counts(40, 30, 2, theta=0.3, zi_pi=0.0, seed=42)
    res = rt.nmf(sim["A"], 2, loss="gp", dispersion="per_row", zi="row",
                 maxit=30, tol=1e-4, seed=42)
    assert float(np.mean(np.asarray(res.pi_row))) < 0.5


def test_zigp_requires_gp_or_nb():
    # test_gp_nmf.R:234-241
    A = np.abs(np.random.RandomState(0).normal(size=(10, 10)))
    with pytest.raises(ValueError, match="zero-inflation requires"):
        rt.nmf(A, 2, loss="mse", zi="row", maxit=5)


def test_zigp_cv_mode():
    # test_gp_nmf.R:243-256
    sim = simulate_counts(60, 40, 2, theta=0.5, zi_pi=0.2, seed=42)
    res = rt.nmf(sim["A"], 2, loss="gp", zi="row", dispersion="per_row",
                 test_fraction=0.1, maxit=20, tol=1e-4, seed=42)
    assert np.isfinite(res.test_loss)
    assert res.pi_row is not None
    assert res.theta is not None


def test_zigp_cv_pi_tracks_dropout():
    """Under CV the ZI EM still discriminates planted dropout: pi on
    20%-dropout data exceeds pi on clean data (fit_cv.hpp:1285-1340)."""
    kw = dict(loss="gp", zi="row", dispersion="per_row",
              test_fraction=0.1, maxit=30, tol=1e-5, seed=42)
    drop = rt.nmf(simulate_counts(60, 40, 2, theta=0.5, zi_pi=0.25,
                                  seed=3)["A"], 2, **kw)
    clean = rt.nmf(simulate_counts(60, 40, 2, theta=0.5, zi_pi=0.0,
                                   seed=3)["A"], 2, **kw)
    assert float(np.mean(drop.pi_row)) > float(np.mean(clean.pi_row))


def test_evaluate_gp_numeric():
    # test_gp_nmf.R:259-271
    from rcppml_tpu.models.project import evaluate
    sim = simulate_counts(40, 30, 2, theta=0.5, seed=42)
    res = rt.nmf(sim["A"], 2, loss="gp", dispersion="per_row", maxit=20,
                 seed=42)
    val = evaluate(res, sim["A"], loss="gp")
    assert np.isfinite(float(val))


def test_irls_max_iter_comparable():
    # test_gp_nmf.R:316-333 — 5 inner IRLS iterations land within 20% of 20
    from rcppml_tpu.models.project import evaluate
    sim = simulate_counts(50, 35, 3, theta=0.5, seed=42)
    m5 = rt.nmf(sim["A"], 3, loss="gp", dispersion="per_row",
                irls_max_iter=5, maxit=50, tol=1e-6, seed=42)
    m20 = rt.nmf(sim["A"], 3, loss="gp", dispersion="per_row",
                 irls_max_iter=20, maxit=50, tol=1e-6, seed=42)
    l5 = float(evaluate(m5, sim["A"], loss="gp"))
    l20 = float(evaluate(m20, sim["A"], loss="gp"))
    # NLL may be negative; "within 20%" must be sign-safe
    assert l5 <= l20 + 0.2 * abs(l20)


def test_gp_cv_theta_evolves():
    # test_gp_nmf.R:338-351 — theta must leave its 0.1 init under CV
    sim = simulate_counts(80, 50, 3, theta=1.5, seed=42)
    res = rt.nmf(sim["A"], 3, loss="gp", dispersion="per_row",
                 test_fraction=0.1, maxit=50, tol=1e-6, seed=42)
    theta = np.asarray(res.theta, dtype=float)
    assert np.std(theta) > 0.01
    assert np.any(np.abs(theta - 0.1) > 0.05)


@pytest.mark.parametrize("disp,shape_of", [
    ("per_row", "m"), ("per_col", "n"), ("global", "scalar")])
def test_gamma_dispersion_shapes(disp, shape_of):
    # test_distribution_api.R:134-195
    rs = np.random.RandomState(42)
    A = np.abs(rs.normal(2.0, 0.5, size=(40, 30)))
    res = rt.nmf(A, 2, loss="gamma", dispersion=disp, maxit=10, seed=42)
    phi = np.asarray(res.dispersion)
    if shape_of == "m":
        assert phi.shape[0] == 40
    elif shape_of == "n":
        assert phi.shape[0] == 30
    else:
        assert phi.size in (1, 40)   # reference returns per_row-length
    assert np.all(phi[np.isfinite(phi)] > 0)


def test_gamma_dispersion_none_no_output():
    # test_distribution_api.R:181-195
    rs = np.random.RandomState(42)
    A = np.abs(rs.normal(2.0, 0.5, size=(40, 30)))
    res = rt.nmf(A, 2, loss="gamma", dispersion="none", maxit=10, seed=42)
    assert res.dispersion is None


def test_gamma_phi_init_override():
    # test_distribution_api.R:278-291
    rs = np.random.RandomState(42)
    A = np.abs(rs.normal(2.0, 0.5, size=(40, 30)))
    r1 = rt.nmf(A, 2, loss="gamma", dispersion="per_row",
                gamma_phi_init=0.5, maxit=8, seed=42)
    assert np.all(np.isfinite(np.asarray(r1.W)))
