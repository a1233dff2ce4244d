"""Distribution selection and diagnostics.

Equivalents of ``R/auto_distribution.R``: auto_nmf_distribution (BIC/AIC
model comparison across losses, R/auto_distribution.R:54-130),
score_test_distribution, diagnose_zero_inflation, diagnose_dispersion.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np


def auto_nmf_distribution(data, k: int, *,
                          distributions: Sequence[str] = ("mse", "gp", "nb"),
                          criterion: str = "bic", maxit: int = 50,
                          seed: Optional[int] = None, verbose: bool = False,
                          **kwargs) -> dict:
    """Fit each candidate loss and compare by BIC/AIC
    (R/auto_distribution.R:54-130).

    df = k(m+n) + {1 for Gaussian sigma; m for per-row dispersion}.
    MSE SSE is converted to a Gaussian NLL: (N/2)(1 + log(2 pi SSE / N)).
    """
    from ..api import nmf as nmf_api
    try:
        import scipy.sparse as sp
        is_sparse = sp.issparse(data)
    except ImportError:
        is_sparse = False
    m, n = data.shape
    N = data.nnz if is_sparse else m * n

    rows = []
    models = {}
    for dist in distributions:
        if verbose:
            print(f"Fitting NMF with loss = {dist} ...")
        model = nmf_api(data, k, loss=dist, maxit=maxit, seed=seed, **kwargs)
        models[dist] = model

        n_factor = k * (m + n)
        if dist == "mse":
            df = n_factor + 1
        elif dist in ("gp", "nb"):
            df = n_factor + m
        else:
            df = n_factor

        raw = model.train_loss
        if dist == "mse":
            nll = (N / 2.0) * (1.0 + math.log(2.0 * math.pi * raw / N))
        else:
            nll = raw
        rows.append({"distribution": dist, "nll": float(nll), "df": int(df),
                     "aic": 2 * nll + 2 * df, "bic": 2 * nll + df * math.log(N)})

    key = "bic" if criterion == "bic" else "aic"
    best = min(rows, key=lambda r: r[key])
    for r in rows:
        r["selected"] = r["distribution"] == best["distribution"]
    return {"best": best["distribution"], "results": rows, "models": models,
            "criterion": criterion}


def diagnose_zero_inflation(data, k: int = 10, *, maxit: int = 30,
                            seed: int = 42, **kwargs) -> dict:
    """Compare observed vs Poisson-expected zero fraction under a GP fit
    (R/auto_distribution.R:304 diagnose_zero_inflation)."""
    from ..api import nmf as nmf_api
    A = np.asarray(data.todense() if hasattr(data, "todense") else data,
                   dtype=np.float64)
    model = nmf_api(A, k, loss="gp", dispersion="none", maxit=maxit,
                    seed=seed, **kwargs)
    mu = np.maximum(model.reconstruct(), 1e-10)
    observed_zero = float((A == 0).mean())
    expected_zero = float(np.exp(-mu).mean())
    excess = observed_zero - expected_zero
    return {"observed_zero_fraction": observed_zero,
            "expected_zero_fraction": expected_zero,
            "excess_zeros": excess,
            "zero_inflated": excess > 0.05,
            "recommendation": ("zi='row'" if excess > 0.05 else "zi='none'")}


def diagnose_dispersion(data, k: int = 10, *, maxit: int = 30, seed: int = 42,
                        **kwargs) -> dict:
    """Mean-variance diagnostic: Poisson (var=mu) vs NB (var=mu+mu^2/r)
    (R/auto_distribution.R:405)."""
    from ..api import nmf as nmf_api
    A = np.asarray(data.todense() if hasattr(data, "todense") else data,
                   dtype=np.float64)
    model = nmf_api(A, k, loss="gp", dispersion="none", maxit=maxit,
                    seed=seed, **kwargs)
    mu = np.maximum(model.reconstruct(), 1e-10)
    resid_sq = (A - mu) ** 2
    # Pearson dispersion: mean((y-mu)^2/mu); ~1 for Poisson
    pearson = float((resid_sq / mu).mean())
    overdispersed = pearson > 1.5
    return {"pearson_dispersion": pearson,
            "overdispersed": overdispersed,
            "recommendation": ("loss='nb' or 'gp'" if overdispersed
                               else "loss='gp', dispersion='none'")}


def score_test_distribution(data, k: int = 10, **kwargs) -> dict:
    """Lightweight combined ZI + dispersion screen
    (R/auto_distribution.R:194)."""
    zi = diagnose_zero_inflation(data, k, **kwargs)
    disp = diagnose_dispersion(data, k, **kwargs)
    if disp["overdispersed"] and zi["zero_inflated"]:
        rec = "loss='nb', zi='row'"
    elif disp["overdispersed"]:
        rec = "loss='nb'"
    elif zi["zero_inflated"]:
        rec = "loss='gp', zi='row'"
    else:
        rec = "loss='mse' or 'gp'"
    return {"zero_inflation": zi, "dispersion": disp, "recommendation": rec}
