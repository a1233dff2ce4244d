"""Projection solvers: nnls(), predict(), evaluate()/mse().

Equivalents of ``R/solve.R:84-357`` (nnls projection API),
``R/predict_nmf.R:48`` (project new data onto a fitted model), and the
``evaluate``/``mse`` S4 methods (R/nmf_methods.R:300+).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..config import Loss, NMFConfig, Solver
from ..ops import features as feat
from ..ops import linalg, losses, solvers
from ..ops.linalg import PREC
from ..result import NMFResult


def nnls(A, w=None, h=None, *, L1: float = 0.0, L2: float = 0.0,
         L21: float = 0.0, angular: float = 0.0, nonneg: bool = True,
         upper_bound: float = 0.0, loss: str = "mse",
         solver: str = "auto", cd_maxit: int = 100, cd_tol: float = 1e-8,
         irls_max_iter: int = 5, irls_tol: float = 1e-4,
         warm_start=None, target_H=None, target_lambda: float = 0.0,
         theta=None, **fit_kwargs) -> np.ndarray:
    """Solve the projection problem min ||A - w X|| (or min ||A - X h||)
    subject to constraints (R/solve.R:84-357).

    Exactly one of ``w`` (m, k) / ``h`` (k, n) must be given; returns the
    other factor.  Non-MSE losses delegate to a single-iteration weighted
    solve, as the R API does via one NMF iteration.  ``warm_start``: a
    previous solution in the RETURN orientation — seeds the CD sweeps
    (test_unified_backend.R:143-186; forces the CD solver).

    ``target_H``/``target_lambda`` (enrichment > 0, PROJ_ADV < 0) delegate
    to one seeded NMF iteration exactly as the R API does
    (R/solve.R:133-186); extra ``fit_kwargs`` ride along to that call.
    """
    if (w is None) == (h is None):
        raise ValueError("provide exactly one of w=, h=")
    if L1 < 0 or L2 < 0 or L21 < 0:
        # R/nmf_validation.R penalty validators (test_predict.R:62-80)
        raise ValueError("L1/L2/L21 penalties must be >= 0")
    if (target_H is not None and np.any(np.atleast_1d(target_lambda) != 0)) \
            or fit_kwargs or L21 > 0:
        # L21's adaptive ridge needs a factor iterate; the one-iteration
        # NMF delegation applies it exactly like the R API (R/solve.R)
        from ..api import nmf as nmf_api
        k_t = (np.shape(w)[1] if w is not None else np.shape(h)[0])
        model = nmf_api(A, int(k_t), maxit=1, loss=loss,
                        L1=(L1, L1), L2=(L2, L2), L21=(L21, L21),
                        angular=(angular, angular), nonneg=nonneg,
                        upper_bound=(upper_bound, upper_bound),
                        target_H=target_H, target_lambda=target_lambda,
                        norm="none",
                        **(dict(w_init=np.asarray(w, dtype=np.float32))
                           if w is not None else
                           dict(h_init=np.asarray(h, dtype=np.float32))),
                        **fit_kwargs)
        return (np.asarray(model.H) * np.asarray(model.d)[:, None]
                if w is not None else
                np.asarray(model.W) * np.asarray(model.d)[None, :])
    if hasattr(A, "todense"):
        A = np.asarray(A.todense(), dtype=np.float32)
    else:
        A = np.asarray(A, dtype=np.float32)

    if w is not None:
        F = jnp.asarray(np.asarray(w, dtype=np.float32).T)   # (k, m)
        data = jnp.asarray(A)                                 # solve (k, n)
    else:
        F = jnp.asarray(np.asarray(h, dtype=np.float32))      # (k, n)
        data = jnp.asarray(A.T.copy())                        # solve (k, m)

    k = F.shape[0]
    loss_e = Loss(loss)
    if loss_e != Loss.MSE:
        from ..api import build_config
        from .nmf_irls import irls_solve_batch
        cfg = build_config(k, loss=loss, L1=(0.0, L1), L2=(0.0, L2),
                           irls_max_iter=irls_max_iter, irls_tol=irls_tol,
                           cd_maxit=cd_maxit, cd_tol=cd_tol, solver="cd")
        fc = cfg.H.__class__(L1=L1, L2=L2, L21=L21, nonneg=nonneg,
                             upper_bound=upper_bound)
        active = Loss.KL if loss_e == Loss.GP else loss_e
        # dispersion for NB/GP weights: theta= may be a scalar or a vector
        # matching either axis of the solve; without it the weights
        # degenerate to the r->0 limit, inconsistent with a fitted model
        th_row = th_col = None
        if theta is not None and loss_e in (Loss.NB, Loss.GP):
            tv = np.atleast_1d(np.asarray(theta, dtype=np.float32))
            if tv.size == 1:
                th_row = jnp.full((data.shape[0],), float(tv[0]), jnp.float32)
            elif tv.size == data.shape[0]:
                th_row = jnp.asarray(tv)
            elif tv.size == data.shape[1]:
                th_col = jnp.asarray(tv)
            else:
                raise ValueError(
                    f"theta length {tv.size} matches neither axis of the "
                    f"solve {tuple(data.shape)}")
        X = irls_solve_batch(data, F, cfg, active, th_row, th_col, fc, False)
    else:
        G = linalg.gram(F)
        B = linalg.rhs(F, data)
        if L2 > 0:
            G = G + L2 * jnp.eye(k, dtype=G.dtype)
        if L1 > 0:
            B = B - L1
        X0 = None
        if warm_start is not None:
            X0 = np.asarray(warm_start, dtype=np.float32)
            if h is None:
                pass            # returned X is already (k, n)
            else:
                X0 = X0.T       # return orientation was (m, k)
            X0 = jnp.asarray(X0)
        use_cd = (solver == "cd") or X0 is not None or \
            (solver == "auto" and (L1 > 0 or k >= 32))
        if use_cd:
            X = solvers.cd_nnls_batch(G, B, X0, nonneg=nonneg,
                                      maxit=cd_maxit, cd_tol=cd_tol,
                                      upper_bound=upper_bound,
                                      warm_start=X0 is not None)
        else:
            X = solvers.cholesky_clip_batch(G, B, nonneg=nonneg,
                                            upper_bound=upper_bound)
    if angular > 0:
        X = feat.apply_angular_posthoc(X, angular)
    X = np.asarray(X)
    return X if w is not None else X.T


def nnls_streaming(path_or_loader, w, *, chunk_cols=None, **kwargs) -> np.ndarray:
    """Streaming projection: solve H panel-by-panel over a DataLoader /
    .spz file (R/solve.R c_nnls_streaming, nmf/nnls_streaming.hpp).
    """
    from ..io.loaders import DataLoader, InMemoryLoader, SpzLoader
    if isinstance(path_or_loader, DataLoader):
        loader = path_or_loader
    elif isinstance(path_or_loader, (str, bytes)):
        loader = SpzLoader(path_or_loader)
    else:
        loader = InMemoryLoader(path_or_loader, chunk_cols=chunk_cols)
    parts = []
    for ch in loader.iter_chunks():
        parts.append((ch.col_start, nnls(ch.data, w=w, **kwargs)))
    parts.sort(key=lambda t: t[0])
    return np.concatenate([p for _, p in parts], axis=1)


def predict(model: NMFResult, newdata, *, L1: Optional[float] = None,
            L2: Optional[float] = None,
            upper_bound: Optional[float] = None,
            loss: Optional[str] = None) -> np.ndarray:
    """Project new columns onto a fitted model's W (R/predict_nmf.R:48).

    Reuses the model's stored penalty configuration when available via
    ``model.misc['config']``; an EXPLICIT argument always wins — including
    explicit zeros / 'mse' (None, not falsiness, marks "not given").
    Returns H_new (k, n_new)."""
    cfg = model.misc.get("config")
    if cfg is not None and isinstance(cfg, NMFConfig):
        L1 = cfg.H.L1 if L1 is None else L1
        L2 = cfg.H.L2 if L2 is None else L2
        upper_bound = cfg.H.upper_bound if upper_bound is None else upper_bound
        loss = cfg.loss.value if loss is None else loss
    L1 = 0.0 if L1 is None else L1
    L2 = 0.0 if L2 is None else L2
    upper_bound = 0.0 if upper_bound is None else upper_bound
    loss = "mse" if loss is None else loss
    W = np.asarray(model.W) * np.asarray(model.d)[None, :]
    # fitted dispersion travels with the projection; per-row theta (length
    # m) transfers to new columns, per-column theta cannot (new samples) —
    # fall back to its mean as a global size
    theta = None
    if model.theta is not None and loss in ("nb", "gp"):
        tv = np.asarray(model.theta, dtype=np.float32)
        theta = tv if tv.size == W.shape[0] else float(tv.mean())
    return nnls(newdata, w=W, L1=L1, L2=L2, upper_bound=upper_bound,
                loss=loss, theta=theta)


def evaluate(model: NMFResult, A, *, mask=None, loss: str = "mse",
             missing_only: bool = False, mask_zeros: bool = False) -> float:
    """Mean per-entry loss of the model on A (R/nmf_methods.R evaluate),
    optionally restricted to masked (missing) or nonzero entries
    (tests/testthat/test_evaluate.R)."""
    if missing_only and mask is None:
        raise ValueError("a mask matrix must be specified with missing_only")
    if hasattr(A, "todense"):
        A = np.asarray(A.todense(), dtype=np.float32)
    else:
        A = np.asarray(A, dtype=np.float32)
    rec = model.reconstruct()
    from ..api import build_config
    cfg = build_config(model.k, loss=loss, solver="cd" if loss != "mse" else "auto")
    # NB/GP losses need the FITTED dispersion — zeros would score the
    # model at the r->0 limit (garbage lgamma terms), not its likelihood
    theta_mn = jnp.zeros(A.shape)
    if model.theta is not None and loss in ("nb", "gp"):
        tv = np.asarray(model.theta, dtype=np.float32)
        if tv.size == A.shape[0]:
            theta_mn = jnp.broadcast_to(jnp.asarray(tv)[:, None], A.shape)
        elif tv.size == A.shape[1]:
            theta_mn = jnp.broadcast_to(jnp.asarray(tv)[None, :], A.shape)
        else:
            theta_mn = jnp.full(A.shape, float(tv.mean()))
    contrib = np.asarray(losses.compute_loss_elements(
        jnp.asarray(A), jnp.asarray(rec), cfg, theta_mn))
    sel = np.ones(A.shape, dtype=bool)
    if mask is not None:
        M = np.asarray(mask).astype(bool)
        sel = M if missing_only else ~M
    if mask_zeros:
        sel = sel & (A != 0)
    return float(contrib[sel].mean()) if sel.any() else float("nan")


def mse(model: NMFResult, A, **kw) -> float:
    """Mean squared reconstruction error (R/nmf_methods.R mse)."""
    return evaluate(model, A, loss="mse", **kw)
