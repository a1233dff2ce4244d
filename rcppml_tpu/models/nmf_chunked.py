"""Chunked / streaming NMF — larger-than-memory ALS over a DataLoader.

TPU re-architecture of ``nmf/fit_chunked.hpp:71+`` and the streaming entry
``nmf/fit_streaming_spz.hpp:54-223``:

  per iteration:
    gram(W_T) once (k x k)  ->  forward column panels: per-panel RHS +
    solve for the H panel (prefetcher overlaps host decode with device
    compute)  ->  gram(H)  ->  transpose panels: per-panel W_T updates  ->
    scaling  ->  Gram-trick loss accumulated panel-wise.

  Memory: O(m k + n k + panel) — A never lives in device memory at once.

Panel solves are the standard batched Cholesky / CD primitives; each panel
update is one jit-compiled call reused across panels and iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..config import NMFConfig, Solver
from ..io.loaders import DataLoader, InMemoryLoader, Prefetcher, SpzLoader
from ..ops import features as feat
from ..ops import linalg, solvers
from ..ops.linalg import PREC
from ..result import NMFResult
from .nmf import init_factors


@partial(jax.jit, static_argnames=("cfg", "side"))
def _panel_solve(cfg: NMFConfig, side: str, G, F, A_panel, X_warm, warm):
    """Solve one column panel: B = F @ A_panel -> features -> solve.

    ``side``: 'H' or 'W' selects the FactorConfig.  G already includes L2
    and tier-2 terms.  Returns the solved panel (k, panel_cols).
    """
    fc = cfg.H if side == "H" else cfg.W
    B = jnp.dot(F, A_panel, precision=PREC)
    if fc.L1 > 0:
        B = B - fc.L1
    if cfg.solver == Solver.CHOLESKY:
        X = solvers.cholesky_clip_batch(G, B, nonneg=fc.nonneg)
    else:
        X0 = X_warm * warm.astype(X_warm.dtype)
        B_res = B - jnp.dot(G, X0, precision=PREC)
        X = solvers.cd_nnls_batch_traced(G, B_res, X0, 0.0, nonneg=fc.nonneg,
                                         maxit=cfg.cd_max_iter,
                                         cd_tol=cfg.cd_tol)
    if fc.upper_bound > 0:
        X = feat.apply_upper_bound(X, fc.upper_bound)
    return X


@jax.jit
def _panel_cross_term(W_T, d, H_panel, A_panel):
    """Panel contribution to the loss cross term: sum d_i <W_T A_panel, H>."""
    B = jnp.dot(W_T, A_panel, precision=PREC)          # (k, pc)
    return jnp.sum(d[:, None] * B * H_panel)


def nmf_chunked(loader: Union[DataLoader, str], cfg: NMFConfig, *,
                w_init=None, h_init=None) -> NMFResult:
    """Streaming ALS over a DataLoader (nmf/fit_chunked.hpp:71)."""
    if isinstance(loader, (str, bytes)):
        loader = SpzLoader(loader)
    m, n = loader.shape
    k = cfg.rank
    cfg.validate()
    if cfg.requires_irls():
        raise NotImplementedError(
            "streaming IRLS is rejected like the reference's "
            "streaming loss check (test_streaming_loss_rejection.R); use "
            "the in-memory path for non-MSE losses")

    W_T0, H0, d0 = init_factors(cfg, m, n, A=None, w_init=w_init,
                                h_init=h_init)
    W_T = jnp.asarray(W_T0)
    H = jnp.asarray(H0)
    d = jnp.asarray(d0)

    trAtA = loader.trace_sq()

    prev_loss = np.inf
    patience = 0
    hist = []
    converged = False
    it = 0
    for it in range(cfg.max_iter):
        warm = jnp.bool_(it > 0)

        # ---- H-update over forward panels ----
        G = linalg.gram(W_T)
        G, _ = feat.apply_l1_l2(G, jnp.zeros(()), 0.0, cfg.H.L2)
        G = feat.apply_l21(G, H, cfg.H.L21)
        H_parts = {}
        pf = Prefetcher(loader, transpose=False)
        for ch in pf:
            A_panel = jnp.asarray(ch.data)
            X_warm = jax.lax.dynamic_slice_in_dim(H, ch.col_start,
                                                  ch.num_cols, axis=1)
            H_parts[ch.col_start] = _panel_solve(cfg, "H", G, W_T, A_panel,
                                                 X_warm, warm)
        pf.close()
        H = jnp.concatenate([H_parts[cs] for cs in sorted(H_parts)], axis=1)
        if cfg.H.angular > 0:
            H = feat.apply_angular_posthoc(H, cfg.H.angular)
        H, d = linalg.extract_scaling(H, cfg.norm)

        # ---- W-update over transpose panels ----
        G_w = linalg.gram(H)                             # saved for loss
        G2, _ = feat.apply_l1_l2(G_w, jnp.zeros(()), 0.0, cfg.W.L2)
        G2 = feat.apply_l21(G2, W_T, cfg.W.L21)
        W_parts = {}
        pt = Prefetcher(loader, transpose=True)
        for ch in pt:
            At_panel = jnp.asarray(ch.data)              # (n, pc) cols of A^T
            X_warm = jax.lax.dynamic_slice_in_dim(W_T, ch.col_start,
                                                  ch.num_cols, axis=1)
            W_parts[ch.col_start] = _panel_solve(cfg, "W", G2, H, At_panel,
                                                 X_warm, warm)
        pt.close()
        W_T = jnp.concatenate([W_parts[cs] for cs in sorted(W_parts)], axis=1)
        if cfg.W.angular > 0:
            W_T = feat.apply_angular_posthoc(W_T, cfg.W.angular)
        W_T, d = linalg.extract_scaling(W_T, cfg.norm)

        # ---- loss: Gram trick with panel-wise cross term ----
        cross = 0.0
        for ch in loader.iter_chunks(transpose=False):
            cross += float(_panel_cross_term(W_T, d,
                                             H[:, ch.col_start:ch.col_start +
                                               ch.num_cols],
                                             jnp.asarray(ch.data)))
        G_wt = linalg.gram(W_T)
        recon = float(jnp.sum((d[:, None] * d[None, :]) * G_wt * G_w))
        loss = trAtA - 2.0 * cross + recon
        hist.append(loss)

        rel = abs(prev_loss - loss) / (abs(prev_loss) + 1e-15)
        if it > 0 and rel < cfg.tol:
            patience += 1
            if patience >= cfg.patience:
                converged = True
                prev_loss = loss
                it += 1
                break
        else:
            patience = 0
        prev_loss = loss

    res = NMFResult(
        W=np.asarray(W_T).T, d=np.asarray(d), H=np.asarray(H),
        iterations=it if converged else it + 1,
        converged=converged,
        train_loss=float(prev_loss),
        loss_history=np.asarray(hist, dtype=np.float64),
    )
    if cfg.sort_model:
        res.sort()
    return res
