"""Checkpoint / resume for factor models.

The reference's only resume primitive is warm-starting via w_init/h_init
(SURVEY.md §5); at pod scale preemption-safe checkpointing is required.
Factor state is a plain pytree, so checkpoints are simple .npz archives
(config serialized alongside); ``checkpoint_callback`` plugs into the
``on_iteration`` mechanism or the streaming loop to snapshot every N
iterations atomically.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Optional

import numpy as np

from ..config import Dispersion, Loss, NMFConfig, Norm, Solver, ZI
from ..result import NMFResult

_ARRAY_FIELDS = ("W", "d", "H", "theta", "dispersion", "pi_row", "pi_col",
                 "loss_history", "test_loss_history")


def _cfg_to_json(cfg: NMFConfig) -> str:
    def enc(v):
        if dataclasses.is_dataclass(v):
            return {k: enc(getattr(v, k)) for k in v.__dataclass_fields__}
        if isinstance(v, (Loss, Dispersion, ZI, Norm)):
            return v.value
        if isinstance(v, Solver):
            return v.name
        return v
    return json.dumps(enc(cfg))


def save_model(result: NMFResult, path: str,
               cfg: Optional[NMFConfig] = None) -> None:
    """Atomically write a model checkpoint (.npz)."""
    payload = {}
    for f in _ARRAY_FIELDS:
        v = getattr(result, f, None)
        if v is not None:
            payload[f] = np.asarray(v)
    payload["_scalars"] = np.asarray(json.dumps({
        "iterations": result.iterations,
        "converged": bool(result.converged),
        "final_tol": float(result.final_tol),
        "train_loss": float(result.train_loss),
        "test_loss": float(result.test_loss),
        "best_iter": int(result.best_iter),
    }))
    if cfg is not None:
        payload["_config"] = np.asarray(_cfg_to_json(cfg))
    d = os.path.dirname(os.path.abspath(path)) or "."
    # suffix must be .npz so numpy writes to exactly this name (it appends
    # .npz otherwise, leaving the mkstemp placeholder empty)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_model(path: str) -> NMFResult:
    with np.load(path, allow_pickle=False) as z:
        scal = json.loads(str(z["_scalars"]))
        res = NMFResult(
            W=z["W"], d=z["d"], H=z["H"],
            iterations=int(scal["iterations"]),
            converged=bool(scal["converged"]),
            final_tol=float(scal["final_tol"]),
            train_loss=float(scal["train_loss"]),
            test_loss=float(scal["test_loss"]),
            best_iter=int(scal["best_iter"]),
        )
        for f in ("theta", "dispersion", "pi_row", "pi_col", "loss_history",
                  "test_loss_history"):
            if f in z.files:
                setattr(res, f, z[f])
        if "_config" in z.files:
            res.misc["config_json"] = str(z["_config"])
    return res


class CheckpointCallback:
    """on_iteration-compatible periodic checkpointing.

    The fully-fused fit runs on-device; this callback is used with the
    step-mode / streaming drivers where per-iteration host control exists.
    """

    def __init__(self, path: str, every: int = 10):
        self.path = path
        self.every = every
        self._latest = None

    def update_state(self, result: NMFResult):
        self._latest = result

    def __call__(self, iteration: int, train_loss: float,
                 test_loss: float = float("nan"), model=None):
        model = model or self._latest
        if model is not None and iteration % self.every == 0:
            save_model(model, self.path)


# ---------------------------------------------------------------------------
# Preemption-safe checkpointing of the FUSED while-loop fit (SURVEY §5)
# ---------------------------------------------------------------------------

def save_fit_state(state, cfg: NMFConfig, path: str) -> None:
    """Atomically persist a raw FitState (host leaves) + config."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(
            tmp,
            W_T=np.asarray(state.W_T), H=np.asarray(state.H),
            d=np.asarray(state.d), loss_hist=np.asarray(state.loss_hist),
            scalars=np.asarray([float(state.it), float(state.prev_loss),
                                float(state.patience_ctr),
                                float(state.converged),
                                float(state.final_tol)], np.float64),
            config=np.asarray(_cfg_to_json(cfg)))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _validate_and_resize(z, cfg: NMFConfig):
    """Shared checkpoint-load validation (MSE + IRLS formats): the stored
    config must equal ``cfg`` except ``max_iter``, which may GROW
    (continue-training) — a resume can never silently change the
    optimization problem.  Returns (scalars, loss_hist) with the history
    padded/truncated to the CURRENT max_iter so packed-state layouts that
    are sized by max_iter parse correctly."""
    stored = json.loads(str(z["config"]))
    current = json.loads(_cfg_to_json(cfg))
    stored.pop("max_iter")
    current_mi = current.pop("max_iter")
    if stored != current:
        diff = {k for k in current if stored.get(k) != current.get(k)}
        raise ValueError(
            f"checkpoint config mismatch on fields {sorted(diff)}; "
            "resume with the same configuration (only maxit may grow)")
    sc = z["scalars"]
    it = int(sc[0])
    if current_mi < it:
        raise ValueError(f"checkpoint already has {it} iterations but "
                         f"maxit = {current_mi}")
    hist = np.asarray(z["loss_hist"], np.float32)
    if current_mi > hist.shape[0]:
        hist = np.concatenate([
            hist, np.full((current_mi - hist.shape[0],), np.nan,
                          np.float32)])
    elif current_mi < hist.shape[0]:
        # shrinking maxit (still >= it, checked above): entries beyond
        # current_mi are unreached NaNs
        hist = hist[:current_mi]
    return sc, hist


def load_fit_state(path: str, cfg: NMFConfig):
    """Load a raw FitState checkpoint (see :func:`_validate_and_resize`
    for the config compatibility contract)."""
    from ..models.nmf import FitState
    with np.load(path, allow_pickle=False) as z:
        sc, hist = _validate_and_resize(z, cfg)
        it = int(sc[0])
        return FitState(
            W_T=np.asarray(z["W_T"], np.float32),
            H=np.asarray(z["H"], np.float32),
            d=np.asarray(z["d"], np.float32),
            it=np.int32(it), prev_loss=np.float32(sc[1]),
            patience_ctr=np.int32(sc[2]), converged=bool(sc[3] > 0.5),
            final_tol=np.float32(sc[4]), loss_hist=hist)


def fit_checkpointed(A, cfg: NMFConfig, path: str, *, every: int = 10,
                     w_init=None, h_init=None, aux=None,
                     sparse_zeros: bool = False) -> NMFResult:
    """Preemption-safe fused fit: run the on-device while_loop in segments
    of ``every`` iterations, atomically checkpointing the full fit state
    after each segment, and resume from ``path`` if it exists.
    Covers both the fused MSE path and the fused IRLS path (KL/NB/GP/
    gamma/…, including zero-inflated fits, whose imputed matrix is
    checkpointed as genuine loop state).

    Every segment reuses ONE compiled executable (the segment bound is a
    traced scalar), so the fused-loop performance is preserved — the only
    added cost is one state transfer + npz write per ``every`` iterations.
    Identical math to the unsegmented fit: splitting a while_loop at
    iteration boundaries does not change the iteration sequence.
    """
    import jax
    import jax.numpy as jnp
    from ..models import nmf as nmf_mod

    cfg.validate()
    if every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    if cfg.requires_irls():
        return _fit_irls_checkpointed(A, cfg, path, every=every,
                                      w_init=w_init, h_init=h_init, aux=aux,
                                      sparse_zeros=sparse_zeros)

    if isinstance(A, jax.Array):
        A_dev = A.astype(jnp.float32)
    else:
        A_dev = jnp.asarray(np.asarray(A, dtype=np.float32))
    m, n = A_dev.shape
    k = cfg.rank
    aux_dev = {key: jnp.asarray(val, jnp.float32)
               for key, val in (aux or {}).items() if val is not None}

    if os.path.exists(path):
        host_state = load_fit_state(path, cfg)
        if host_state.W_T.shape != (k, m) or host_state.H.shape != (k, n):
            raise ValueError("checkpoint factor shapes do not match the data")
        state = nmf_mod.FitState(*[jnp.asarray(x) for x in host_state])
        it = int(host_state.it)
        converged = bool(host_state.converged)
    else:
        W_T0, H0, d0 = nmf_mod.init_factors(
            cfg, m, n, A=A_dev if cfg.init_mode in (1, 2) else None,
            w_init=w_init, h_init=h_init)
        state = nmf_mod._init_fit_state(cfg, jnp.asarray(W_T0),
                                        jnp.asarray(H0), jnp.asarray(d0))
        it = 0
        converged = False

    scfg = cfg.device_static()
    while it < cfg.max_iter and not converged:
        seg_end = min(it + every, cfg.max_iter)
        state = nmf_mod._fit_mse_seg(scfg, A_dev, state, aux_dev,
                                     jnp.int32(seg_end))
        buf = np.asarray(jax.device_get(nmf_mod._pack_state(state)))
        host_state = nmf_mod._unpack_state(buf, k, m, n, cfg.max_iter)
        it = int(host_state.it)
        converged = bool(host_state.converged)
        save_fit_state(host_state, cfg, path)

    return nmf_mod.finalize_result(cfg, state)


# ---------------------------------------------------------------------------
# Segmented IRLS checkpointing (closes round-1 "IRLS not yet segmented")
# ---------------------------------------------------------------------------

_IRLS_VECS = ("W_T", "H", "d", "disp_row", "disp_col", "pi_row", "pi_col",
              "loss_hist")


def save_irls_state(state, cfg: NMFConfig, path: str) -> None:
    """Atomically persist a host IRLSState + config.

    ``A_imp`` (the ZI soft-imputed matrix) is included only for ZI fits —
    it is genuine loop state there (the next iteration's solves read it),
    and the only way to make resume bit-exact.  Non-ZI IRLS carries
    ``A_imp == A`` unchanged, so it is reconstructed from the data on load."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    arrays = {name: np.asarray(getattr(state, name)) for name in _IRLS_VECS}
    if cfg.has_zi():
        arrays["A_imp"] = np.asarray(state.A_imp)
    try:
        np.savez_compressed(
            tmp,
            scalars=np.asarray([float(state.it), float(state.prev_loss),
                                float(state.patience_ctr),
                                float(state.converged),
                                float(state.final_tol)], np.float64),
            config=np.asarray(_cfg_to_json(cfg)),
            **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_irls_state(path: str, cfg: NMFConfig, A_dev):
    """Load an IRLSState checkpoint, validating config compatibility the
    same way as :func:`load_fit_state` (only ``max_iter`` may grow)."""
    from ..models.nmf_irls import IRLSState
    import jax.numpy as jnp
    with np.load(path, allow_pickle=False) as z:
        sc, hist = _validate_and_resize(z, cfg)
        vecs = {name: jnp.asarray(np.asarray(z[name], np.float32))
                for name in _IRLS_VECS if name != "loss_hist"}
        A_imp = (jnp.asarray(np.asarray(z["A_imp"], np.float32))
                 if "A_imp" in z.files else A_dev)
        return IRLSState(
            A_imp=A_imp, it=jnp.int32(int(sc[0])),
            prev_loss=jnp.float32(sc[1]), patience_ctr=jnp.int32(sc[2]),
            converged=jnp.bool_(sc[3] > 0.5), final_tol=jnp.float32(sc[4]),
            loss_hist=jnp.asarray(hist), **vecs)


def _fit_irls_checkpointed(A, cfg: NMFConfig, path: str, *, every: int = 10,
                           w_init=None, h_init=None, aux=None,
                           sparse_zeros: bool = False) -> NMFResult:
    """Segmented fused IRLS fit with atomic periodic checkpoints.

    Same contract as the MSE path: every segment reuses ONE compiled
    executable (`seg_end` is a traced bound on nmf_irls._fit_irls_jit), the
    iteration sequence is identical to the unsegmented fit, and resume
    from ``path`` is bit-exact (ZI fits persist the imputed matrix, the
    only large loop-state buffer)."""
    import jax
    import jax.numpy as jnp
    from ..models import nmf as nmf_mod
    from ..models import nmf_irls as irls_mod

    if isinstance(A, jax.Array):
        A_dev = A.astype(jnp.float32)
    else:
        A_dev = jnp.asarray(np.asarray(A, dtype=np.float32))
    m, n = A_dev.shape
    k = cfg.rank
    aux_dev = {key: jnp.asarray(val, jnp.float32)
               for key, val in (aux or {}).items()
               if val is not None and not key.endswith("_gram")}

    if os.path.exists(path):
        state = load_irls_state(path, cfg, A_dev)
        if state.W_T.shape != (k, m) or state.H.shape != (k, n):
            raise ValueError("checkpoint factor shapes do not match the data")
        it = int(state.it)
        converged = bool(state.converged)
    else:
        W_T0, H0, d0 = nmf_mod.init_factors(
            cfg, m, n, A=A_dev if cfg.init_mode in (1, 2) else None,
            w_init=w_init, h_init=h_init)
        state = irls_mod._init_irls_state(A_dev, cfg, W_T0, H0, d0)
        it = 0
        converged = False

    scfg = cfg.device_static()
    while it < cfg.max_iter and not converged:
        seg_end = min(it + every, cfg.max_iter)
        state = irls_mod._fit_irls_jit(scfg, A_dev, aux_dev, state,
                                       sparse_zeros,
                                       seg_end=jnp.int32(seg_end))
        # one batched transfer of the small fields for the npz write;
        # state itself stays on device for the next segment
        small = jax.device_get(state._replace(
            A_imp=jnp.zeros((), jnp.float32)))
        host = small._replace(A_imp=(np.asarray(jax.device_get(state.A_imp))
                                     if cfg.has_zi() else None))
        it = int(host.it)
        converged = bool(host.converged)
        save_irls_state(host, cfg, path)

    return irls_mod.finalize_irls_result(cfg, state)


def resume_kwargs(path: str) -> dict:
    """Turn a checkpoint into warm-start kwargs for nmf():
    ``nmf(A, k, **resume_kwargs("ckpt.npz"))``."""
    res = load_model(path)
    return {"w_init": np.asarray(res.W) * np.asarray(res.d)[None, :],
            "h_init": np.asarray(res.H)}
