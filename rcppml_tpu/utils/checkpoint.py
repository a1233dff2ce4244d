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


def resume_kwargs(path: str) -> dict:
    """Turn a checkpoint into warm-start kwargs for nmf():
    ``nmf(A, k, **resume_kwargs("ckpt.npz"))``."""
    res = load_model(path)
    return {"w_init": np.asarray(res.W) * np.asarray(res.d)[None, :],
            "h_init": np.asarray(res.H)}
