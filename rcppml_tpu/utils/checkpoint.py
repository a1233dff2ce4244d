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

def save_fit_state(state, cfg: NMFConfig, path: str,
                   mesh_shape=None) -> None:
    """Atomically persist a raw FitState (host leaves) + config.

    ``mesh_shape``: (rows, cols) of the device mesh for sharded fits —
    stored so a resume on a different mesh shape is rejected (padding and
    reduction orders differ across mesh shapes, breaking the bitwise
    resume contract)."""
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
            mesh_shape=np.asarray(mesh_shape or (0, 0), np.int64),
            config=np.asarray(_cfg_to_json(cfg)))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _check_mesh_shape(z, mesh_shape) -> None:
    stored = tuple(np.asarray(z["mesh_shape"]).tolist()) \
        if "mesh_shape" in z.files else (0, 0)
    current = tuple(mesh_shape or (0, 0))
    if stored != current:
        def name(s):
            return "no mesh" if s == (0, 0) else f"mesh {s[0]}x{s[1]}"
        raise ValueError(
            f"checkpoint was written under {name(stored)} but resume "
            f"runs under {name(current)}; resume on the same mesh shape "
            "(padding and reduction order differ otherwise)")


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


def load_fit_state(path: str, cfg: NMFConfig, mesh_shape=None):
    """Load a raw FitState checkpoint (see :func:`_validate_and_resize`
    for the config compatibility contract)."""
    from ..models.nmf import FitState
    with np.load(path, allow_pickle=False) as z:
        _check_mesh_shape(z, mesh_shape)
        sc, hist = _validate_and_resize(z, cfg)
        it = int(sc[0])
        return FitState(
            W_T=np.asarray(z["W_T"], np.float32),
            H=np.asarray(z["H"], np.float32),
            d=np.asarray(z["d"], np.float32),
            it=np.int32(it), prev_loss=np.float32(sc[1]),
            patience_ctr=np.int32(sc[2]), converged=bool(sc[3] > 0.5),
            final_tol=np.float32(sc[4]), loss_hist=hist)


def _mesh_state_shardings(mesh):
    """Canonical NamedShardings for a FitState/IRLSState on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return {
        "W_T": NamedSharding(mesh, P(None, "rows")),
        "H": NamedSharding(mesh, P(None, "cols")),
        "A": NamedSharding(mesh, P("rows", "cols")),
        "rep": NamedSharding(mesh, P()),
    }


def fit_checkpointed(A, cfg: NMFConfig, path: str, *, every: int = 10,
                     w_init=None, h_init=None, aux=None,
                     sparse_zeros: bool = False, mesh=None) -> NMFResult:
    """Preemption-safe fused fit: run the on-device while_loop in segments
    of ``every`` iterations, atomically checkpointing the full fit state
    after each segment, and resume from ``path`` if it exists.
    Covers both the fused MSE path and the fused IRLS path (KL/NB/GP/
    gamma/…, including zero-inflated fits, whose imputed matrix is
    checkpointed as genuine loop state).

    ``mesh``: optional jax.sharding.Mesh — the pod-scale case SURVEY §5
    names ("needed at pod scale"): A is block-sharded and the identical
    segment executable runs under GSPMD.  The factor state is k-scaled,
    so the per-segment gather-to-host is cheap even sharded; checkpoints
    record the mesh shape and resume rejects a mismatched mesh (padding
    and reduction order differ across shapes, breaking bitwise resume).

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
    if cfg.fused_vmem:
        raise ValueError("fused_vmem runs the whole fit in one device "
                         "program — incompatible with segmented "
                         "checkpointing (drop the knob or the "
                         "checkpoint_path)")
    if cfg.requires_irls():
        return _fit_irls_checkpointed(A, cfg, path, every=every,
                                      w_init=w_init, h_init=h_init, aux=aux,
                                      sparse_zeros=sparse_zeros, mesh=mesh)

    if isinstance(A, jax.Array):
        A_dev = A.astype(jnp.float32)
    else:
        A_dev = jnp.asarray(np.asarray(A, dtype=np.float32))
    m, n = A_dev.shape
    k = cfg.rank
    aux_dev = {key: jnp.asarray(val, jnp.float32)
               for key, val in (aux or {}).items() if val is not None}

    mesh_shape = None
    if mesh is not None:
        from ..parallel import mesh as mesh_mod
        if aux_dev:
            raise ValueError("checkpoint_path with mesh= does not support "
                             "graph/target auxiliaries yet")
        mesh_mod.check_pad_soundness(
            cfg, *mesh_mod.mesh_padding(mesh, m, n))
        mesh_shape = (mesh.shape["rows"], mesh.shape["cols"])
        sh = _mesh_state_shardings(mesh)

    def _shard_state(host_state):
        leaves = [jnp.asarray(x) for x in host_state]
        if mesh is None:
            return nmf_mod.FitState(*leaves)
        st = nmf_mod.FitState(*leaves)
        return st._replace(
            W_T=jax.device_put(st.W_T, sh["W_T"]),
            H=jax.device_put(st.H, sh["H"]),
            d=jax.device_put(st.d, sh["rep"]),
            loss_hist=jax.device_put(st.loss_hist, sh["rep"]))

    if os.path.exists(path):
        host_state = load_fit_state(path, cfg, mesh_shape=mesh_shape)
        # padded (device) dims must match: the checkpoint stores the
        # padded state so resume is bitwise
        mp, np_ = (m, n)
        if mesh is not None:
            pm, pn = mesh_mod.mesh_padding(mesh, m, n)
            mp, np_ = m + pm, n + pn
        if host_state.W_T.shape != (k, mp) or host_state.H.shape != (k, np_):
            raise ValueError("checkpoint factor shapes do not match the data")
        state = _shard_state(host_state)
        it = int(host_state.it)
        converged = bool(host_state.converged)
        if mesh is not None:
            A_dev, _, _, _ = mesh_mod.shard_arrays(
                mesh, A_dev, jnp.zeros((k, m)), jnp.zeros((k, n)),
                jnp.ones((k,)))
    else:
        W_T0, H0, d0 = nmf_mod.init_factors(
            cfg, m, n, A=A_dev if cfg.init_mode in (1, 2) else None,
            w_init=w_init, h_init=h_init)
        if mesh is not None:
            A_dev, W_T0, H0, d0 = mesh_mod.shard_arrays(
                mesh, A_dev, jnp.asarray(W_T0), jnp.asarray(H0),
                jnp.asarray(d0))
        state = nmf_mod._init_fit_state(cfg, jnp.asarray(W_T0),
                                        jnp.asarray(H0), jnp.asarray(d0))
        it = 0
        converged = False
    mp, np_ = (state.W_T.shape[1], state.H.shape[1])

    scfg = cfg.device_static()
    while it < cfg.max_iter and not converged:
        seg_end = min(it + every, cfg.max_iter)
        state = nmf_mod._fit_mse_seg(scfg, A_dev, state, aux_dev,
                                     jnp.int32(seg_end))
        buf = np.asarray(jax.device_get(nmf_mod._pack_state(state)))
        host_state = nmf_mod._unpack_state(buf, k, mp, np_, cfg.max_iter)
        it = int(host_state.it)
        converged = bool(host_state.converged)
        save_fit_state(host_state, cfg, path, mesh_shape=mesh_shape)

    res = nmf_mod.finalize_result(cfg, state)
    if mesh is not None:
        from ..parallel.mesh import unpad_result
        res = unpad_result(res, cfg, m, n)
    return res


# ---------------------------------------------------------------------------
# Segmented IRLS checkpointing (closes round-1 "IRLS not yet segmented")
# ---------------------------------------------------------------------------

_IRLS_VECS = ("W_T", "H", "d", "disp_row", "disp_col", "pi_row", "pi_col",
              "loss_hist")


def save_irls_state(state, cfg: NMFConfig, path: str,
                    mesh_shape=None) -> None:
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
            mesh_shape=np.asarray(mesh_shape or (0, 0), np.int64),
            config=np.asarray(_cfg_to_json(cfg)),
            **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_irls_state(path: str, cfg: NMFConfig, A_dev, mesh_shape=None):
    """Load an IRLSState checkpoint, validating config compatibility the
    same way as :func:`load_fit_state` (only ``max_iter`` may grow)."""
    from ..models.nmf_irls import IRLSState
    import jax.numpy as jnp
    with np.load(path, allow_pickle=False) as z:
        _check_mesh_shape(z, mesh_shape)
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
                           sparse_zeros: bool = False,
                           mesh=None) -> NMFResult:
    """Segmented fused IRLS fit with atomic periodic checkpoints.

    Same contract as the MSE path: every segment reuses ONE compiled
    executable (`seg_end` is a traced bound on nmf_irls._fit_irls_jit), the
    iteration sequence is identical to the unsegmented fit, and resume
    from ``path`` is bit-exact (ZI fits persist the imputed matrix, the
    only large loop-state buffer).  With ``mesh``, A/A_imp are
    block-sharded and segments run under GSPMD with valid-region
    accounting for any mesh padding (same design as
    parallel.mesh.fit_sharded)."""
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

    mesh_shape = None
    valid_dims = None
    mp, np_ = m, n
    if mesh is not None:
        from ..parallel import mesh as mesh_mod
        if aux_dev:
            raise ValueError("checkpoint_path with mesh= does not support "
                             "graph/target auxiliaries yet")
        mesh_mod.check_pad_soundness(
            cfg, *mesh_mod.mesh_padding(mesh, m, n))
        mesh_shape = (mesh.shape["rows"], mesh.shape["cols"])
        sh = _mesh_state_shardings(mesh)
        pm, pn = mesh_mod.mesh_padding(mesh, m, n)
        mp, np_ = m + pm, n + pn
        if (pm, pn) != (0, 0):
            valid_dims = (m, n)

    def _shard_irls(state):
        if mesh is None:
            return state
        rep = {f: jax.device_put(getattr(state, f), sh["rep"])
               for f in ("d", "disp_row", "disp_col", "pi_row", "pi_col",
                         "loss_hist")}
        return state._replace(
            A_imp=jax.device_put(state.A_imp, sh["A"]),
            W_T=jax.device_put(state.W_T, sh["W_T"]),
            H=jax.device_put(state.H, sh["H"]), **rep)

    if os.path.exists(path):
        if mesh is not None:
            # the stored A_imp (non-ZI fallback = A itself) must be the
            # PADDED matrix for shapes to line up
            A_dev, _, _, _ = mesh_mod.shard_arrays(
                mesh, A_dev, jnp.zeros((k, m)), jnp.zeros((k, n)),
                jnp.ones((k,)))
        state = load_irls_state(path, cfg, A_dev, mesh_shape=mesh_shape)
        if state.W_T.shape != (k, mp) or state.H.shape != (k, np_):
            raise ValueError("checkpoint factor shapes do not match the data")
        state = _shard_irls(state)
        it = int(state.it)
        converged = bool(state.converged)
    else:
        W_T0, H0, d0 = nmf_mod.init_factors(
            cfg, m, n, A=A_dev if cfg.init_mode in (1, 2) else None,
            w_init=w_init, h_init=h_init)
        if mesh is not None:
            A_dev, W_T0, H0, d0 = mesh_mod.shard_arrays(
                mesh, A_dev, jnp.asarray(W_T0), jnp.asarray(H0),
                jnp.asarray(d0))
        state = irls_mod._init_irls_state(A_dev, cfg, W_T0, H0, d0,
                                          valid_dims=valid_dims)
        it = 0
        converged = False

    scfg = cfg.device_static()
    while it < cfg.max_iter and not converged:
        seg_end = min(it + every, cfg.max_iter)
        state = irls_mod._fit_irls_jit(scfg, A_dev, aux_dev, state,
                                       sparse_zeros, valid_dims=valid_dims,
                                       seg_end=jnp.int32(seg_end))
        # one batched transfer of the small fields for the npz write;
        # state itself stays on device for the next segment
        small = jax.device_get(state._replace(
            A_imp=jnp.zeros((), jnp.float32)))
        host = small._replace(A_imp=(np.asarray(jax.device_get(state.A_imp))
                                     if cfg.has_zi() else None))
        it = int(host.it)
        converged = bool(host.converged)
        save_irls_state(host, cfg, path, mesh_shape=mesh_shape)

    res = irls_mod.finalize_irls_result(cfg, state)
    if mesh is not None:
        from ..parallel.mesh import unpad_result
        res = unpad_result(res, cfg, m, n)
    return res


# ---------------------------------------------------------------------------
# Sweep-granular streaming checkpointing (round-2 review: streaming fits
# were observability-dark — no checkpoint, no callback)
# ---------------------------------------------------------------------------

def save_stream_state(path: str, cfg: NMFConfig, *, W_T, H, d, it,
                      prev_loss, patience, best_test, best_iter,
                      hist, test_hist, pi_vec=None,
                      converged: bool = False) -> None:
    """Atomically persist the host-driven streaming loop's state after a
    sweep.  The chunked loop is host-driven per panel, so sweep boundaries
    are natural checkpoint points (the analog of the fused loop's segment
    boundaries); resume is bit-exact because every piece of cross-sweep
    state is captured (factors, convergence counters, ZI pi)."""
    dirname = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp.npz")
    os.close(fd)
    arrays = dict(W_T=np.asarray(W_T), H=np.asarray(H), d=np.asarray(d),
                  hist=np.asarray(hist, np.float64),
                  test_hist=np.asarray(test_hist, np.float64))
    if pi_vec is not None:
        arrays["pi_vec"] = np.asarray(pi_vec)
    try:
        np.savez_compressed(
            tmp,
            scalars=np.asarray([float(it), float(prev_loss),
                                float(patience), float(best_test),
                                float(best_iter), float(converged)],
                               np.float64),
            config=np.asarray(_cfg_to_json(cfg)),
            **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_stream_state(path: str, cfg: NMFConfig) -> dict:
    """Load a streaming checkpoint; config must match except max_iter
    (same contract as the fused-loop checkpoints)."""
    with np.load(path, allow_pickle=False) as z:
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
        if current_mi < int(sc[0]):
            raise ValueError(
                f"checkpoint already has {int(sc[0])} sweeps but "
                f"maxit = {current_mi}")
        return {
            "W_T": np.asarray(z["W_T"], np.float32),
            "H": np.asarray(z["H"], np.float32),
            "d": np.asarray(z["d"], np.float32),
            "it": int(sc[0]), "prev_loss": float(sc[1]),
            "patience": int(sc[2]), "best_test": float(sc[3]),
            "best_iter": int(sc[4]),
            "converged": bool(sc[5] > 0.5) if len(sc) > 5 else False,
            "hist": list(np.asarray(z["hist"], np.float64)),
            "test_hist": list(np.asarray(z["test_hist"], np.float64)),
            "pi_vec": (np.asarray(z["pi_vec"], np.float32)
                       if "pi_vec" in z.files else None),
        }


def resume_kwargs(path: str) -> dict:
    """Turn a checkpoint into warm-start kwargs for nmf():
    ``nmf(A, k, **resume_kwargs("ckpt.npz"))``."""
    res = load_model(path)
    return {"w_init": np.asarray(res.W) * np.asarray(res.d)[None, :],
            "h_init": np.asarray(res.H)}
