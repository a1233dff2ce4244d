"""TPU-hardware-gated Pallas kernel parity tests.

The analog of the reference's GPU accuracy suite
(tests/testthat/test_gpu_accuracy.R:24 ``skip_if_not(gpu_available())``).
Run on the bench TPU with:

    RCPPML_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

Only ONE process may hold the axon TPU tunnel — never run this alongside
another TPU process (bench.py, a REPL, ...).  Under a normal test run the
conftest forces the CPU backend and every test here self-skips.

Parity contract (BENCH_NOTES.md): the fused CD kernels are BIT-IDENTICAL
to the lax implementations — both run the same sweep/freeze arithmetic in
fp32, so the assertion is array_equal, not allclose.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu_ok,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="Pallas TPU kernels need TPU hardware "
               "(run with RCPPML_TPU_TESTS=1)"),
]


def _spd_system(k, n, seed, dead_coord=False):
    rs = np.random.RandomState(seed)
    F = np.abs(rs.normal(size=(k, max(2 * k, 64)))).astype(np.float32)
    if dead_coord:
        F[k // 2, :] = 0.0
    G = (F @ F.T).astype(np.float32)
    B = rs.normal(size=(k, n)).astype(np.float32)
    X0 = np.abs(rs.normal(size=(k, n))).astype(np.float32)
    return G, B, X0


@pytest.mark.parametrize("k,l1", [(8, 0.0), (50, 0.25), (100, 0.0)])
def test_cd_shared_bit_parity(k, l1):
    from rcppml_tpu.ops.solvers import _cd_sweeps
    from rcppml_tpu.ops.pallas_kernels import cd_nnls_pallas_shared
    G, B, X0 = _spd_system(k, 300, seed=k)
    B_res = B - G @ X0
    args = (jnp.asarray(G), jnp.asarray(B_res), jnp.asarray(X0),
            jnp.float32(l1), jnp.float32(1e-8))
    lax_out = np.asarray(_cd_sweeps.__wrapped__(
        *args, nonneg=True, maxit=100, l1_static=True))
    pl_out = np.asarray(cd_nnls_pallas_shared(
        *args, nonneg=True, maxit=100))
    np.testing.assert_array_equal(pl_out, lax_out)


@pytest.mark.parametrize("k", [8, 50, 100])
def test_cd_batched_bit_parity(k):
    from rcppml_tpu.ops import solvers
    from rcppml_tpu.ops.pallas_kernels import cd_nnls_pallas_batched
    n = 257
    rs = np.random.RandomState(k + 1)
    Gb = np.zeros((n, k, k), np.float32)
    for j in range(n):
        F = np.abs(rs.normal(size=(k, 2 * k))).astype(np.float32)
        Gb[j] = F @ F.T
    B = rs.normal(size=(k, n)).astype(np.float32)
    X0 = np.abs(rs.normal(size=(k, n))).astype(np.float32)
    B_res = B - np.einsum("nij,jn->in", Gb, X0).astype(np.float32)

    # lax path: force it by calling the module-level implementation with a
    # CPU-only dispatch guard bypassed via the private sweep body
    import rcppml_tpu.ops.solvers as S
    orig = S._pallas_ok
    S._pallas_ok = lambda k_: False
    try:
        lax_out = np.asarray(solvers.cd_nnls_batched_gram(
            jnp.asarray(Gb), jnp.asarray(B_res), jnp.asarray(X0), 0.1,
            nonneg=True, maxit=100, cd_tol=1e-8))
    finally:
        S._pallas_ok = orig
    # the direct kernel call must see the same EFFECTIVE tol the solver
    # layer applies (fp32 floor, constants.CD_TOL_F32_FLOOR)
    eff_tol = S._eff_cd_tol(1e-8, np.float32)
    pl_out = np.asarray(cd_nnls_pallas_batched(
        jnp.asarray(Gb), jnp.asarray(B_res), jnp.asarray(X0),
        jnp.float32(0.1), jnp.float32(eff_tol), nonneg=True, maxit=100))
    np.testing.assert_array_equal(pl_out, lax_out)


def test_cd_shared_dead_coordinate_parity():
    """The L1 dead-coordinate gate (nnls_batch.hpp:90) must agree bit-for-
    bit between the kernel and the lax sweep."""
    from rcppml_tpu.ops.solvers import _cd_sweeps
    from rcppml_tpu.ops.pallas_kernels import cd_nnls_pallas_shared
    G, B, X0 = _spd_system(16, 200, seed=5, dead_coord=True)
    B_res = B - G @ X0
    args = (jnp.asarray(G), jnp.asarray(B_res), jnp.asarray(X0),
            jnp.float32(0.4), jnp.float32(1e-8))
    lax_out = np.asarray(_cd_sweeps.__wrapped__(
        *args, nonneg=True, maxit=100, l1_static=True))
    pl_out = np.asarray(cd_nnls_pallas_shared(*args, nonneg=True, maxit=100))
    np.testing.assert_array_equal(pl_out, lax_out)
    np.testing.assert_array_equal(pl_out[8], X0[8])   # untouched dead row


# ---------------------------------------------------------------------------
# Experiment kernels (ops/pallas_experiments.py) — kept correct even though
# they are not dispatched (each lost its round-1 bench-off; see docstrings)
# ---------------------------------------------------------------------------

def test_weighted_gram_pallas_correct():
    from rcppml_tpu.ops.pallas_experiments import weighted_gram_pallas
    rs = np.random.RandomState(2)
    k, m, bc = 16, 512, 8
    F = np.abs(rs.normal(size=(k, m))).astype(np.float32)
    w = rs.uniform(0.1, 2.0, size=(m, bc)).astype(np.float32)
    A = np.abs(rs.normal(size=(m, bc))).astype(np.float32)
    Gb, b = weighted_gram_pallas(jnp.asarray(F), jnp.asarray(w),
                                 jnp.asarray(A), tc=bc, mt=256)
    G_ref = np.einsum("im,mj,lm->jil", F, w, F)         # (bc, k, k)
    b_ref = F @ (w * A)
    # MXU matmuls take bf16-rounded inputs even with f32 accumulation:
    # measured ~5e-4 max rel err on the v5e (docstring experiment record)
    np.testing.assert_allclose(np.asarray(Gb), G_ref, rtol=2e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=2e-3, atol=5e-2)


def test_cholesky_clip_pallas_correct():
    from rcppml_tpu.ops.pallas_experiments import cholesky_clip_pallas
    from rcppml_tpu.ops.solvers import cholesky_clip_batch
    G, B, _ = _spd_system(24, 200, seed=9)
    G = G + 1e-3 * np.eye(24, dtype=np.float32)
    X_k = np.asarray(cholesky_clip_pallas(jnp.asarray(G), jnp.asarray(B)))
    X_ref = np.asarray(cholesky_clip_batch(jnp.asarray(G), jnp.asarray(B)))
    np.testing.assert_allclose(X_k, X_ref, rtol=5e-3, atol=5e-4)


def test_fused_als_vmem_runs_and_reconstructs():
    from rcppml_tpu.ops.pallas_kernels import fused_als_vmem
    from rcppml_tpu.models.nmf import init_factors
    import rcppml_tpu as rt
    rs = np.random.RandomState(4)
    W = np.abs(rs.normal(size=(96, 4))).astype(np.float32)
    H = np.abs(rs.normal(size=(4, 120))).astype(np.float32)
    A = (W @ H).astype(np.float32)
    cfg = rt.build_config(4, seed=7, maxit=60, sort_model=False)
    W_T0, H0, _ = init_factors(cfg, A.shape[0], A.shape[1], A=A)
    W_T, Hk, d, hist = fused_als_vmem(
        jnp.asarray(A), jnp.asarray(W_T0), jnp.asarray(H0), maxit=60)
    rec = np.asarray(W_T).T @ np.diag(np.asarray(d)) @ np.asarray(Hk)
    rel = np.linalg.norm(A - rec) / np.linalg.norm(A)
    assert np.isfinite(rel) and rel < 0.05, f"fused ALS rel err {rel}"


def test_fused_als_vmem_matches_xla_twin():
    """The Pallas kernel and the backend-portable XLA twin run the SAME
    Newton-Schulz ALS — converged losses must agree closely (they are
    separate lowerings, so allclose not array_equal)."""
    from rcppml_tpu.models.nmf import _ns_als_xla, init_factors
    from rcppml_tpu.ops.pallas_kernels import fused_als_vmem
    import rcppml_tpu as rt
    rs = np.random.RandomState(11)
    W = np.abs(rs.normal(size=(256, 6))).astype(np.float32)
    H = np.abs(rs.normal(size=(6, 200))).astype(np.float32)
    A = (W @ H + 0.3 * rs.rand(256, 200)).astype(np.float32)
    cfg = rt.build_config(6, seed=3, maxit=120, tol=0.0, sort_model=False)
    W_T0, H0, _ = init_factors(cfg, 256, 200, A=A)
    args = (jnp.asarray(A), jnp.asarray(W_T0), jnp.asarray(H0))
    _, _, _, hist_k = fused_als_vmem(*args, maxit=120)
    _, _, _, hist_x = _ns_als_xla(*args, maxit=120)
    lk, lx = float(np.asarray(hist_k)[-1]), float(np.asarray(hist_x)[-1])
    assert abs(lk - lx) / abs(lx) < 1e-3, (lk, lx)


def test_fused_vmem_end_to_end_dispatch():
    """rt.nmf(..., fused_vmem=True) on the TPU routes through the Pallas
    kernel and reaches the Cholesky loop's converged loss (movielens-class
    check at reduced size for suite budget)."""
    import rcppml_tpu as rt
    rs = np.random.RandomState(2)
    W = np.abs(rs.normal(size=(384, 8))).astype(np.float32)
    H = np.abs(rs.normal(size=(8, 256))).astype(np.float32)
    A = np.maximum(W @ H + 0.3 * rs.rand(384, 256), 0).astype(np.float32)
    base = rt.nmf(A, 8, seed=7, maxit=200, tol=0.0, sort_model=False)
    fv = rt.nmf(A, 8, seed=7, maxit=200, tol=0.0, sort_model=False,
                fused_vmem=True)
    b, f = base.loss_history[-1], fv.loss_history[-1]
    assert abs(b - f) / abs(b) < 1e-2, (b, f)


def test_fill_uniform_traced_bit_parity_tpu():
    """TPU lowering of clz/ldexp must keep the device init bit-identical
    to the host SplitMix64 fill (verified on v5e 2026-08-19; this pins it
    against backend/compiler drift)."""
    import jax
    import numpy as np
    from rcppml_tpu import rng
    for seed in (1, 42, 2 ** 40 + 3):
        h = rng.fill_uniform(seed, 16, 1337)
        d = np.asarray(jax.jit(
            lambda s=seed: rng.fill_uniform_traced(s, 16, 1337))())
        np.testing.assert_array_equal(h, d)
