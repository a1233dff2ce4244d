"""Pallas kernel EXPERIMENTS — measured, documented, NOT dispatched.

Each kernel here lost its bench-off against the production XLA path on the
round-1 TPU (v5e-class); the docstrings carry the full experiment records
so the work is not redone.  They are kept correct under TPU-gated parity
tests (tests/test_tpu_kernels.py) in case a future hardware generation or
shape regime changes the verdict.  Production dispatch lives in
ops/pallas_kernels.py (fused CD NNLS) and ops/linalg.py (bf16 einsums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _LANE, _pad_cols


# ---------------------------------------------------------------------------
# Weighted Gram + RHS kernel (IRLS / CV hot op)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("tc", "mt"))
def weighted_gram_pallas(F, w, A_blk, *, tc: int = 8, mt: int = 512):
    """G_j = F diag(w_j) F^T and b_j = F (w_j * a_j) without materializing
    the (n, k, m) intermediate: accumulate over m-chunks in VMEM.

    NOT DISPATCHED — and the round-4 forced-fetch in-jit slope
    re-measurement (BENCH_NOTES "fused_vmem promotion" explains the
    method; the round-1 per-call numbers 6.0 vs 1.75 ms were both
    tunnel-polluted) makes the verdict much starker: **0.117 ms** for
    the production ``linalg.weighted_gram_and_rhs`` (KR-product one-big-
    matmul path) vs **4.57 ms** for this kernel (k=16, m=13714, bc=512,
    v5e).  The per-column (k, mt)x(mt, k) matmuls are too skinny to fill
    the MXU, while the einsum batches all Grams into one contraction.
    Kept as a correct (rel err ~1e-4 vs fp32) reference for k large
    enough to tile the MXU, where the (n, k, m) bf16 intermediate
    becomes the bottleneck.

    Layout note: the column chunk (tc) must live on the SUBLANE axis —
    Pallas TPU requires lane-dim block sizes to be multiples of 128 (or the
    full array dim), so w/A are fed transposed (n, m) and b is emitted
    (n, k) then transposed back.

    F (k, m), w (m, n), A_blk (m, n) -> (Gb (n, k, k), b (k, n)).
    """
    k, m = F.shape
    n = w.shape[1]

    m_pad = ((m + mt - 1) // mt) * mt
    n_pad = ((n + tc - 1) // tc) * tc
    if m_pad != m:
        F = jnp.pad(F, ((0, 0), (0, m_pad - m)))
        w = jnp.pad(w, ((0, m_pad - m), (0, 0)))
        A_blk = jnp.pad(A_blk, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        w = jnp.pad(w, ((0, 0), (0, n_pad - n)))
        A_blk = jnp.pad(A_blk, ((0, 0), (0, n_pad - n)))
    wT = w.T                                    # (n_pad, m_pad)
    aT = A_blk.T

    grid = (n_pad // tc, m_pad // mt)

    def kernel(f_ref, w_ref, a_ref, g_out, b_out):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            g_out[:] = jnp.zeros_like(g_out)
            b_out[:] = jnp.zeros_like(b_out)

        f_tile = f_ref[:]                       # (k, mt)
        for c in range(tc):                     # static unroll
            w_c = w_ref[c, :]                   # (mt,)
            fw = f_tile * w_c[None, :]          # (k, mt)
            g_out[c, :, :] += jnp.dot(fw, f_tile.T,
                                      preferred_element_type=jnp.float32)
            wa = w_c * a_ref[c, :]              # (mt,)
            b_out[c, :] += jnp.dot(f_tile, wa[:, None],
                                   preferred_element_type=jnp.float32)[:, 0]

    Gb, bT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, mt), lambda j, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mt), lambda j, t: (j, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mt), lambda j, t: (j, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tc, k, k), lambda j, t: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, k), lambda j, t: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        ),
    )(F, wT, aT)
    return Gb[:n], bT[:n].T


# ---------------------------------------------------------------------------
# Fused Cholesky + triangular-solve + clip kernel (the MSE ALS hot solve)
# ---------------------------------------------------------------------------

def _make_chol_kernel(k: int, bc: int, nonneg: bool, upper_bound: float):
    """Statically-unrolled LL^T factorization + two substitutions.

    MOTIVATING PREMISE OVERTURNED (round-4 forced-fetch in-jit slope
    re-measurement): XLA's cholesky_clip_batch solve actually runs
    **8.8 us** per ALS solve at k=50, n=610 — the "~300 us
    triangular_solve" reading that motivated this kernel was per-call
    tunnel latency, not device time.  This kernel measures **55.4 us**
    on the same shape (its ~3k short VPU steps each carry ~1.5 us of
    Mosaic issue overhead), so the production XLA dispatch is right by
    6x.  Kept as the measured record; the same overhead figure is why
    the promoted whole-fit kernel (pallas_kernels.fused_als_vmem)
    inverts its Gram with Newton-Schulz matmuls instead of in-kernel
    substitution.  All slices are static 2-D (Pallas TPU rejects
    scalar/1-D VMEM ops); the factorization stores L AND L^T so both
    substitutions are broadcast-multiply + axis-0 reductions.
    """
    def kernel(g_ref, b_ref, out_ref, s_scr, l_scr, lt_scr, y_scr):
        rows = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
        s_scr[:] = g_ref[:]
        # ---- symmetric Schur-complement Cholesky, k static steps ----
        for j in range(k):
            inv = 1.0 / jnp.sqrt(s_scr[j:j + 1, j:j + 1])     # (1, 1)
            colL = s_scr[:, j:j + 1] * inv                    # (k, 1)
            rowL = s_scr[j:j + 1, :] * inv                    # (1, k)
            colL = colL * (rows >= j).astype(colL.dtype)
            rowL = rowL * (cols >= j).astype(rowL.dtype)
            l_scr[:, j:j + 1] = colL
            lt_scr[j:j + 1, :] = rowL
            if j + 1 < k:
                upd = colL * rowL                             # (k, k) outer
                keep = ((rows > j) & (cols > j)).astype(upd.dtype)
                s_scr[:, :] = s_scr[:, :] - upd * keep

        # zero-init: masked reads below touch not-yet-written rows, and
        # 0 * uninitialized-NaN would poison the accumulation
        y_scr[:] = jnp.zeros_like(y_scr)
        out_ref[:] = jnp.zeros_like(out_ref)

        # ---- forward substitution: L y = b ----
        for j in range(k):
            acc = b_ref[j:j + 1, :]                           # (1, bc)
            if j > 0:
                lj = lt_scr[:, j:j + 1] * (rows < j).astype(acc.dtype)
                acc = acc - jnp.sum(lj * y_scr[:, :], axis=0, keepdims=True)
            y_scr[j:j + 1, :] = acc / l_scr[j:j + 1, j:j + 1]

        # ---- back substitution: L^T x = y, THEN clip (solve-then-clip
        # like cholesky_clip.hpp — clipping inside the recurrence would
        # change the solution).  y_scr rows j.. are reused to hold the
        # unclipped x (y[j] is dead after its read at step j).
        for idx in range(k):
            j = k - 1 - idx
            acc = y_scr[j:j + 1, :]
            if idx > 0:
                cj = l_scr[:, j:j + 1] * (rows > j).astype(acc.dtype)
                acc = acc - jnp.sum(cj * y_scr[:, :] *
                                    (rows > j).astype(acc.dtype),
                                    axis=0, keepdims=True)
            x = acc / l_scr[j:j + 1, j:j + 1]
            y_scr[j:j + 1, :] = x                    # unclipped, for rows < j
            if nonneg:
                x = jnp.maximum(x, 0.0)
            if upper_bound > 0:
                x = jnp.minimum(x, upper_bound)
            out_ref[j:j + 1, :] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("nonneg", "upper_bound"))
def cholesky_clip_pallas(G, B, *, nonneg: bool = True,
                         upper_bound: float = 0.0):
    """Shared-Gram Cholesky solve + clip for all columns: G (k, k),
    B (k, n) -> X (k, n).  Caller adds any ridge to G."""
    k, n = B.shape
    dtype = B.dtype
    bc = _LANE
    B_p = _pad_cols(B, bc)
    n_pad = B_p.shape[1]

    kernel = _make_chol_kernel(k, bc, nonneg, upper_bound)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // bc,),
        in_specs=[
            pl.BlockSpec((k, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bc), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), dtype),
        scratch_shapes=[pltpu.VMEM((k, k), dtype),
                        pltpu.VMEM((k, k), dtype),
                        pltpu.VMEM((k, k), dtype),
                        pltpu.VMEM((k, bc), dtype)],
    )(G, B_p)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Whole-fit fused ALS kernel — the serving fast path
# ---------------------------------------------------------------------------

def _chol_factor_refs(k, G, s_scr, l_scr, lt_scr):
    """Factor G (k, k) value -> L into l_scr, L^T into lt_scr (ref-based,
    statically unrolled; see _make_chol_kernel).

    RETAINED RECORD: this pair was the in-kernel exact-solve alternative
    for the whole-fit ALS kernel — measured ~1.5 us of Mosaic overhead
    per unrolled substitution step (~150 us/solve at k=50), which is why
    the promoted kernel (ops/pallas_kernels.py fused_als_vmem) inverts
    the Gram with Newton-Schulz MXU matmuls instead."""
    rows = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    s_scr[:, :] = G
    for j in range(k):
        inv = 1.0 / jnp.sqrt(s_scr[j:j + 1, j:j + 1])
        colL = s_scr[:, j:j + 1] * inv * (rows >= j).astype(G.dtype)
        rowL = s_scr[j:j + 1, :] * inv * (cols >= j).astype(G.dtype)
        l_scr[:, j:j + 1] = colL
        lt_scr[j:j + 1, :] = rowL
        if j + 1 < k:
            keep = ((rows > j) & (cols > j)).astype(G.dtype)
            s_scr[:, :] = s_scr[:, :] - colL * rowL * keep


def _chol_inverse_refs(k, l_scr, lt_scr, y_scr):
    """L^-1 (k, k) from the factor refs via forward substitution on I.

    O(k^3) total — tiny next to O(k^2 * n) row-wise substitution on the
    full RHS; the solve then becomes two MXU matmuls
    X = L^-T (L^-1 B), numerically the same application order as the
    triangular solves (L^-1 is never squared into G^-1)."""
    rows = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    eye = (rows == cols).astype(jnp.float32)
    y_scr[:, :k] = jnp.zeros((k, k), jnp.float32)
    for j in range(k):
        acc = eye[j:j + 1, :]
        if j > 0:
            lj = lt_scr[:, j:j + 1] * (rows < j).astype(jnp.float32)
            acc = acc - jnp.sum(lj * y_scr[:, :k], axis=0, keepdims=True)
        y_scr[j:j + 1, :k] = acc / l_scr[j:j + 1, j:j + 1]
    return y_scr[:, :k]                                  # L^-1


# PROMOTED (round 4): the whole-fit fused ALS kernel now DISPATCHES as the
# opt-in ``fused_vmem`` config knob — implementation in
# ops/pallas_kernels.py (fused_als_vmem), XLA twin in models/nmf.py
# (_ns_als_xla), driver _fit_fused_vmem.  The round-3 experiment record
# that kept it benched here was re-measured on a quiet chip and
# OVERTURNED (BENCH_NOTES.md "fused_vmem promotion"):
#   * "Mosaic cost cliff at ns_steps >= 3" — false; ns=2 and ns=7 both
#     run ~30 us/iter fp32 on movielens k=50 (the 220 us reading was
#     tunnel link noise; timings must force a host fetch of the result,
#     plain block_until_ready on this backend returns at dispatch).
#   * "numpy replicas of the same algorithm converge at ns=1" — false;
#     a jnp replica stalls identically (sse 943k vs exact-ALS 510k).
#     The ns=1 failure is algorithmic: one warm-started Newton-Schulz
#     step cannot track the per-iteration Gram drift (error recurrence
#     e' = (e+delta)^2), so the coupled factors/inverse iteration finds
#     a different fixed point.  ns>=5 converges (510.2k fp32 / 509.9k
#     bf16-A vs 509.8k exact) — the dispatched default is ns=7.
#   * measured promoted speed: ~30 us/iter fp32 / ~15 us/iter bf16-A vs
#     the Cholesky XLA loop's slope-isolated 60.6 us/iter.


# ---------------------------------------------------------------------------
# Single-pass tall-skinny RHS (VERDICT r3 #8: movielens-class MFU push)
# ---------------------------------------------------------------------------

def _rhs_fwd_kernel(f_ref, a_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += jax.lax.dot_general(
        f_ref[...], a_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _rhs_trp_kernel(h_ref, a_ref, o_ref):
    # out block (k, bm) = H (k, n) @ A_block (bm, n)^T
    o_ref[...] = jax.lax.dot_general(
        h_ref[...], a_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _pick_bm(kp: int, np_: int, want: int = 1024) -> int:
    """Largest 8-multiple m-block whose working set (A block
    double-buffered + resident output + F block double-buffered) stays
    under ~12 MB of VMEM."""
    bm = want
    while bm > 8 and (2 * bm * np_ + kp * np_ + 2 * kp * bm) * 4 > \
            12 * 1024 ** 2:
        bm //= 2
    return max(bm, 8)


@functools.partial(jax.jit, static_argnames=("bm",))
def rhs_tall_pallas(F, A, *, bm: int = 0):
    """B = F @ A with A read from HBM EXACTLY once.

    HYPOTHESIS (round 3): XLA's fp32 dot for a tall-skinny contraction
    ((k, m) @ (m, n), k ~ 50) re-reads A per k-row-block, explaining the
    "8.7% of HBM peak" movielens roofline.  MEASURED OUTCOME (round 4,
    v5e, in-jit fori_loop slope timing): the hypothesis was FALSE — the
    8.7% figure was the fixed per-call tunnel cost spread over 300
    iterations, and XLA's dot is already effectively single-pass at both
    bench shapes (movielens k=50 3867x610: XLA 14.9 us vs 11.5 us
    one-A-pass floor; pbmc3k k=20 13714x2638: XLA 200.8 us vs 176 us
    floor).  This kernel TIES XLA at the pbmc3k shape (203.3 us) and
    LOSES at the movielens shape (21.0 us) where grid/dispatch overhead
    dominates.  NOT DISPATCHED — kept as the measured record for why.

    Mechanics: the m-axis is the GRID, the whole (k, n) output stays
    resident in VMEM across grid steps (same-block revisiting), each
    step accumulates F_blk @ A_blk — each A element crosses HBM once.
    VMEM: 2*bm*n_pad*4 (A block, double-buffered) + k*n_pad*4 (output).
    """
    k, m = F.shape
    n = A.shape[1]
    kp = -(-k // 8) * 8
    np_ = -(-n // _LANE) * _LANE
    if not bm:
        bm = _pick_bm(kp, np_)
    mp = -(-m // bm) * bm
    F_p = jnp.pad(F, ((0, kp - k), (0, mp - m)))
    A_p = jnp.pad(A, ((0, mp - m), (0, np_ - n)))
    out = pl.pallas_call(
        _rhs_fwd_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((kp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, np_), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), jnp.float32),
    )(F_p, A_p)
    return out[:k, :n]


@functools.partial(jax.jit, static_argnames=("bm",))
def rhs_tall_t_pallas(H, A, *, bm: int = 0):
    """B = H @ A^T with A (m, n) read once; grid over m OUTPUT blocks.

    The W-side mirror of :func:`rhs_tall_pallas`: H (k, n) stays fully
    resident (k*n_pad*4 bytes), each grid step reads an (bm, n) block of
    A and writes the (k, bm) output block — single pass over A, no
    transpose materialization.
    """
    k, n = H.shape
    m = A.shape[0]
    kp = -(-k // 8) * 8
    np_ = -(-n // _LANE) * _LANE
    if not bm:
        bm = _pick_bm(kp, np_)
    mp = -(-m // bm) * bm
    H_p = jnp.pad(H, ((0, kp - k), (0, np_ - n)))
    A_p = jnp.pad(A, ((0, mp - m), (0, np_ - n)))
    out = pl.pallas_call(
        _rhs_trp_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((kp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, mp), jnp.float32),
    )(H_p, A_p)
    return out[:k, :m]
