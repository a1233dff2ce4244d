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

    NOT DISPATCHED: measured 6.0 ms vs 1.75 ms for the bf16 blocked einsum
    in ``linalg.weighted_gram_and_rhs`` (k=16, m=13714, n=512, v5e) — the
    per-column (k, mt)x(mt, k) matmuls are too skinny to fill the MXU,
    while the einsum batches all tc Grams into one big contraction.  Kept
    as a correct (rel err ~1e-4 vs fp32) reference for k large enough to
    tile the MXU, where the einsum's (n, k, m) bf16 intermediate becomes
    the bottleneck.

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

    XLA's general triangular_solve costs ~300 us per ALS solve at k=50,
    n=610 (latency-bound, sequential over k with full-array ops); here the
    whole solve is ~3k short VPU steps with G pinned in VMEM.  All slices
    are static 2-D (Pallas TPU rejects scalar/1-D VMEM ops); the
    factorization stores L AND L^T so both substitutions are
    broadcast-multiply + axis-0 reductions.
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
    statically unrolled; see _make_chol_kernel)."""
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


def _make_fused_als_kernel(k: int, mp: int, np_: int, maxit: int,
                           nonneg: bool, ns_steps: int = 7,
                           ridge_rel: float = 1e-6, a_bf16: bool = True):
    """Whole-fit ALS kernel: A pinned in VMEM, solves via Newton-Schulz.

    Two walls this removes (measured on movielens k=50):
      * the XLA loop is HBM-bound — each W^T A / H A^T matmul re-reads A
        per output tile (~94 MB/iter -> ~140 us/iter just for matmuls);
        here A is VMEM-resident in bf16.
      * fine-grained in-kernel triangular factorization/substitution costs
        ~1.5 us of Mosaic overhead PER unrolled step (~300 us/iter);
        Newton-Schulz inverts the k x k Gram with ~2*ns_steps MXU matmuls
        instead, warm-started from the previous ALS iteration's inverse
        (G drifts slowly, so the quadratic iteration stays converged).
    """
    f32 = jnp.float32

    def kernel(trata_ref, a_ref, w0_ref, h0_ref, w_out, h_out, d_out,
               hist_ref, ginv_h_scr, ginv_w_scr):
        w_out[:] = w0_ref[:]
        h_out[:] = h0_ref[:]
        eye_r = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        eye_c = lax.broadcasted_iota(jnp.int32, (1, k), 1)
        eye = (eye_r == eye_c).astype(f32)
        trata = trata_ref[0, 0]
        PH = lax.Precision.HIGHEST

        def mm(X, Y):
            return jnp.dot(X, Y, precision=PH, preferred_element_type=f32)

        def gram(F):
            return mm(F, F.T)

        def ridge_of(G):
            return (ridge_rel / k) * jnp.sum(G * eye)

        def seed_inverse(G):
            # safe NS seed: G^T / (||G||_1 ||G||_inf) guarantees
            # ||I - G X0|| < 1 for SPD G
            n1 = jnp.max(jnp.sum(jnp.abs(G), axis=0))
            ninf = jnp.max(jnp.sum(jnp.abs(G), axis=1))
            return G.T / (n1 * ninf)

        def ns_refine(G, X):
            # rescale the warm start so NS is ALWAYS contractive:
            # alpha = 1/sqrt(||GX||_1 ||GX||_inf) bounds the spectrum of
            # alpha*G*X into (0, 1]; when X is already the inverse,
            # GX = I and alpha = 1 — a converged warm start is preserved
            # exactly (handles the Gram-scale jump at the first
            # normalization without a divergent iteration)
            M = mm(G, X)
            n1 = jnp.max(jnp.sum(jnp.abs(M), axis=0))
            ninf = jnp.max(jnp.sum(jnp.abs(M), axis=1))
            X = X * (1.0 / jnp.sqrt(n1 * ninf))
            for _ in range(ns_steps):
                X = mm(X, 2.0 * eye - mm(G, X))
            return X

        # seed both inverses from the initial factors
        G0 = gram(w0_ref[:])
        G0 = G0 + ridge_of(G0) * eye
        ginv_h_scr[:] = ns_refine(G0, seed_inverse(G0))
        Gw0 = gram(h0_ref[:])
        Gw0 = Gw0 + ridge_of(Gw0) * eye
        ginv_w_scr[:] = ns_refine(Gw0, seed_inverse(Gw0))

        def iteration(it, carry):
            A = a_ref[:]
            # ---- H update ----
            W = w_out[:]
            G = gram(W)
            G = G + ridge_of(G) * eye
            Ginv = ns_refine(G, ginv_h_scr[:])
            ginv_h_scr[:] = Ginv
            B = jnp.dot(W.astype(A.dtype) if a_bf16 else W, A,
                        precision=None if a_bf16 else lax.Precision.HIGHEST,
                        preferred_element_type=f32)            # (k, np_)
            Hn = mm(Ginv, B)
            if nonneg:
                Hn = jnp.maximum(Hn, 0.0)
            hs = jnp.sum(Hn, axis=1, keepdims=True)            # (k, 1)
            Hn = Hn / jnp.maximum(hs, 1e-15)
            h_out[:] = Hn
            # ---- W update ----
            Gw = gram(Hn)
            Gw = Gw + ridge_of(Gw) * eye
            Gwinv = ns_refine(Gw, ginv_w_scr[:])
            ginv_w_scr[:] = Gwinv
            Bw = lax.dot_general(Hn.astype(A.dtype) if a_bf16 else Hn, A,
                                 (((1,), (1,)), ((), ())),
                                 precision=None if a_bf16
                                 else lax.Precision.HIGHEST,
                                 preferred_element_type=f32)   # (k, mp)
            Wn = mm(Gwinv, Bw)
            if nonneg:
                Wn = jnp.maximum(Wn, 0.0)
            ws = jnp.sum(Wn, axis=1, keepdims=True)
            Wn = Wn / jnp.maximum(ws, 1e-15)
            w_out[:] = Wn
            d = ws[:, 0:1]                                     # (k, 1)
            d_out[:] = d
            # ---- saved-matrix Gram-trick loss (fit_cpu.hpp:1710-1753) ----
            cross = jnp.sum(d * Wn * Bw)
            Gwt = gram(Wn)
            recon = jnp.sum((d * d.T) * Gwt * Gw)
            loss = trata - 2.0 * cross + recon
            hist_ref[pl.ds(it, 1), :] = loss.reshape(1, 1)
            return carry

        lax.fori_loop(0, maxit, iteration, jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("maxit", "nonneg", "a_bf16",
                                             "ns_steps"))
def fused_als_pallas(A, W_T0, H0, *, maxit: int, nonneg: bool = True,
                     a_bf16: bool = True, ns_steps: int = 7):
    """Run an ENTIRE dense MSE ALS fit (fixed iteration count, L1 norm)
    in one Pallas program with A resident in VMEM.

    NOT DISPATCHED — experiment record (movielens k=50, maxit=300, v5e):
      * XLA while-loop baseline: ~155-230 us/iter, HBM-bound (A re-read
        per matmul output tile, ~94 MB/iter).
      * this kernel, ns_steps=7 (accurate, sse matches the exact-ALS
        optimum): ~220 us/iter — no win; Mosaic hits a cost cliff when
        the NS chain exceeds ~2 steps (13 us/iter at ns=1 vs ~220 at
        ns>=3, consistent with a VMEM-pressure/serialization threshold).
      * ns_steps=1: 11-13 us/iter (the VMEM-resident dream number) but
        the bf16 RHS matmuls leave the warm-started inverse too inexact
        to converge (sse 963k vs 510k) — fp64/fp32 numpy replicas of the
        same algorithm DO converge at ns=1, isolating the bf16 B as the
        accuracy gap.
      * fp32-A compiles once vmem_limit_bytes is raised to 100 MB and
        also hits 11 us/iter at ns=1 — but STILL converges to sse ~912k
        (vs 510k), while fp32 numpy replicas of the identical algorithm
        converge at ns=1; the in-kernel discrepancy is unresolved.
      * per-config timings fluctuate up to ~30x between runs through the
        axon tunnel — a dedicated/stable TPU is needed to finish this.
    Future angle: debug the ns=1 in-kernel accuracy gap (scratch
    round-trip through VMEM refs?), then bf16x2 split-precision RHS.

    A (m, n) with m*n*2 bytes (bf16) <= ~11 MB; returns
    (W_T, H, d, loss_hist).
    """
    m, n = A.shape
    k = W_T0.shape[0]
    mp = ((m + _LANE - 1) // _LANE) * _LANE
    np_ = ((n + _LANE - 1) // _LANE) * _LANE
    A_p = jnp.pad(A, ((0, mp - m), (0, np_ - n))).astype(
        jnp.bfloat16 if a_bf16 else jnp.float32)
    W_p = jnp.pad(W_T0, ((0, 0), (0, mp - m)))
    H_p = jnp.pad(H0, ((0, 0), (0, np_ - n)))
    trata = jnp.sum(A * A, dtype=jnp.float32).reshape(1, 1)

    kernel = _make_fused_als_kernel(k, mp, np_, maxit, nonneg,
                                    ns_steps=ns_steps, a_bf16=a_bf16)
    W_T, H, d, hist = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((mp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((maxit, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, mp), jnp.float32),
            jax.ShapeDtypeStruct((k, np_), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((maxit, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32),
                        pltpu.VMEM((k, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(trata, A_p, W_p, H_p)
    return W_T[:, :m], H[:, :n], d[:, 0], hist[:, 0]


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
