"""Pallas TPU kernels for the hot solver paths.

The coordinate-descent NNLS sweep (primitives/cpu/nnls_batch.hpp:71-132)
is k-sequential: as plain lax ops each coordinate step costs several tiny
kernel launches, so a k=50 solve with ~3 warm sweeps burns ~1k launches.
These kernels run the ENTIRE solve — all sweeps, all coordinates, residual
updates and the per-column convergence freeze — inside one Pallas program
with the Gram matrix (or per-column Gram block) pinned in VMEM and columns
spread across lanes.  This is the TPU analog of the reference's fused
RHS+NNLS design (primitives/cpu/fused_nnls.hpp).

Layouts (columns on the 128-lane axis):
  * shared-Gram:  G (k, k) whole in VMEM; B/X tiles (k, BC)
  * batched-Gram: G_flat (k*ks, n) tiled to (k*ks, BC) — coordinate i's
    Gram column for every lane occupies rows i*ks .. i*ks+k, with
    ks = round_up(k, 8) so dynamic block starts are sublane-aligned.

All state mutation goes through VMEM refs with ``pl.ds`` dynamic slices
(value-level dynamic_slice does not lower on TPU Pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants

_LANE = 128


def _pad_cols(X, bc):
    n = X.shape[-1]
    pad = (-n) % bc
    if pad:
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, pad)])
    return X


def _pick_bc(k: int, n: int, batched: bool) -> int:
    """Columns per kernel instance (a multiple of the 128-lane width).

    The per-coordinate CD chain is strictly sequential, so each link is a
    handful of small VPU ops whose latency cannot be hidden within one
    lane-tile; running SEVERAL independent lane-tiles per instance gives
    the compiler parallel work per link.  Results are bitwise identical
    for any width (each lane's freeze/trajectory depends only on its own
    column) — measured on v5e: k=16, n=13714, 100 sweeps: 9.5 ms at
    bc=128 -> 2.4 ms at bc=1024; n=2638: best at 512 (wider blocks
    couple more lanes to one max-lane sweep count, so the early-exit
    coarsens — hence the n-aware cap).

    VMEM bound (batched): the (k*ks, bc) Gram tile double-buffers (the
    four (k, bc) side buffers are counted once each with slack) — keep
    under ~12 MB of the 16 MB VMEM.  Verified compiling on v5e at
    k=16/bc=1024, k=50/bc=512, k=100/bc=128; k=100/bc=256 (~21 MB) is
    the measured compile failure the bound must stay below.
    """
    bc = 1024 if n >= 8192 else 512
    if batched:
        ks = _gram_stride(k)
        while bc > _LANE and (k * ks * 2 + 8 * k) * bc * 4 > 12.5 * 1024 ** 2:
            bc //= 2
    else:
        # shared path: the (k*ks, 1) Gram is negligible, but the four
        # (k, bc) side buffers double-buffer — bound them too so direct
        # callers with large k stay within VMEM (the dispatch layer caps
        # k at 100, but cd_nnls_pallas_shared is public; ADVICE r3)
        while bc > _LANE and 8 * k * bc * 4 > 12.5 * 1024 ** 2:
            bc //= 2
    # don't pad tiny column counts up to a huge block
    n_tiles = -(-max(n, 1) // _LANE)
    bc = min(bc, n_tiles * _LANE)
    return max(bc, _LANE)


def _gram_stride(k: int) -> int:
    """Rows per coordinate block in the flattened Gram layout.

    Dynamic (k, bc) VMEM loads need a start index Mosaic can prove is a
    multiple of the 8-sublane tile, so coordinate i's Gram column starts
    at i * round_up(k, 8) instead of i * k (zero-padded rows between)."""
    return -(-k // 8) * 8


def _make_cd_kernel(k: int, bc: int, nonneg: bool, maxit: int,
                    upper_bound: float, batched: bool):
    """Build the fused CD kernel body.

    Refs: (l1, tol scalars in SMEM), g_ref — (k*ks, 1) shared or
    (k*ks, bc) batched with ks = _gram_stride(k) — b_ref (k, bc),
    x_ref (k, bc), out_ref (k, bc), b_scratch.
    """
    inv_k = 1.0 / k
    abs_tol = constants.CD_ABS_TOL
    ks = _gram_stride(k)

    def kernel(l1_ref, tol_ref, g_ref, b_ref, x_ref, out_ref, b_scr):
        L1 = l1_ref[0, 0]
        cd_tol = tol_ref[0, 0]
        out_ref[:] = x_ref[:]
        b_scr[:] = b_ref[:]

        def coord(i, carry):
            tol_sum, active = carry
            # g_ref holds flattened per-coordinate Gram columns: rows
            # i*ks..i*ks+k are G[:, i] — (k*ks, bc) batched / (k*ks, 1)
            # shared (ks-row stride keeps the block start 8-aligned)
            g_col = g_ref[pl.ds(i * ks, k), :]                 # (k, bc|1)
            g_d = g_ref[pl.ds(i * ks + i, 1), :]               # (1, bc|1)
            b_i = b_scr[pl.ds(i, 1), :]                        # (1, bc)
            x_i = out_ref[pl.ds(i, 1), :]
            # dead coordinates (g <= 0) are skipped entirely, L1 included
            # (nnls_batch.hpp:90 'continue'; bit-parity with ops/solvers.py)
            diff = jnp.where(g_d > 0, b_i / jnp.where(g_d > 0, g_d, 1.0) - L1,
                             0.0)
            new_val = x_i + diff
            if nonneg:
                new_val = jnp.maximum(new_val, 0.0)
            if upper_bound > 0:
                new_val = jnp.minimum(new_val, upper_bound)
            actual = (new_val - x_i) * active
            out_ref[pl.ds(i, 1), :] = x_i + actual
            b_scr[:] = b_scr[:] - g_col * actual               # rank-1 update
            tol_sum = tol_sum + jnp.abs(actual) / (jnp.abs(x_i + actual) +
                                                   abs_tol)
            return tol_sum, active

        def sweep(carry):
            active, it = carry
            tol_sum, active = lax.fori_loop(
                0, k, coord,
                (jnp.zeros((1, bc), out_ref.dtype), active))
            still = (tol_sum * inv_k >= cd_tol).astype(out_ref.dtype)
            return active * still, it + 1

        def cond(carry):
            active, it = carry
            return (it < maxit) & (jnp.max(active) > 0)

        lax.while_loop(cond, sweep,
                       (jnp.ones((1, bc), out_ref.dtype), jnp.int32(0)))

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "nonneg", "maxit", "upper_bound"))
def cd_nnls_pallas_shared(G, B_res, X0, L1, cd_tol, *, nonneg: bool,
                          maxit: int, upper_bound: float = 0.0):
    """Shared-Gram CD NNLS: G (k, k), B_res/X0 (k, n) residual-form."""
    k, n = B_res.shape
    dtype = B_res.dtype
    bc = _pick_bc(k, n, batched=False)
    B_p = _pad_cols(B_res, bc)
    X_p = _pad_cols(X0, bc)
    n_pad = B_p.shape[1]
    L1v = jnp.asarray(L1, dtype).reshape(1, 1)
    tolv = jnp.asarray(cd_tol, dtype).reshape(1, 1)
    # flatten column-major with an 8-aligned per-coordinate row stride:
    # rows i*ks..i*ks+k hold G[:, i]
    ks = _gram_stride(k)
    G_flat = jnp.pad(G.T, ((0, 0), (0, ks - k))).reshape(k * ks, 1)

    kernel = _make_cd_kernel(k, bc, nonneg, maxit, upper_bound,
                             batched=False)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // bc,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k * ks, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bc), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), dtype),
        scratch_shapes=[pltpu.VMEM((k, bc), dtype)],
    )(L1v, tolv, G_flat, B_p, X_p)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=(
    "nonneg", "maxit", "upper_bound"))
def cd_nnls_pallas_batched(Gb, B_res, X0, L1, cd_tol, *, nonneg: bool,
                           maxit: int, upper_bound: float = 0.0):
    """Per-column-Gram CD NNLS: Gb (n, k, k), B_res/X0 (k, n)."""
    k, n = B_res.shape
    dtype = B_res.dtype
    bc = _pick_bc(k, n, batched=True)
    # flatten per-column Grams to (k*ks, n) with an 8-aligned row stride:
    # rows i*ks..i*ks+k hold coordinate i's Gram column for every lane
    ks = _gram_stride(k)
    G_flat = jnp.pad(jnp.transpose(Gb, (2, 1, 0)),
                     ((0, 0), (0, ks - k), (0, 0))).reshape(k * ks, n)
    G_p = _pad_cols(G_flat, bc)
    B_p = _pad_cols(B_res, bc)
    X_p = _pad_cols(X0, bc)
    n_pad = B_p.shape[1]
    L1v = jnp.asarray(L1, dtype).reshape(1, 1)
    tolv = jnp.asarray(cd_tol, dtype).reshape(1, 1)

    kernel = _make_cd_kernel(k, bc, nonneg, maxit, upper_bound, batched=True)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // bc,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k * ks, bc), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bc), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), dtype),
        scratch_shapes=[pltpu.VMEM((k, bc), dtype)],
    )(L1v, tolv, G_p, B_p, X_p)
    return out[:, :n]


def pallas_available() -> bool:
    """Pallas TPU kernels only run on real TPU backends."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
