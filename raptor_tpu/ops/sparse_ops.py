"""Core sparse linear algebra on padded-ELL matrices, all jit-traceable.

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): the reference AMG stack's SpMV (`mult()/residual()`)
and SpGEMM / Galerkin RAP triple product (SURVEY.md §2b C5/C6;
BASELINE.json:5 — "SpMV and the Galerkin RAP triple-product SpGEMM are Pallas
kernels using gather/segment_sum instead of indirect CPU addressing").

TPU-first design:
* Entry-major (K, n) layout means every op here is a full-width vector op
  over the lane axis; gathers are XLA one-hot-free dynamic gathers that TPU
  lowers natively.  A Pallas fast path for the solve-critical SpMV lives in
  ``raptor_tpu.ops.pallas``; this module is the portable/reference path and
  the only implementation of the (setup-only) SpGEMM.
* SpGEMM output size is data-dependent, which XLA cannot express; we use the
  expand -> sort-by-column -> run-merge (segment-sum) scheme with a static
  output width.  The two-phase host wrapper (`spgemm`) measures the true
  width with one device round-trip per setup level (the level loop is
  host-driven anyway, SURVEY.md §3b stack 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix

__all__ = [
    "spmv",
    "ell_transpose",
    "spgemm",
    "spgemm_fixed",
    "ell_add",
    "ell_filter",
    "rap",
]


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def spmv(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x.  x has length A.n_cols_pad; y has length A.n_rows_pad.

    Padding slots hold value 0 with a valid gather index, so no mask is
    needed; the reduction over the (small, static) K axis keeps the lane axis
    full-width.
    """
    return jnp.sum(A.data * jnp.take(x, A.cols, axis=0), axis=0)


def spmv_t(A: EllMatrix, y: jax.Array) -> jax.Array:
    """x = A.T @ y via scatter-add (used where a materialized transpose is
    not worth storing).  y has length n_rows_pad; result n_cols_pad."""
    contrib = A.data * y[None, :]
    contrib = jnp.where(A.slot_mask(), contrib, 0)
    out = jnp.zeros(A.n_cols_pad, dtype=A.dtype)
    return out.at[A.cols].add(contrib, mode="drop")


# ---------------------------------------------------------------------------
# Row-wise merge machinery (shared by SpGEMM and ell_add)
# ---------------------------------------------------------------------------

def _merge_sorted_rows(cols, vals, sentinel, k_out):
    """Merge duplicate columns in per-row sorted (W, n) col/val arrays.

    ``cols`` must be ascending along axis 0 within each row (column of the
    array), with ``sentinel`` marking invalid slots (sorted to the end).
    Returns (out_cols, out_vals, row_nnz) with static width ``k_out``; runs
    beyond ``k_out`` are dropped (caller guarantees capacity).
    """
    W, n = cols.shape
    first = jnp.concatenate(
        [jnp.ones((1, n), bool), cols[1:] != cols[:-1]], axis=0
    )
    is_real = cols < sentinel
    newrun = first & is_real
    run = jnp.cumsum(newrun.astype(jnp.int32), axis=0) - 1
    pos = jnp.where(is_real, run, k_out)  # invalid -> dropped
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, n), 1)

    out_vals = jnp.zeros((k_out, n), vals.dtype).at[pos, lane].add(vals, mode="drop")
    out_cols = (
        jnp.zeros((k_out, n), cols.dtype).at[pos, lane].max(cols, mode="drop")
    )
    row_nnz = jnp.sum(newrun, axis=0).astype(jnp.int32)
    return out_cols, out_vals, row_nnz


def _fix_padding_cols(cols, row_nnz, n_cols_pad):
    """Point padding slots at column 0 (value-0 semantics; stays valid if the
    logical column space is tightened after setup)."""
    del n_cols_pad
    k_out, n = cols.shape
    k = jax.lax.broadcasted_iota(jnp.int32, (k_out, n), 0)
    return jnp.where(k < row_nnz[None, :], cols, 0)


# ---------------------------------------------------------------------------
# SpGEMM
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k_out",))
def spgemm_fixed(A: EllMatrix, B: EllMatrix, k_out: int) -> EllMatrix:
    """C = A @ B with static output width ``k_out`` (jit-traceable).

    Expand: for each A slot (value a_ik at column k) gather B's row k —
    producing (Kb, Ka, n) candidate entries — then sort each output row's
    candidates by column and segment-merge duplicates.  This is the
    gather/segment-sum SpGEMM of BASELINE.json:5.
    """
    Ka, n = A.data.shape
    Kb = B.data.shape[0]
    sent = jnp.int32(B.n_cols_pad)

    bcols = jnp.take(B.cols, A.cols, axis=1)  # (Kb, Ka, n)
    bvals = jnp.take(B.data, A.cols, axis=1)  # (Kb, Ka, n)
    bnnz = jnp.take(B.row_nnz, A.cols, axis=0)  # (Ka, n)

    prods = A.data[None, :, :] * bvals
    kb = jax.lax.broadcasted_iota(jnp.int32, (Kb, Ka, n), 0)
    valid = A.slot_mask()[None, :, :] & (kb < bnnz[None, :, :])
    cols = jnp.where(valid, bcols, sent).reshape(Kb * Ka, n)
    vals = jnp.where(valid, prods, 0).reshape(Kb * Ka, n)

    cols, vals = jax.lax.sort((cols, vals), dimension=0, num_keys=1)
    out_cols, out_vals, row_nnz = _merge_sorted_rows(cols, vals, sent, k_out)
    out_cols = _fix_padding_cols(out_cols, row_nnz, B.n_cols_pad)
    return EllMatrix(
        data=out_vals,
        cols=out_cols,
        row_nnz=row_nnz,
        shape=(A.shape[0], B.shape[1]),
        n_rows_pad=A.n_rows_pad,
        n_cols_pad=B.n_cols_pad,
    )


@partial(jax.jit)
def _spgemm_width(A: EllMatrix, B: EllMatrix) -> jax.Array:
    """Max distinct columns of any row of A @ B (for the two-phase wrapper)."""
    Ka, n = A.data.shape
    Kb = B.data.shape[0]
    sent = jnp.int32(B.n_cols_pad)
    bcols = jnp.take(B.cols, A.cols, axis=1)
    bnnz = jnp.take(B.row_nnz, A.cols, axis=0)
    kb = jax.lax.broadcasted_iota(jnp.int32, (Kb, Ka, n), 0)
    valid = A.slot_mask()[None, :, :] & (kb < bnnz[None, :, :])
    cols = jnp.where(valid, bcols, sent).reshape(Kb * Ka, n)
    cols = jax.lax.sort(cols, dimension=0)
    first = jnp.concatenate([jnp.ones((1, n), bool), cols[1:] != cols[:-1]], axis=0)
    counts = jnp.sum(first & (cols < sent), axis=0)
    return jnp.max(counts)


def spgemm(A: EllMatrix, B: EllMatrix, k_out: int | None = None) -> EllMatrix:
    """C = A @ B (host wrapper: measures the exact output width, then runs
    the static-width kernel).  One host sync; setup-path only."""
    if k_out is None:
        k_out = max(int(_spgemm_width(A, B)), 1)
    return spgemm_fixed(A, B, k_out=k_out)


def rap(R: EllMatrix, A: EllMatrix, P: EllMatrix) -> EllMatrix:
    """Galerkin coarse operator A_c = R @ A @ P (SURVEY.md §3b stack 4)."""
    AP = spgemm(A, P)
    return spgemm(R, AP)


# ---------------------------------------------------------------------------
# Transpose
# ---------------------------------------------------------------------------

@partial(jax.jit)
def _transpose_col_counts(A: EllMatrix) -> jax.Array:
    drop = jnp.where(A.slot_mask(), A.cols, A.n_cols_pad).ravel()
    ones = jnp.ones(drop.shape[0], jnp.int32)
    return jnp.zeros(A.n_cols_pad, jnp.int32).at[drop].add(ones, mode="drop")


@partial(jax.jit, static_argnames=("k_out",))
def ell_transpose_fixed(A: EllMatrix, k_out: int) -> EllMatrix:
    """A.T with static output width ``k_out`` (jit-traceable).

    Global sort of all entries by (new_row=old_col, new_col=old_row); the
    secondary key keeps output rows column-sorted.  Slot index within each
    run via cummax of run starts.
    """
    N = A.K * A.n_rows_pad
    new_row = jnp.where(A.slot_mask(), A.cols, A.n_cols_pad).ravel()
    new_col = A.row_index().ravel()
    vals = A.data.ravel()
    new_row, new_col, vals = jax.lax.sort((new_row, new_col, vals), num_keys=2)

    idx = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), new_row[1:] != new_row[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, idx, 0))
    slot = idx - run_start
    is_real = new_row < A.n_cols_pad
    slot = jnp.where(is_real, slot, k_out)  # drop invalid
    tgt_row = jnp.where(is_real, new_row, 0)

    out_data = (
        jnp.zeros((k_out, A.n_cols_pad), A.dtype)
        .at[slot, tgt_row]
        .add(vals, mode="drop")
    )
    out_cols = (
        jnp.zeros((k_out, A.n_cols_pad), jnp.int32)
        .at[slot, tgt_row]
        .max(new_col, mode="drop")
    )
    row_nnz = _transpose_col_counts(A)
    out_cols = _fix_padding_cols(out_cols, row_nnz, A.n_rows_pad)
    return EllMatrix(
        data=out_data,
        cols=out_cols,
        row_nnz=row_nnz,
        shape=(A.shape[1], A.shape[0]),
        n_rows_pad=A.n_cols_pad,
        n_cols_pad=A.n_rows_pad,
    )


def ell_transpose(A: EllMatrix, k_out: int | None = None) -> EllMatrix:
    """A.T (host wrapper with exact-width measurement)."""
    if k_out is None:
        k_out = max(int(jnp.max(_transpose_col_counts(A))), 1)
    return ell_transpose_fixed(A, k_out=k_out)


# ---------------------------------------------------------------------------
# Addition (pattern union)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k_out",))
def ell_add_fixed(
    A: EllMatrix, B: EllMatrix, k_out: int, alpha: float = 1.0, beta: float = 1.0
) -> EllMatrix:
    """alpha*A + beta*B with static output width (same padded shapes)."""
    assert A.n_rows_pad == B.n_rows_pad and A.n_cols_pad == B.n_cols_pad
    sent = jnp.int32(A.n_cols_pad)
    cols = jnp.concatenate(
        [
            jnp.where(A.slot_mask(), A.cols, sent),
            jnp.where(B.slot_mask(), B.cols, sent),
        ],
        axis=0,
    )
    vals = jnp.concatenate(
        [
            jnp.where(A.slot_mask(), alpha * A.data, 0),
            jnp.where(B.slot_mask(), beta * B.data.astype(A.dtype), 0),
        ],
        axis=0,
    )
    cols, vals = jax.lax.sort((cols, vals), dimension=0, num_keys=1)
    out_cols, out_vals, row_nnz = _merge_sorted_rows(cols, vals, sent, k_out)
    out_cols = _fix_padding_cols(out_cols, row_nnz, A.n_cols_pad)
    return EllMatrix(
        data=out_vals,
        cols=out_cols,
        row_nnz=row_nnz,
        shape=A.shape,
        n_rows_pad=A.n_rows_pad,
        n_cols_pad=A.n_cols_pad,
    )


def ell_add(A: EllMatrix, B: EllMatrix, alpha=1.0, beta=1.0) -> EllMatrix:
    return ell_add_fixed(A, B, k_out=A.K + B.K, alpha=alpha, beta=beta)


# ---------------------------------------------------------------------------
# Sparsification (PAPERS.md:6 — "Reducing Parallel Communication in AMG
# through Sparsification"; also SURVEY.md §7 hard part 3: padding blowup)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k_out",))
def ell_filter_fixed(A: EllMatrix, tol: float, k_out: int) -> EllMatrix:
    """Drop off-diagonal entries with |a_ij| < tol * max_k |a_ik| and lump
    them into the diagonal (preserves row sums, keeps the operator SPD-ish).
    Shrinks ELL width and, in the distributed setting, halo traffic."""
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    mag = jnp.where(off, jnp.abs(A.data), 0)
    row_max = jnp.max(mag, axis=0)
    drop = off & (mag < tol * row_max[None, :])
    lump = jnp.sum(jnp.where(drop, A.data, 0), axis=0)

    keep = A.slot_mask() & ~drop
    sent = jnp.int32(A.n_cols_pad)
    cols = jnp.where(keep, A.cols, sent)
    is_diag = keep & (A.cols == row)
    vals = jnp.where(keep, A.data + jnp.where(is_diag, lump[None, :], 0), 0)
    cols, vals = jax.lax.sort((cols, vals), dimension=0, num_keys=1)
    oc, ov, nnz = _merge_sorted_rows(cols, vals, sent, k_out)
    oc = _fix_padding_cols(oc, nnz, A.n_cols_pad)
    return EllMatrix(
        data=ov, cols=oc, row_nnz=nnz, shape=A.shape,
        n_rows_pad=A.n_rows_pad, n_cols_pad=A.n_cols_pad,
    )


def ell_filter(A: EllMatrix, tol: float) -> EllMatrix:
    """Host wrapper: filter then compact to the measured max width."""
    if tol <= 0:
        return A
    F = ell_filter_fixed(A, tol, A.K)
    k = max(int(jnp.max(F.row_nnz)), 1)
    if k == A.K:
        return F
    import dataclasses as _dc

    return _dc.replace(F, data=F.data[:k], cols=F.cols[:k])
