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

def _expand_candidates(A: EllMatrix, B: EllMatrix, with_vals: bool = True):
    """Expand phase of SpGEMM: per A slot (a_ik at col k) gather B's row k,
    yielding (Kb*Ka, n) candidate columns (sentinel = invalid) and products."""
    Ka, n = A.data.shape
    Kb = B.data.shape[0]
    sent = jnp.int32(B.n_cols_pad)
    bcols = jnp.take(B.cols, A.cols, axis=1)  # (Kb, Ka, n)
    bnnz = jnp.take(B.row_nnz, A.cols, axis=0)  # (Ka, n)
    kb = jax.lax.broadcasted_iota(jnp.int32, (Kb, Ka, n), 0)
    valid = A.slot_mask()[None, :, :] & (kb < bnnz[None, :, :])
    cols = jnp.where(valid, bcols, sent).reshape(Kb * Ka, n)
    if not with_vals:
        return cols, None, sent
    bvals = jnp.take(B.data, A.cols, axis=1)
    vals = jnp.where(valid, A.data[None, :, :] * bvals, 0).reshape(Kb * Ka, n)
    return cols, vals, sent


def _min_extract_merge(cols, vals, sent, k_out):
    """Merge duplicate columns by repeated min-extraction (no global sort).

    Each round r: every output row takes its smallest remaining candidate
    column, sums all candidates carrying it into output slot r, and retires
    them.  k_out rounds of O(W*n) VPU work inside one fori_loop — the HLO is
    a dozen ops, so XLA compile time is near-constant in W and k_out (the
    sort-based merge this replaces cost ~6-30 s per compile on the remote
    TPU compiler; setup-path latency, VERDICT r2 missing #1).  Output rows
    come out column-sorted with duplicates exactly summed.

    Returns (out_cols, out_vals, row_nnz, leftover) where ``leftover`` is
    the number of distinct columns that did NOT fit in k_out (0 = exact).
    """
    W, n = cols.shape

    def body(r, carry):
        cols, oc, ov, nnz = carry
        minc = jnp.min(cols, axis=0)  # (n,)
        eq = cols == minc[None, :]
        s = jnp.sum(jnp.where(eq, vals, 0), axis=0)
        real = minc < sent
        ov = ov.at[r].set(jnp.where(real, s, 0))
        oc = oc.at[r].set(jnp.where(real, minc, 0))
        nnz = nnz + real.astype(jnp.int32)
        cols = jnp.where(eq, sent, cols)
        return cols, oc, ov, nnz

    # initial carries derive their sharding/varying type from the inputs so
    # the loop is legal inside shard_map with check_vma on (fresh zeros are
    # replication-typed and the loop body makes them varying)
    zc = cols.ravel()[0] * 0
    zv = vals.ravel()[0] * 0
    oc = jnp.zeros((k_out, n), cols.dtype) + zc
    ov = jnp.zeros((k_out, n), vals.dtype) + zv
    nnz = jnp.zeros(n, jnp.int32) + zc
    cols, oc, ov, nnz = jax.lax.fori_loop(0, k_out, body, (cols, oc, ov, nnz))
    # distinct columns still unretired (k_out was too small)
    def lbody(c):
        cols, k = c
        minc = jnp.min(cols, axis=0)
        return jnp.where(cols == minc[None, :], sent, cols), k + 1

    leftover_cols, leftover = jax.lax.while_loop(
        lambda c: jnp.any(c[0] < sent) & (c[1] < W), lbody,
        (cols, zc))
    return oc, ov, nnz, leftover


# HBM fence for the expand phase: the (Kb*Ka, n) candidate arrays are the
# peak allocation of setup (VERDICT r4: 56x56x650k fp32 = 7.6 GiB blew the
# 16 GiB chip on the 128^3 algebraic row).  Above this element count the
# expand+merge runs row-chunked under lax.map: one compiled body, bounded
# live set (~4 buffers of W*chunk elements), identical results.
_EXPAND_ELEM_BUDGET = 1 << 26  # 64M elems = 256 MiB per (W, chunk) fp32 buffer


def _row_chunk_plan(W: int, n: int):
    """(n_chunks, chunk) splitting the row axis so W*chunk stays under
    budget, or None when no chunking is needed.  chunk is lane-aligned."""
    if W * n <= _EXPAND_ELEM_BUDGET or n <= 128:
        return None
    n_chunks = -(-(W * n) // _EXPAND_ELEM_BUDGET)
    chunk = ((-(-n // n_chunks) + 127) // 128) * 128
    return -(-n // chunk), chunk


def _chunked_rows(A: EllMatrix, n_chunks: int, chunk: int):
    """Reshape A's per-row arrays to (n_chunks, ..., chunk), zero-padding the
    tail; padded rows have row_nnz=0 so they expand to pure sentinels."""
    npad = n_chunks * chunk
    pad = npad - A.n_rows_pad
    data = jnp.pad(A.data, ((0, 0), (0, pad)))
    cols = jnp.pad(A.cols, ((0, 0), (0, pad)))
    rnnz = jnp.pad(A.row_nnz, (0, pad))
    return {
        "data": data.reshape(A.K, n_chunks, chunk).transpose(1, 0, 2),
        "cols": cols.reshape(A.K, n_chunks, chunk).transpose(1, 0, 2),
        "row_nnz": rnnz.reshape(n_chunks, chunk),
    }


def _chunk_matrix(ch, B: EllMatrix, chunk: int) -> EllMatrix:
    return EllMatrix(data=ch["data"], cols=ch["cols"], row_nnz=ch["row_nnz"],
                     shape=(chunk, B.shape[1]), n_rows_pad=chunk,
                     n_cols_pad=B.n_cols_pad)


def _spgemm_core(A: EllMatrix, B: EllMatrix, k_out: int):
    """Traceable expand+merge with the HBM fence (shared by the jitted
    wrappers and the fused setup programs in setup/hierarchy.py)."""
    plan = _row_chunk_plan(A.K * B.K, A.n_rows_pad)
    if plan is None:
        cols, vals, sent = _expand_candidates(A, B)
        return _min_extract_merge(cols, vals, sent, k_out)
    n_chunks, chunk = plan

    def body(ch):
        cols, vals, sent = _expand_candidates(_chunk_matrix(ch, B, chunk), B)
        return _min_extract_merge(cols, vals, sent, k_out)

    oc, ov, nnz, lo = jax.lax.map(body, _chunked_rows(A, n_chunks, chunk))
    n = A.n_rows_pad
    out_cols = oc.transpose(1, 0, 2).reshape(k_out, n_chunks * chunk)[:, :n]
    out_vals = ov.transpose(1, 0, 2).reshape(k_out, n_chunks * chunk)[:, :n]
    return out_cols, out_vals, nnz.reshape(-1)[:n], jnp.max(lo)


@partial(jax.jit, static_argnames=("k_out",))
def _spgemm_fixed_full(A: EllMatrix, B: EllMatrix, k_out: int):
    out_cols, out_vals, row_nnz, leftover = _spgemm_core(A, B, k_out)
    out_cols = _fix_padding_cols(out_cols, row_nnz, B.n_cols_pad)
    C = EllMatrix(
        data=out_vals,
        cols=out_cols,
        row_nnz=row_nnz,
        shape=(A.shape[0], B.shape[1]),
        n_rows_pad=A.n_rows_pad,
        n_cols_pad=B.n_cols_pad,
    )
    return C, leftover


def spgemm_fixed(A: EllMatrix, B: EllMatrix, k_out: int) -> EllMatrix:
    """C = A @ B with static output width ``k_out`` (jit-traceable).

    Expand (gather B rows per A slot, the gather/segment-sum SpGEMM of
    BASELINE.json:5) then min-extract merge; rows with more than ``k_out``
    distinct columns silently truncate (use ``spgemm`` for exact width).
    """
    C, _ = _spgemm_fixed_full(A, B, k_out)
    return C


def _width_by_min_extract(cols, sent):
    """Max distinct non-sentinel columns over all rows of (W, n) ``cols``:
    retire the per-row min each round, count rounds until empty."""
    W = cols.shape[0]

    def body(c):
        cols, k = c
        minc = jnp.min(cols, axis=0)
        return jnp.where(cols == minc[None, :], sent, cols), k + 1

    _, k = jax.lax.while_loop(
        lambda c: jnp.any(c[0] < sent) & (c[1] < W), body,
        (cols, cols.ravel()[0] * 0))  # carry seed: inherit cols' vma type
    return k


def _spgemm_width_core(A: EllMatrix, B: EllMatrix) -> jax.Array:
    """Traceable max-distinct-columns of A @ B, with the same HBM fence as
    `_spgemm_core` (used directly inside the fused setup programs)."""
    plan = _row_chunk_plan(A.K * B.K, A.n_rows_pad)
    if plan is None:
        cols, _, sent = _expand_candidates(A, B, with_vals=False)
        return _width_by_min_extract(cols, sent)
    n_chunks, chunk = plan

    def body(ch):
        cols, _, sent = _expand_candidates(
            _chunk_matrix(ch, B, chunk), B, with_vals=False)
        return _width_by_min_extract(cols, sent)

    return jnp.max(jax.lax.map(body, _chunked_rows(A, n_chunks, chunk)))


@partial(jax.jit)
def _spgemm_width(A: EllMatrix, B: EllMatrix) -> jax.Array:
    """Max distinct columns of any row of A @ B (for the two-phase wrapper)."""
    return _spgemm_width_core(A, B)


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

    Round-based counting placement (no global sort — a 1M-element
    multi-operand ``lax.sort`` cost ~30 s per remote-TPU compile, VERDICT r2
    missing #1): each round, every output row (= A column) accepts its
    smallest-source-row pending entry via scatter-min, which is unique per
    column because a row's columns are distinct.  k_out rounds inside one
    fori_loop; output rows come out column-sorted, matching the sort-based
    semantics bit-for-bit.
    """
    K, n = A.data.shape
    m = A.n_cols_pad
    sent = jnp.int32(A.n_rows_pad)  # source rows are < n_rows_pad
    valid = A.slot_mask()
    src = A.row_index()  # (K, n): becomes the output column index
    tgt = jnp.where(valid, A.cols, m)  # scatter target; m = dropped
    tgt_c = jnp.minimum(tgt, m - 1)  # clamped gather index (masked below)

    def body(r, carry):
        active, out_data, out_cols = carry
        key = jnp.where(active, src, sent)
        minv = jnp.full(m, sent, jnp.int32).at[tgt].min(key, mode="drop")
        sel = active & (key == jnp.take(minv, tgt_c))
        vbuf = jnp.zeros(m, A.dtype).at[tgt].add(
            jnp.where(sel, A.data, 0), mode="drop")
        cbuf = jnp.zeros(m, jnp.int32).at[tgt].max(
            jnp.where(sel, src, 0), mode="drop")
        placed = minv < sent
        out_data = out_data.at[r].set(jnp.where(placed, vbuf, 0))
        out_cols = out_cols.at[r].set(jnp.where(placed, cbuf, 0))
        return active & ~sel, out_data, out_cols

    zv = A.data.ravel()[0] * 0  # vma-typed zeros (legal under shard_map)
    zc = A.cols.ravel()[0] * 0
    out_data = jnp.zeros((k_out, m), A.dtype) + zv
    out_cols = jnp.zeros((k_out, m), jnp.int32) + zc
    _, out_data, out_cols = jax.lax.fori_loop(
        0, k_out, body, (valid, out_data, out_cols))
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
    """Drop off-diagonal entries with |a_ij| < tol * sqrt(|a_ii a_jj|) and
    lump them into the diagonal (preserves row sums).  The SYMMETRIC
    criterion matters: a row-max test drops (i,j) but keeps (j,i) when the
    rows' scales differ, and the resulting nonsymmetric Galerkin coarse
    operator breaks PCG outright at depth (measured round 5: 128^3 ext+i
    with row-max filtering at 0.02 diverged, relres 1.5 after 200 iters;
    the sqrt(d_i d_j) test keeps every level symmetric and converges).
    Shrinks ELL width and, in the distributed setting, halo traffic."""
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    mag = jnp.where(off, jnp.abs(A.data), 0)
    dabs = jnp.abs(A.diagonal())
    scale = jnp.sqrt(dabs[None, :] * jnp.take(dabs, A.cols, mode="clip"))
    drop = off & (mag < tol * scale)
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
