"""Blocked-ELL sparse matrix: dense b x b blocks (SURVEY.md §2b C3).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``BSRMatrix/BCOOMatrix`` — BASELINE.json:5
"CSR/BSR matrices become padded ELL/blocked-sparse layouts sized for the
MXU", BASELINE.json:10 (3x3 blocks for elasticity).

Layout: block-entry-major ``data (K, nb_pad, b, b)`` / ``cols (K, nb_pad)``
— the block-row axis is the long vector axis, blocks are trailing so block
products batch as (nb_pad, b, b) x (nb_pad, b) contractions.  Block-level
indirection also divides gather traffic by b vs. the scalar ELL.

Includes the block-Jacobi smoother data (batched 3x3 inverses at setup),
the natural smoother upgrade for elasticity."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.ell import pad_rows

__all__ = ["BlockEllMatrix", "bell_from_bsr", "bell_to_bsr", "bell_spmv",
           "block_diag_inv", "block_jacobi", "ell_to_bell",
           "block_chebyshev4", "estimate_lmax_bell"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols", "row_nnz"],
    meta_fields=["shape", "bs", "nb_pad"],
)
@dataclasses.dataclass(frozen=True)
class BlockEllMatrix:
    data: jax.Array  # (K, nb_pad, b, b)
    cols: jax.Array  # (K, nb_pad) int32 block-column indices
    row_nnz: jax.Array  # (nb_pad,) int32
    shape: Tuple[int, int]  # logical scalar shape
    bs: int
    nb_pad: int

    @property
    def K(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    def slot_mask(self) -> jax.Array:
        k = jax.lax.broadcasted_iota(jnp.int32, (self.K, self.nb_pad), 0)
        return k < self.row_nnz[None, :]


def bell_from_bsr(a, bs: int = 3, dtype=np.float32,
                  row_pad_multiple: int = 8) -> BlockEllMatrix:
    """scipy sparse (any format) -> BlockEllMatrix with b x b blocks.
    Identity blocks pad both the block rows beyond the logical size."""
    import scipy.sparse as sp

    a = sp.bsr_matrix(a, blocksize=(bs, bs))
    nb = a.shape[0] // bs
    nb_pad = pad_rows(nb, row_pad_multiple)
    nnz = np.diff(a.indptr).astype(np.int32)
    K = max(int(nnz.max(initial=0)), 1)

    data = np.zeros((K, nb_pad, bs, bs), dtype=dtype)
    cols = np.zeros((K, nb_pad), dtype=np.int32)
    nnz_pad = np.zeros(nb_pad, dtype=np.int32)
    nnz_pad[:nb] = nnz
    if a.nnz:
        r = np.repeat(np.arange(nb), nnz)
        slot = np.arange(len(a.indices)) - np.repeat(a.indptr[:-1], nnz)
        data[slot, r] = a.data.astype(dtype)
        cols[slot, r] = a.indices.astype(np.int32)
    # identity padding block-rows
    if nb_pad > nb:
        data[0, nb:] = np.eye(bs, dtype=dtype)
        cols[0, nb:] = np.arange(nb, nb_pad)
        nnz_pad[nb:] = 1
    return BlockEllMatrix(
        data=jnp.asarray(data), cols=jnp.asarray(cols),
        row_nnz=jnp.asarray(nnz_pad), shape=a.shape, bs=bs, nb_pad=nb_pad,
    )


def bell_to_bsr(A: BlockEllMatrix):
    import scipy.sparse as sp

    nb = A.shape[0] // A.bs
    data = np.asarray(A.data)
    cols = np.asarray(A.cols)
    nnz = np.asarray(A.row_nnz)
    blocks, rows_l, cols_l = [], [], []
    for k in range(A.K):
        sel = (np.arange(A.nb_pad) < nb) & (k < nnz)
        idx = np.nonzero(sel)[0]
        keep = cols[k, idx] < nb
        blocks.append(data[k, idx[keep]])
        rows_l.append(idx[keep])
        cols_l.append(cols[k, idx[keep]])
    rows = np.concatenate(rows_l)
    colv = np.concatenate(cols_l)
    blks = np.concatenate(blocks)
    order = np.lexsort((colv, rows))
    indptr = np.searchsorted(rows[order], np.arange(nb + 1))
    return sp.bsr_matrix(
        (blks[order], colv[order], indptr), shape=A.shape
    )


def bell_spmv(A: BlockEllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x with x of length nb_pad*bs (padded block vector)."""
    xb = x.reshape(A.nb_pad, A.bs)
    xg = jnp.take(xb, A.cols, axis=0)  # (K, nb_pad, b)
    y = jnp.einsum("knij,knj->ni", A.data, xg)
    return y.reshape(-1)


def block_diag_inv(A: BlockEllMatrix) -> jax.Array:
    """(nb_pad, b, b) inverses of the diagonal blocks (setup-time)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (A.K, A.nb_pad), 1)
    hit = (A.cols == rows) & A.slot_mask()
    diag = jnp.einsum("kn,knij->nij", hit.astype(A.dtype), A.data)
    return jnp.linalg.inv(diag)


def block_jacobi(A: BlockEllMatrix, dinv_blocks, b, x,
                 omega: float = 2.0 / 3.0, sweeps: int = 1,
                 x0_zero: bool = False):
    """Block-Jacobi: x += omega * Dblk^{-1} (b - Ax) — the natural smoother
    for elasticity systems (couples the 3 dofs of a node exactly).
    ``x0_zero`` (trace-time) elides the first SpMV when x == 0 on entry
    (XLA does not fold A@0; see solve/smoothers.jacobi)."""
    def body(_, x):
        r = (b - bell_spmv(A, x)).reshape(A.nb_pad, A.bs)
        upd = jnp.einsum("nij,nj->ni", dinv_blocks, r).reshape(-1)
        return x + omega * upd

    if x0_zero and sweeps:
        rb = b.reshape(A.nb_pad, A.bs)
        x = omega * jnp.einsum("nij,nj->ni", dinv_blocks, rb).reshape(-1)
        return jax.lax.fori_loop(0, sweeps - 1, body, x)
    return jax.lax.fori_loop(0, sweeps, body, x)


def ell_to_bell(E, bs: int, row_pad_multiple: int = 8) -> BlockEllMatrix:
    """Scalar EllMatrix -> BlockEllMatrix with ``bs x bs`` blocks (host-side
    structure pass, setup-time only).

    Capability reproduced (spec = BASELINE.json:5,10): the block layout the
    solve path runs on — "CSR/BSR ... become padded ELL/blocked-sparse
    layouts sized for the MXU".  Used by build_sa_hierarchy to re-lay the
    Galerkin operators as block matrices so elasticity smoothing and SpMV
    batch as (nb, b, b) x (nb, b) contractions on the MXU.
    """
    from raptor_tpu.core.ell import ell_to_csr

    a = ell_to_csr(E)  # logical shape; identity pad rows re-added below
    assert a.shape[0] % bs == 0, (a.shape, bs)
    assert E.n_rows_pad % bs == 0, (E.n_rows_pad, bs)
    # pad the block-row count to exactly n_rows_pad/bs so block vectors are
    # the same padded vectors the scalar path uses (reshape-compatible)
    return bell_from_bsr(a, bs=bs, dtype=np.dtype(E.dtype),
                         row_pad_multiple=E.n_rows_pad // bs)


def block_chebyshev4(A: BlockEllMatrix, binv, b, x, lmax, degree: int = 3,
                     x0_zero: bool = False):
    """Fourth-kind Chebyshev smoothing preconditioned by the block diagonal
    (the elasticity upgrade of solve/smoothers.chebyshev4: Dblk^{-1} couples
    each node's ``bs`` dofs exactly, so the polynomial acts on the
    block-normalized spectrum)."""
    def prec(r):
        rb = r.reshape(A.nb_pad, A.bs)
        return jnp.einsum("nij,nj->ni", binv, rb).reshape(-1)

    r = b if x0_zero else b - bell_spmv(A, x)
    d = (4.0 / 3.0) / lmax * prec(r)
    x = x + d
    for k in range(2, degree + 1):
        r = r - bell_spmv(A, d)
        d = ((2 * k - 3) / (2 * k + 1)) * d + (
            (8 * k - 4) / (2 * k + 1) / lmax
        ) * prec(r)
        x = x + d
    return x


@partial(jax.jit, static_argnames=("iters",))
def estimate_lmax_bell(A: BlockEllMatrix, binv, iters: int = 40,
                       safety: float = 1.1):
    """lambda_max(Dblk^{-1} A) by power iteration (setup-time)."""
    n = A.nb_pad * A.bs
    i = jnp.arange(n, dtype=A.dtype)
    v = jnp.sin(i * 0.7511) + 0.01
    v = v / jnp.linalg.norm(v)

    def app(v):
        w = bell_spmv(A, v).reshape(A.nb_pad, A.bs)
        return jnp.einsum("nij,nj->ni", binv, w).reshape(-1)

    def body(_, v):
        w = app(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = app(v)
    return safety * jnp.vdot(v, w) / jnp.vdot(v, v)
