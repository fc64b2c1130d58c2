"""Padded-ELL sparse matrix, the device-resident workhorse format.

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): the reference AMG stack's CSR/COO containers (RAPtor's
``CSRMatrix``/``COOMatrix``; see SURVEY.md §2b C2 and BASELINE.json:5 — "CSR/BSR
matrices become padded ELL/blocked-sparse layouts sized for the MXU").

Design notes (TPU-first, not a CSR translation):

* **Entry-major ("sliced") layout**: ``data``/``cols`` have shape ``(K, n_pad)``
  where ``K`` is the padded max-nnz-per-row and ``n_pad`` the padded row count.
  The TPU is a vector machine — every per-entry-slot operation (SpMV
  gather+FMA, strength tests, per-row reductions) is then a full-width vector
  op over the long ``n_pad`` axis (lane dimension), instead of reducing over a
  tiny trailing axis of width ~5-27.
* **Static shapes**: ``K`` and ``n_pad`` are Python ints, so every consumer is
  jit-traceable with no recompilation per call.  Row padding uses identity
  rows (diag=1, nnz=1) so padded systems stay SPD and solvers need no masks.
* **Padding convention**: within a row, the first ``row_nnz[i]`` slots are real
  entries sorted by column; the remaining slots have ``val=0`` and ``col`` set
  to the row's own index (a valid gather index, so SpMV needs no mask — the
  zero value annihilates the gathered entry).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EllMatrix", "ell_from_csr", "ell_to_csr", "pad_rows"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols", "row_nnz"],
    meta_fields=["shape", "n_rows_pad", "n_cols_pad"],
)
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Padded ELLPACK matrix in entry-major ``(K, n_pad)`` layout.

    Attributes:
      data:    (K, n_rows_pad) float values; slot k of row i is ``data[k, i]``.
      cols:    (K, n_rows_pad) int32 column indices into the padded column
               space ``[0, n_cols_pad)``; padding slots point at the row itself
               (clamped to n_cols_pad-1 for rectangular matrices) with value 0.
      row_nnz: (n_rows_pad,) int32 true entry count per row.
      shape:   static (n_rows, n_cols) — the *logical* (unpadded) shape.
      n_rows_pad / n_cols_pad: static padded extents.  Vectors that multiply
               this matrix have length n_cols_pad; products have n_rows_pad.
    """

    data: jax.Array
    cols: jax.Array
    row_nnz: jax.Array
    shape: Tuple[int, int]
    n_rows_pad: int
    n_cols_pad: int

    # -- static helpers -------------------------------------------------
    @property
    def K(self) -> int:
        return self.data.shape[0]

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> jax.Array:
        return jnp.sum(self.row_nnz)

    def slot_mask(self) -> jax.Array:
        """(K, n_pad) bool: True where a slot holds a real (non-padding) entry."""
        k = jax.lax.broadcasted_iota(jnp.int32, (self.K, self.n_rows_pad), 0)
        return k < self.row_nnz[None, :]

    def row_index(self) -> jax.Array:
        """(K, n_pad) int32: broadcasted row index of each slot."""
        return jax.lax.broadcasted_iota(jnp.int32, (self.K, self.n_rows_pad), 1)

    def diagonal(self) -> jax.Array:
        """(n_rows_pad,) diagonal entries (1.0 on identity padding rows)."""
        rows = self.row_index()
        hit = (self.cols == rows) & self.slot_mask()
        return jnp.sum(jnp.where(hit, self.data, 0), axis=0)

    def astype(self, dtype) -> "EllMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def scale_rows(self, s: jax.Array) -> "EllMatrix":
        """Left-multiply by diag(s); s has length n_rows_pad."""
        return dataclasses.replace(self, data=self.data * s[None, :])

    def __repr__(self):  # keep pytree-flattening cheap to debug
        return (
            f"EllMatrix(shape={self.shape}, K={self.K}, "
            f"pad=({self.n_rows_pad},{self.n_cols_pad}), dtype={self.dtype})"
        )


def pad_rows(n: int, multiple: int = 8) -> int:
    """Padded row count: TPU sublane-friendly multiple (8 for f32)."""
    return _round_up(max(n, 1), multiple)


def ell_from_csr(
    a,
    dtype=np.float32,
    row_pad_multiple: int = 8,
    n_cols_pad: int | None = None,
    identity_pad_rows: bool = True,
    device: bool = True,
) -> EllMatrix:
    """Host-side conversion scipy.sparse -> EllMatrix.

    Square inputs get identity padding rows (keeps padded systems SPD); set
    ``identity_pad_rows=False`` for rectangular operators (interpolation P),
    whose padding rows are all-zero.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    a.sort_indices()
    n, m = a.shape
    n_pad = pad_rows(n, row_pad_multiple)
    if n_cols_pad is None:
        n_cols_pad = pad_rows(m, row_pad_multiple) if n != m else n_pad
    row_nnz = np.diff(a.indptr).astype(np.int32)
    square = n == m
    K = int(row_nnz.max(initial=0))
    if identity_pad_rows and square:
        K = max(K, 1)
    K = max(K, 1)

    data = np.zeros((K, n_pad), dtype=dtype)
    # Padding gather target: column 0 (value 0 annihilates the gathered entry;
    # col 0 stays valid when n_cols_pad is re-tightened after setup).
    cols = np.zeros((K, n_pad), dtype=np.int32)
    nnz_pad = np.zeros(n_pad, dtype=np.int32)
    nnz_pad[:n] = row_nnz

    # Scatter CSR entries into slot-major layout.
    if a.nnz:
        r = np.repeat(np.arange(n), row_nnz)
        slot = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_nnz)
        data[slot, r] = a.data.astype(dtype)
        cols[slot, r] = a.indices.astype(np.int32)

    if identity_pad_rows and square and n_pad > n:
        data[0, n:] = 1.0
        cols[0, n:] = np.arange(n, n_pad)
        nnz_pad[n:] = 1

    conv = jnp.asarray if device else (lambda x: x)
    return EllMatrix(
        data=conv(data),
        cols=conv(cols),
        row_nnz=conv(nnz_pad),
        shape=(n, m),
        n_rows_pad=n_pad,
        n_cols_pad=int(n_cols_pad),
    )


def ell_to_csr(A: EllMatrix):
    """Host-side conversion back to scipy.sparse.csr_matrix (logical shape).
    Device arrays are fetched in ONE batched device_get (separate fetches
    cost a full round trip each on remote-tunnel backends)."""
    import scipy.sparse as sp

    if isinstance(A.data, np.ndarray):
        data, cols, nnz = A.data, np.asarray(A.cols), np.asarray(A.row_nnz)
    else:
        import jax

        data, cols, nnz = map(np.asarray, jax.device_get(
            (A.data, A.cols, A.row_nnz)))
    n, m = A.shape
    rows_l, vals_l, cols_l = [], [], []
    for k in range(A.K):
        real = (np.arange(A.n_rows_pad) < n) & (k < nnz)
        idx = np.nonzero(real)[0]
        rows_l.append(idx)
        vals_l.append(data[k, idx])
        cols_l.append(cols[k, idx])
    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0)
    colv = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    keep = colv < m  # identity padding rows only live in padded col space
    out = sp.coo_matrix((vals[keep], (rows[keep], colv[keep])), shape=(n, m))
    return out.tocsr()


def pad_vector(b: np.ndarray, n_pad: int, dtype=None) -> jax.Array:
    """Zero-pad a host vector to the padded length."""
    b = np.asarray(b)
    out = np.zeros(n_pad, dtype=dtype or b.dtype)
    out[: b.shape[0]] = b
    return jnp.asarray(out)
