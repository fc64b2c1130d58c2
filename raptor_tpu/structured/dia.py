"""DIA (offset-diagonal) matrices on structured grids — the TPU fast path.

Why this exists (measured on TPU v5e, see bench/notes in SURVEY.md §7 hard
parts): XLA's gather on TPU is element-serial (~9 ns/element — a 7-wide ELL
SpMV on 2M rows costs >100 ms), while shifted full-vector reads (jnp.roll)
run at HBM bandwidth.  A stencil-structured operator stored as diagonals
turns SpMV into ``sum_o data_o * roll(x, -o)`` — pure VPU work, zero
indirect addressing.  This is the TPU-native recast of BASELINE.json:5's
"padded ELL layouts sized for the MXU ... gather/segment_sum instead of
indirect CPU addressing": where the problem has grid structure (all five
acceptance configs do), indirection is eliminated entirely rather than
accelerated.

Offsets are kept as *vector* grid offsets (static metadata); linearized only
when rolling.  Products (DIA x DIA = Galerkin RAP pieces) add offset
vectors — exact, no wrap ambiguity — and boundary-truncated diagonals
guarantee wrap reads are annihilated by zero coefficients.

Everything here is jit-traceable with static shapes; the structured setup
(semicoarsening + operator-collapsed interpolation, see
raptor_tpu.structured.solver) runs end-to-end under jit with no
width-measurement host syncs at all.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiaMatrix", "dia_from_stencil", "dia_from_scipy", "dia_to_scipy",
           "dia_spmv", "dia_mult", "dia_transpose", "dia_add", "dia_rap"]

Vec = Tuple[int, ...]


def _strides(dims: Vec) -> Vec:
    # dims = (d0, d1, ..., dk) with the LAST dim fastest (C order)
    s = [1] * len(dims)
    for i in range(len(dims) - 2, -1, -1):
        s[i] = s[i + 1] * dims[i + 1]
    return tuple(s)


def _linear(off: Vec, dims: Vec) -> int:
    return int(np.dot(off, _strides(dims)))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "dims", "const_planes"],
)
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Square operator on a structured grid, stored by diagonals.

    data:    (n_off, n) values; ``data[k, i]`` multiplies ``x[i + lin(off_k)]``.
             Boundary-truncated: zero wherever ``i + off_k`` leaves the grid.
    offsets: static tuple of integer grid-offset vectors.
    dims:    static grid dims, last dim fastest.
    const_planes: optional static tuple; entry k a float when diagonal k is
             exactly ``scalar * boundary_mask`` (constant-coefficient
             stencils from the generators).  SpMV then synthesizes the plane
             from an iota mask instead of reading it — the fine-level
             operator costs no HBM traffic beyond x itself.
    """

    data: jax.Array
    offsets: Tuple[Vec, ...]
    dims: Vec
    const_planes: Tuple | None = None

    @property
    def n(self) -> int:
        return int(np.prod(self.dims))

    @property
    def n_off(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return self.data.dtype

    def linear_offsets(self) -> Tuple[int, ...]:
        return tuple(_linear(o, self.dims) for o in self.offsets)

    def diagonal(self) -> jax.Array:
        zero = tuple([0] * len(self.dims))
        k = self.offsets.index(zero)
        return self.data[k]

    def __repr__(self):
        return f"DiaMatrix(dims={self.dims}, n_off={self.n_off}, dtype={self.dtype})"


def boundary_mask(dims: Vec, off: Vec) -> np.ndarray:
    """(n,) bool: True where i + off stays on the grid (host, static)."""
    m = np.ones(dims, dtype=bool)
    for ax, d in enumerate(off):
        idx = np.arange(dims[ax])
        ok = (idx + d >= 0) & (idx + d < dims[ax])
        shape = [1] * len(dims)
        shape[ax] = dims[ax]
        m &= ok.reshape(shape)
    return m.ravel()


def boundary_mask_traced(dims: Vec, off: Vec) -> jax.Array:
    """Traced (iota-based) boundary mask: unlike the host version this does
    NOT bake an n-sized constant into the jitted program — essential for the
    one-jit setup at scale (a 256^3 build would otherwise embed gigabytes of
    mask constants and overflow the compiler)."""
    m = None
    for ax, d in enumerate(off):
        if d == 0:
            continue
        io = jax.lax.broadcasted_iota(jnp.int32, dims, ax)
        ok = (io + d >= 0) & (io + d < dims[ax])
        m = ok if m is None else m & ok
    if m is None:
        return jnp.ones(int(np.prod(dims)), bool)
    return m.reshape(-1)


def dia_from_stencil(stencil: np.ndarray, dims: Vec, dtype=jnp.float32) -> DiaMatrix:
    """Constant-stencil operator (matches gallery.stencil_grid truncation)."""
    stencil = np.asarray(stencil)
    nd = stencil.ndim
    dims = tuple(int(d) for d in dims)
    offs, planes = [], []
    centers = [s // 2 for s in stencil.shape]
    for idx in np.ndindex(*stencil.shape):
        v = stencil[idx]
        if v == 0.0:
            continue
        off = tuple(i - c for i, c in zip(idx, centers))
        offs.append(off)
        planes.append(np.where(boundary_mask(dims, off), v, 0.0))
    data = np.stack(planes).astype(np.dtype(dtype) if not isinstance(dtype, np.dtype) else dtype)
    # constant-coefficient by construction: record the scalars so SpMV can
    # synthesize the planes (dtype-rounded so both paths match bit-exactly)
    consts = tuple(float(np.asarray(stencil[idx], data.dtype))
                   for idx in np.ndindex(*stencil.shape) if stencil[idx] != 0.0)
    return DiaMatrix(data=jnp.asarray(data), offsets=tuple(offs), dims=dims,
                     const_planes=consts)


def dia_from_scipy(a, dims: Vec, dtype=jnp.float32, tol: float = 0.0) -> DiaMatrix:
    """General conversion: groups entries by vector grid offset (host)."""
    import scipy.sparse as sp

    a = sp.coo_matrix(a)
    dims = tuple(int(d) for d in dims)
    n = int(np.prod(dims))
    assert a.shape == (n, n)
    ri = np.stack(np.unravel_index(a.row, dims), 1)
    ci = np.stack(np.unravel_index(a.col, dims), 1)
    d = ci - ri
    keys = [tuple(int(v) for v in row) for row in d]
    uniq = sorted(set(keys))
    kmap = {k: i for i, k in enumerate(uniq)}
    data = np.zeros((len(uniq), n), dtype=np.dtype(dtype))
    for val, row, key in zip(a.data, a.row, keys):
        data[kmap[key], row] += val
    if tol > 0:
        keep = np.abs(data).max(axis=1) > tol
        data = data[keep]
        uniq = [o for o, k in zip(uniq, keep) if k]
    return DiaMatrix(data=jnp.asarray(data), offsets=tuple(uniq), dims=dims)


def dia_to_scipy(A: DiaMatrix):
    import scipy.sparse as sp

    n = A.n
    data = np.asarray(A.data)
    rows, cols, vals = [], [], []
    for k, off in enumerate(A.offsets):
        lin = _linear(off, A.dims)
        m = boundary_mask(A.dims, off)
        r = np.nonzero(m & (data[k] != 0))[0]
        rows.append(r)
        cols.append(r + lin)
        vals.append(data[k][r])
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()


# Route dia_spmv through the fused Pallas kernel (ops/pallas/dia_kernel v2:
# pipelined neighbor blocks, lane rolls).  Resolved at trace time.  Measured
# on TPU v5e (scripts/bench_spmv_variants.py): 1.4x over XLA rolls at 128^3
# 7-offset, 2.4x at 256^3 — XLA's per-roll materialization stops fusing at
# scale.  ``None`` = auto (on when the default backend is TPU); set True /
# False to force.  Levels below PALLAS_MIN_N fall back to rolls (tiny grids
# are latency-bound; also keeps non-tileable shapes on the safe path).
USE_PALLAS: bool | None = None
PALLAS_MIN_N: int = 32768
# run routed Pallas kernels in interpret mode (CPU-mesh tests exercise the
# real kernel paths inside shard_map this way; never set in production)
PALLAS_INTERPRET: bool = False
# constant-stencil levels below this ride XLA rolls with synthesized planes
# (fuses well at small sizes); above it the dedicated const-synthesis Pallas
# kernel (dia_spmv_pallas_const) wins — measured 3.7 ms (rolls) / 2.0 ms
# (bf16 streaming v2) / 1.0 ms (const kernel) per SpMV at 256^3, identical
# within noise at 128^3
PALLAS_CONST_MIN_N: int = 4 * 1024 * 1024


def _pallas_route() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dia_spmv(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x via shifted reads: y_i = sum_k data[k,i] * x[i + off_k].

    Wrap-around reads are annihilated by the boundary-zeroed diagonals.
    Constant diagonals (const_planes) are synthesized from iota masks —
    compute instead of HBM traffic.
    """
    lins = A.linear_offsets()
    if (_pallas_route() and A.n >= PALLAS_MIN_N and A.n % 128 == 0
            and x.dtype == jnp.float32):
        if (A.const_planes is not None
                and all(c is not None for c in A.const_planes)):
            if A.n >= PALLAS_CONST_MIN_N:
                # constant-coefficient stencil: the kernel synthesizes plane
                # values from iota boundary masks — reads ONLY x, no
                # operator data at all
                try:
                    from raptor_tpu.ops.pallas.dia_kernel import (
                        dia_spmv_pallas_const)

                    return dia_spmv_pallas_const(A.const_planes, A.offsets,
                                                 A.dims, x,
                                                 interpret=PALLAS_INTERPRET)
                except ValueError:
                    pass
            # small const levels: XLA rolls with synthesized planes below
        elif A.data.dtype in (jnp.float32, jnp.bfloat16):
            try:
                from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas_v2

                return dia_spmv_pallas_v2(A.data, lins, x,
                                          interpret=PALLAS_INTERPRET)
            except ValueError:
                pass  # no viable tile for this shape: XLA roll path below
    y = None
    cp = A.const_planes
    for k, o in enumerate(lins):
        shifted = x if o == 0 else jnp.roll(x, -o)
        if cp is not None and cp[k] is not None:
            c = jnp.asarray(cp[k], x.dtype)
            plane = jnp.where(boundary_mask_traced(A.dims, A.offsets[k]),
                              c, jnp.asarray(0, x.dtype))
        else:
            plane = A.data[k]
        term = plane * shifted
        y = term if y is None else y + term
    return y


def dia_tri_spmv(A: DiaMatrix, x: jax.Array, upper: bool) -> jax.Array:
    """Strict-triangular product L @ x (lower) or U @ x (upper): the rolled
    read pattern of ``dia_spmv`` restricted to diagonals on one side of the
    main one (linear offset < 0 is exactly the strict lower triangle).  Used
    by the two-stage Gauss-Seidel inner Jacobi series (solve/smoothers.py,
    PAPERS.md:9); the handful of one-sided rolls fuses under XLA, so no
    dedicated kernel is needed.
    """
    lins = A.linear_offsets()
    cp = A.const_planes
    y = jnp.zeros_like(x)
    for k, o in enumerate(lins):
        if o == 0 or (o > 0) != upper:
            continue
        shifted = jnp.roll(x, -o)
        if cp is not None and cp[k] is not None:
            c = jnp.asarray(cp[k], x.dtype)
            plane = jnp.where(boundary_mask_traced(A.dims, A.offsets[k]),
                              c, jnp.asarray(0, x.dtype))
        else:
            plane = A.data[k]
        y = y + plane * shifted
    return y


def dia_transpose(A: DiaMatrix) -> DiaMatrix:
    """A.T: diagonal at -o holds roll(data_o, lin(o)).  Offsets re-sorted so
    structurally-equal operators have identical (static) metadata."""
    items = []
    for k, off in enumerate(A.offsets):
        lin = _linear(off, A.dims)
        items.append((tuple(-d for d in off), jnp.roll(A.data[k], lin)))
    items.sort(key=lambda t: t[0])
    return DiaMatrix(data=jnp.stack([p for _, p in items]),
                     offsets=tuple(o for o, _ in items), dims=A.dims)


def dia_mult(A: DiaMatrix, B: DiaMatrix, keep=None) -> DiaMatrix:
    """C = A @ B: C_{o1+o2} += A_{o1} * roll(B_{o2}, -lin(o1)).

    Offset arithmetic is on vector offsets (exact); the host computes the
    static union of offset sums, the device does n_offA*n_offB fused
    multiply-roll-adds.  This is the structured Galerkin SpGEMM
    (BASELINE.json:5) — zero gathers.

    ``keep``: optional static predicate offset->bool; output keys failing it
    are skipped entirely.  Callers use it when an offset class is provably
    zero (e.g. odd offsets between all-even C points in full coarsening) to
    avoid materializing structurally-dead planes.
    """
    assert A.dims == B.dims
    out: dict[Vec, list] = {}
    for i, o1 in enumerate(A.offsets):
        lin1 = _linear(o1, A.dims)
        a = A.data[i]
        for j, o2 in enumerate(B.offsets):
            key = tuple(x + y for x, y in zip(o1, o2))
            if keep is not None and not keep(key):
                continue
            term = a * (B.data[j] if lin1 == 0 else jnp.roll(B.data[j], -lin1))
            out.setdefault(key, []).append(term)
    offs = sorted(out.keys())
    planes = []
    for o in offs:
        acc = out[o][0]
        for t in out[o][1:]:
            acc = acc + t
        # re-truncate: products can only produce valid paths, but the summed
        # offset may leave the grid even when each hop is valid is impossible
        # on a convex grid box, so no masking is needed; keep data as-is.
        planes.append(acc)
    return DiaMatrix(data=jnp.stack(planes), offsets=tuple(offs), dims=A.dims)


def dia_add(A: DiaMatrix, B: DiaMatrix, alpha=1.0, beta=1.0) -> DiaMatrix:
    assert A.dims == B.dims
    out: dict[Vec, jax.Array] = {}
    for k, o in enumerate(A.offsets):
        out[o] = alpha * A.data[k]
    for k, o in enumerate(B.offsets):
        t = beta * B.data[k]
        out[o] = out[o] + t if o in out else t
    offs = sorted(out.keys())
    return DiaMatrix(
        data=jnp.stack([out[o] for o in offs]), offsets=tuple(offs), dims=A.dims
    )


def dia_filter_offsets(A: DiaMatrix, pred) -> DiaMatrix:
    """Drop planes whose offset fails a static predicate (used to remove
    provably-zero offset classes after compositions)."""
    idx = [k for k, o in enumerate(A.offsets) if pred(o)]
    return DiaMatrix(
        data=jnp.stack([A.data[k] for k in idx]),
        offsets=tuple(A.offsets[k] for k in idx),
        dims=A.dims,
    )


def dia_prune(A: DiaMatrix, tol: float = 0.0) -> DiaMatrix:
    """Drop identically-(near-)zero diagonals (host sync; setup-time only)."""
    mx = np.asarray(jnp.max(jnp.abs(A.data), axis=1))
    scale = mx.max() if mx.size else 1.0
    keep = mx > tol * scale if tol > 0 else mx > 0
    if keep.all():
        return A
    idx = np.nonzero(keep)[0]
    return DiaMatrix(
        data=A.data[jnp.asarray(idx)],
        offsets=tuple(A.offsets[i] for i in idx),
        dims=A.dims,
    )


def dia_rap(R: DiaMatrix, A: DiaMatrix, P: DiaMatrix) -> DiaMatrix:
    return dia_mult(R, dia_mult(A, P))
