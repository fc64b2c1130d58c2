"""Hybrid DIA+ELL layout for general (unstructured) matrices.

Capability target (SURVEY.md §0 — the public RAPtor AMG library named by
BASELINE.json:5; convergence spec = tests/oracle/amg_oracle.py): a
competitive TPU SpMV for general CSR matrices — BASELINE.json:5 "CSR/BSR
matrices become padded ELL/blocked-sparse layouts sized for the MXU".

Why: the pure gather ELL SpMV (``ops.sparse_ops.spmv``) runs at
~0.01 GDOF/s on TPU for non-grid matrices (docs/DESIGN.md §1) — TPU gathers
from HBM are element-at-a-time.  The structured engine avoids gathers
entirely (DIA planes, x read once), but needs a grid.  This module makes
that trick general:

1. **RCM bandwidth reduction** (host, setup-time): reorder rows/columns
   with reverse Cuthill-McKee so the sparsity collapses into a band.  For
   a shuffled Poisson matrix this recovers bandwidth O(n^(2/3)) from O(n).
2. **Offset bucketing**: in the reordered matrix, bucket entries by their
   diagonal offset ``col - row``.  Frequent offsets (>= ``min_fill`` of
   rows) become dense DIA planes; the long tail spills into a narrow
   gather ELL.  For banded matrices nearly every entry lands in a plane.
3. **SpMV = DIA planes + spill**: the plane part is the structured
   engine's kernel — ``jnp.roll`` per offset (XLA fuses the rolls into one
   bandwidth-bound pass) or the fused Pallas kernel
   (ops/pallas/dia_kernel.dia_spmv_pallas_v2, x read once per tile into
   VMEM) on TPU; the spill is the ordinary gather ELL on a few slots.

The permutation stays inside the container: ``hybrid_spmv`` takes and
returns vectors in the ORIGINAL ordering, so the hybrid operator is a
drop-in replacement for ``spmv(E, .)``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.ell import EllMatrix, pad_rows

__all__ = ["HybridMatrix", "hybrid_from_ell", "hybrid_spmv",
           "BandedMatrix", "banded_from_csr", "banded_spmv",
           "banded_spmv_ro"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes", "spill", "perm", "iperm"],
    meta_fields=["offsets", "shape", "n_pad"],
)
@dataclasses.dataclass(frozen=True)
class HybridMatrix:
    planes: jax.Array  # (n_off, n_pad) diagonal planes in RCM ordering
    spill: Optional[EllMatrix]  # remainder entries (RCM ordering), or None
    perm: jax.Array  # (n_pad,) original index of RCM slot i
    iperm: jax.Array  # (n_pad,) RCM slot of original index i
    offsets: Tuple[int, ...]  # static linear offsets of the planes
    shape: Tuple[int, int]
    n_pad: int

    @property
    def dtype(self):
        return self.planes.dtype

    @property
    def n_off(self) -> int:
        return len(self.offsets)


def hybrid_from_ell(
    E: EllMatrix,
    min_fill: float = 0.02,
    max_offsets: int = 512,
    reorder: bool = True,
    pad_multiple: int = 128,
    device: bool = True,
) -> HybridMatrix:
    """Host structure pass: RCM reorder + offset bucketing (see module doc).

    ``min_fill``: an offset gets a dense plane when at least this fraction
    of rows has an entry there (a plane costs n_pad values regardless of
    fill; spill slots cost a gather each).  ``max_offsets`` caps plane
    count (VMEM tiling in the Pallas route).
    """
    import scipy.sparse as sp

    from raptor_tpu.core.ell import ell_to_csr

    if not reorder:
        # direct ELL -> planes (no csr round trip, no python-dict offset
        # map): the identity-ordered attach is the hot path — one vectorized
        # unique over int32 deltas + one scatter fills every plane
        # (round-5 profile: the csr path + np.vectorize cost 21.9 s of the
        # 86 s all-host 128^3 setup; this is ~3 s)
        n = E.shape[0]
        n_pad2 = pad_rows(max(n, 1), pad_multiple)
        data = np.asarray(E.data)
        cols = np.asarray(E.cols)
        nnz = np.asarray(E.row_nnz)
        K = E.K
        rows_b = np.broadcast_to(
            np.arange(E.n_rows_pad, dtype=np.int64)[None, :], cols.shape)
        m = (np.arange(K, dtype=np.int32)[:, None] < nnz[None, :]) \
            & (rows_b < n) & (cols < n)
        deltas = (cols - rows_b)[m].astype(np.int64)
        vals_m = data[m]
        rows_m = rows_b[m]
        uniq, counts = np.unique(deltas, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        keep = np.sort(np.asarray(
            [uniq[i] for i in order[:max_offsets]
             if counts[i] >= max(1, min_fill * n)], dtype=np.int64))
        planes = np.zeros((max(len(keep), 1), n_pad2), data.dtype)
        spill = None
        if len(keep):
            kidx = np.searchsorted(keep, deltas)
            kidx_c = np.minimum(kidx, len(keep) - 1)
            hit = keep[kidx_c] == deltas
            planes[kidx_c[hit], rows_m[hit]] = vals_m[hit]
            rem = ~hit
        else:
            rem = np.ones(deltas.shape[0], bool)
        if rem.any():
            from raptor_tpu.core.ell import ell_from_csr

            s = sp.coo_matrix(
                (vals_m[rem], (rows_m[rem], (rows_m + deltas)[rem])),
                shape=(n, n)).tocsr()
            spill = ell_from_csr(s, dtype=data.dtype, row_pad_multiple=n_pad2,
                                 identity_pad_rows=False, device=device)
            if spill.n_cols_pad < n_pad2:
                spill = dataclasses.replace(spill, n_cols_pad=n_pad2)
        eye = np.arange(n_pad2, dtype=np.int32)
        put = jnp.asarray if device else np.asarray
        return HybridMatrix(
            planes=put(planes), spill=spill, perm=put(eye), iperm=put(eye),
            offsets=tuple(int(d) for d in keep) if len(keep) else (0,),
            shape=E.shape, n_pad=n_pad2,
        )

    a = ell_to_csr(E).tocsr()
    n = a.shape[0]
    n_pad = pad_rows(max(n, 1), pad_multiple)

    if reorder:
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        p = np.asarray(
            reverse_cuthill_mckee(a + a.T, symmetric_mode=True)
        ).astype(np.int64)
    else:
        p = np.arange(n, dtype=np.int64)
    ip = np.empty(n, dtype=np.int64)
    ip[p] = np.arange(n)
    ar = a[p][:, p].tocoo()

    rows = ar.row.astype(np.int64)
    cols = ar.col.astype(np.int64)
    vals = ar.data
    deltas = cols - rows

    uniq, counts = np.unique(deltas, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    keep = [int(uniq[i]) for i in order[:max_offsets]
            if counts[i] >= max(1, min_fill * n)]
    keep.sort()
    off_index = {d: k for k, d in enumerate(keep)}

    planes = np.zeros((max(len(keep), 1), n_pad), dtype=np.asarray(E.data).dtype)
    in_plane = np.isin(deltas, keep)
    if len(keep):
        k_idx = np.vectorize(off_index.__getitem__, otypes=[np.int64])(
            deltas[in_plane]) if in_plane.any() else np.zeros(0, np.int64)
        planes[k_idx, rows[in_plane]] = vals[in_plane]

    spill = None
    rem = ~in_plane
    if rem.any():
        s = sp.coo_matrix(
            (vals[rem], (rows[rem], cols[rem])), shape=(n, n)
        ).tocsr()
        from raptor_tpu.core.ell import ell_from_csr

        spill = ell_from_csr(s, dtype=np.asarray(E.data).dtype,
                             row_pad_multiple=n_pad,
                             identity_pad_rows=False, device=device)
        if spill.n_cols_pad < n_pad:
            spill = dataclasses.replace(spill, n_cols_pad=n_pad)

    perm_pad = np.arange(n_pad, dtype=np.int32)
    perm_pad[:n] = p
    iperm_pad = np.arange(n_pad, dtype=np.int32)
    iperm_pad[:n] = ip
    # device=False: keep numpy leaves — the banded/hybrid setup path builds
    # whole hierarchies on host and uploads once (stage_hierarchy); a
    # device push per level costs a tunnel round trip each
    put = jnp.asarray if device else np.asarray
    return HybridMatrix(
        planes=put(planes),
        spill=spill,
        perm=put(perm_pad),
        iperm=put(iperm_pad),
        offsets=tuple(keep) if keep else (0,),
        shape=a.shape,
        n_pad=n_pad,
    )


def _planes_spmv(planes, offsets: Tuple[int, ...], x: jax.Array) -> jax.Array:
    """sum_k planes[k] * shift(x, offsets[k]) — Pallas fused kernel on TPU
    (x read once per tile), XLA-fused rolls elsewhere."""
    n = x.shape[0]
    if (jax.default_backend() == "tpu" and n % 128 == 0 and n >= 32768
            and x.dtype == jnp.float32):
        try:
            from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas_v2

            return dia_spmv_pallas_v2(planes, offsets, x)
        except Exception:
            pass
    y = None
    for k, d in enumerate(offsets):
        # wraparound values are annihilated by the zero plane entries at the
        # truncated boundary rows, so plain rolls suffice
        xs = x if d == 0 else jnp.roll(x, -d)
        t = planes[k] * xs
        y = t if y is None else y + t
    return y


def hybrid_spmv_ro(H: HybridMatrix, xr: jax.Array) -> jax.Array:
    """y = A_rcm @ x in the REORDERED space (the solve-loop form: the solver
    permutes b once on entry and x once on exit, so per-iteration applies
    pay zero gathers on the plane part)."""
    from raptor_tpu.ops.sparse_ops import spmv

    yr = _planes_spmv(H.planes, H.offsets, xr)
    if H.spill is not None:
        yr = yr + spmv(H.spill, xr)
    return yr


def hybrid_spmv(H: HybridMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x in the ORIGINAL ordering (permutation applied inside)."""
    return jnp.take(hybrid_spmv_ro(H, jnp.take(x, H.perm, axis=0)),
                    H.iperm, axis=0)


# ---------------------------------------------------------------------------
# Banded dynamic-gather layout (ops/pallas/banded_kernel): the general-CSR
# fast path.  RCM + paged vreg gathers; see the kernel module docstring.
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class FarBlock:
    """Compacted row-subset remainder of a near/far-split banded layout
    (ops/pallas/banded_kernel._compact_far): the ~1-5% of entries outside
    the kernel's window cap, stored only for the rows that have them.
    Apply: y.at[rows].add(sum_k vals[k] * x[cols[k]]) — K_far * m gathers
    plus an m-row scatter-add, vs the full K * n_pad gather-ELL fallback
    it replaces (measured 143 ms for the 128^3 L0 restrict, round 4)."""

    rows: jax.Array  # (m_pad,) int32 target rows; padding -> pad_row, 0 vals
    cols: jax.Array  # (K_far, m_pad) int32 into the x space
    vals: jax.Array  # (K_far, m_pad)
    meta: Tuple[int, ...]  # (K_far, m) — static


def far_spmv_add(y: jax.Array, far: Optional[FarBlock],
                 x: jax.Array) -> jax.Array:
    """y += far @ x (no-op when far is None)."""
    if far is None:
        return y
    part = jnp.sum(far.vals.astype(y.dtype) * x[far.cols].astype(y.dtype),
                   axis=0)
    return y.at[far.rows].add(part)


def _far_from_dict(d) -> Optional[FarBlock]:
    if d is None:
        return None
    return FarBlock(rows=jnp.asarray(d["rows"]), cols=jnp.asarray(d["cols"]),
                    vals=jnp.asarray(d["vals"]),
                    meta=(int(d["cols"].shape[0]), int(d["m"])))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "pidx", "perm", "iperm", "far"],
    meta_fields=["meta", "shape", "reordered", "slot_ranges"],
)
@dataclasses.dataclass(frozen=True)
class BandedMatrix:
    """General matrix in the RCM-banded paged-gather layout."""

    vals: jax.Array  # (T, K, R_rows, 128)
    pidx: jax.Array  # (T, K, R_rows, 128) int32 packed page*1024 + idx
    perm: jax.Array  # (n_pad,) original index of RCM slot
    iperm: jax.Array  # (n_pad,) RCM slot of original index
    meta: Tuple[int, ...]  # (K, n, tile, kh, npage, Wp) — static
    shape: Tuple[int, int]
    # True when the layout's internal ordering differs from the caller's
    # vector ordering (a coarse hierarchy level re-banded by RCM,
    # ``banded_from_ell(reorder=True)``): apply through ``banded_spmv``
    # (gather in / scatter out), not ``banded_spmv_ro``
    reordered: bool = False
    # near/far split (banded_plan_split): out-of-window remainder, in the
    # SAME ordering as vals/pidx
    far: Optional[FarBlock] = None
    # static per-slot page ranges (banded_plan `ranges`): shrink the
    # kernel's page-select chain where slots are page-coherent
    slot_ranges: Optional[Tuple] = None

    @property
    def n_pad(self) -> int:
        return self.meta[1]

    def plan(self) -> dict:
        K, n, tile, kh, npage, Wp = self.meta
        return dict(vals=self.vals, pidx=self.pidx, K=K, n=n,
                    tile=tile, kh=kh, npage=npage, Wp=Wp,
                    ranges=self.slot_ranges)


def banded_from_csr(a, dtype=np.float32, tile: int = 1024,
                    reorder: bool = True) -> Optional[BandedMatrix]:
    """scipy.sparse -> BandedMatrix (host structure pass: RCM + plan).

    The whole pass stays on host numpy — no device round-trips (downloading
    structure through the device tunnel is orders of magnitude slower than
    building it host-side).  Returns None when the RCM bandwidth exceeds the
    kernel's plan bounds (ADVICE r2: non-banded sparsity must stay on the
    gather-ELL path instead of producing a pathological Pallas program).
    """
    import scipy.sparse as sp

    from raptor_tpu.ops.pallas.banded_kernel import banded_plan

    a = sp.csr_matrix(a)
    n = a.shape[0]
    if reorder:
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        p = np.asarray(
            reverse_cuthill_mckee(a + a.T, symmetric_mode=True)
        ).astype(np.int64)
    else:
        p = np.arange(n, dtype=np.int64)
    ip = np.empty(n, dtype=np.int64)
    ip[p] = np.arange(n)
    ar = a[p][:, p].tocsr()

    n_pad = pad_rows(n, tile)
    nnz = np.zeros(n_pad, np.int32)
    nnz[:n] = np.diff(ar.indptr)
    nnz[n:] = 1
    K = max(int(nnz.max()), 1)
    cols = np.zeros((K, n_pad), np.int64)
    vals = np.zeros((K, n_pad), np.dtype(dtype))
    if ar.nnz:
        r = np.repeat(np.arange(n), np.diff(ar.indptr))
        slot = np.arange(len(ar.indices)) - np.repeat(ar.indptr[:-1],
                                                      np.diff(ar.indptr))
        cols[slot, r] = ar.indices
        vals[slot, r] = ar.data.astype(dtype)
    cols[0, n:] = np.arange(n, n_pad)  # identity pad rows
    vals[0, n:] = 1

    from raptor_tpu.ops.pallas.banded_kernel import BandedPlanError

    try:
        plan = banded_plan(cols, nnz, vals, tile=tile)
    except BandedPlanError:
        return None
    perm_pad = np.arange(n_pad, dtype=np.int32)
    perm_pad[:n] = p
    iperm_pad = np.arange(n_pad, dtype=np.int32)
    iperm_pad[:n] = ip
    return BandedMatrix(
        vals=plan["vals"], pidx=plan["pidx"],
        perm=jnp.asarray(perm_pad), iperm=jnp.asarray(iperm_pad),
        meta=(plan["K"], plan["n"], plan["tile"], plan["kh"],
              plan["npage"], plan["Wp"]),
        shape=a.shape,
    )


def _range_cost(ranges) -> int:
    """Total kernel page-select work of a plan: sum of per-slot page-range
    lengths (banded_plan ``ranges``)."""
    return sum(hi - lo + 1 for lo, hi in ranges if lo <= hi)


def _ranges_coherent(plan: dict, pages_per_slot: int = 4) -> bool:
    """True when a reorder could not meaningfully shrink the select chain:
    either the slots are page-coherent (narrow per-slot ranges) or the
    whole window is already narrow (an RCM-ordered hierarchy level, npage
    ~7 at 48^3 — re-RCM would buy pages-per-slot parity at the cost of a
    full host RCM pass per level)."""
    if plan["npage"] <= 16:
        return True
    r = plan.get("ranges")
    return r is not None and _range_cost(r) <= pages_per_slot * plan["K"]


def banded_from_ell(E: EllMatrix, tile: int = 1024,
                    reorder: bool = False) -> Optional[BandedMatrix]:
    """EllMatrix (already band-ordered, e.g. a level of an RCM-built
    hierarchy) -> BandedMatrix, identity perms.  Skips the csr round trip of
    ``banded_from_csr`` — the level's entry-major numpy arrays ARE the
    plan's input (measured ~3x faster layout attach at 48^3).

    ``reorder=True``: when the given ordering exceeds the kernel's plan
    bounds, RCM the matrix and retry, returning a ``reordered`` layout whose
    apply permutes in/out (core use: PMIS-coarsened natural-order levels —
    the irregular coarse-index compression inflates the inherited bandwidth
    past the caps at 128^3 scale; RCM recovers ~25-30%%, enough to re-enter
    the plan bounds, and two O(n) takes per apply beat the K*n gather-ELL
    SpMV by ~2 orders at n~1e6).  Either ordering may further fall back to
    a near/far SPLIT plan (banded_plan_split): the capped window rides the
    kernel and the few out-of-window entries (distance-2 plane couplings
    of a natural-ordered coarse operator) apply as a compacted row-subset
    gather/scatter block.  Fallback order: pure/split on the GIVEN
    ordering first — the kernel's cost is the per-slot page-range sum
    (banded_plan ``ranges``), and a column-sorted natural ordering keeps
    each slot page-coherent (ranges of 1-3 pages) where RCM jitters slots
    across the whole window — then RCM only when the given-order plan is
    missing or range-incoherent (sum > 4K pages)."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        BandedPlanError,
        banded_plan,
        banded_plan_split,
    )

    if E.n_rows_pad % tile != 0:
        return None
    vals = np.asarray(E.data)
    cols = np.asarray(E.cols)
    nnz = np.asarray(E.row_nnz)
    # identity pad rows keep the padded window SPD-consistent with the
    # hierarchy's identity padding (all-zero rows gather harmlessly anyway)
    try:
        plan, far = banded_plan(cols, nnz, vals, tile=tile), None
    except BandedPlanError:
        try:
            plan, far = banded_plan_split(cols, nnz, vals, tile=tile)
        except BandedPlanError:
            plan = None
    if (reorder and plan is not None and far is None
            and not _ranges_coherent(plan)):
        # full-window pure plan with jittered slots: an RCM re-banding can
        # shrink the window (and thus the select chain) — compare
        B = _banded_from_ell_rcm(E, tile)
        if (B is not None and B.far is None and B.slot_ranges is not None
                and _range_cost(B.slot_ranges) < _range_cost(plan["ranges"])):
            return B
    if plan is None:
        if not reorder:
            return None
        return _banded_from_ell_rcm(E, tile)
    eye = np.arange(E.n_rows_pad, dtype=np.int32)
    return BandedMatrix(
        vals=plan["vals"], pidx=plan["pidx"],
        perm=jnp.asarray(eye), iperm=jnp.asarray(eye),
        meta=(plan["K"], plan["n"], plan["tile"], plan["kh"],
              plan["npage"], plan["Wp"]),
        shape=E.shape, far=_far_from_dict(far),
        slot_ranges=plan.get("ranges"),
    )


def _banded_from_ell_rcm(E: EllMatrix, tile: int) -> Optional[BandedMatrix]:
    """RCM-retry half of ``banded_from_ell(reorder=True)``: symmetric-
    permute the logical block (identity-padded tail rows stay in place),
    re-plan, and mark the layout ``reordered``."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from raptor_tpu.core.ell import ell_to_csr
    from raptor_tpu.ops.pallas.banded_kernel import BandedPlanError, banded_plan

    n = E.shape[0]
    n_pad = E.n_rows_pad
    a = ell_to_csr(E).tocsr()[:n, :n]
    p = np.asarray(
        reverse_cuthill_mckee(a + a.T, symmetric_mode=True)).astype(np.int64)
    perm_pad = np.arange(n_pad, dtype=np.int64)
    perm_pad[:n] = p
    iperm_pad = np.arange(n_pad, dtype=np.int64)
    iperm_pad[p] = np.arange(n)
    vals = np.asarray(E.data)[:, perm_pad]
    nnz = np.asarray(E.row_nnz)[perm_pad]
    # cols: remap ids to the new ordering, then reorder rows; padding slots
    # hold col 0 / value 0 — any in-range id is harmless
    cols = iperm_pad[np.asarray(E.cols)][:, perm_pad]
    try:
        plan, far = banded_plan(cols, nnz, vals, tile=tile), None
    except BandedPlanError:
        from raptor_tpu.ops.pallas.banded_kernel import banded_plan_split

        try:
            plan, far = banded_plan_split(cols, nnz, vals, tile=tile)
        except BandedPlanError:
            return None
    return BandedMatrix(
        vals=plan["vals"], pidx=plan["pidx"],
        perm=jnp.asarray(perm_pad.astype(np.int32)),
        iperm=jnp.asarray(iperm_pad.astype(np.int32)),
        meta=(plan["K"], plan["n"], plan["tile"], plan["kh"],
              plan["npage"], plan["Wp"]),
        shape=E.shape, reordered=True, far=_far_from_dict(far),
        slot_ranges=plan.get("ranges"),
    )


def banded_spmv_ro(B: BandedMatrix, xr: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """y = A_rcm @ x in the REORDERED space (solve-loop form)."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        banded_spmv_pallas,
        banded_spmv_ref,
    )

    # interpret=True forces the (interpreted) kernel on any backend;
    # otherwise the compiled kernel runs only where it can (TPU) and other
    # backends take the reference path (ADVICE r2: interpret=False must not
    # force a compiled pallas_call on CPU)
    use_kernel = bool(interpret) or jax.default_backend() == "tpu"
    if use_kernel:
        y = banded_spmv_pallas(B.plan(), xr, interpret=bool(interpret))
    else:
        y = banded_spmv_ref(B.plan(), xr)
    return far_spmv_add(y, B.far, xr)


def banded_df64_residual(B: BandedMatrix, lo_blk, xh, bh, bl, v,
                         interpret: bool | None = None):
    """(rh, rl) = df64[(bh, bl) - v - A@xh] in the reordered space through
    the fused compensated-residual kernel (ops/pallas/banded_kernel);
    ``lo_blk`` is the optional blocked fp32 truncation remainder of the
    operator data (setup/hierarchy.attach_residual_lo)."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        banded_df64_residual_pallas,
        banded_df64_residual_ref,
    )

    use_kernel = bool(interpret) or jax.default_backend() == "tpu"
    if use_kernel:
        return banded_df64_residual_pallas(B.plan(), lo_blk, xh, bh, bl, v,
                                           interpret=bool(interpret))
    return banded_df64_residual_ref(B.plan(), lo_blk, xh, bh, bl, v)


def banded_spmv(B: BandedMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x in the ORIGINAL ordering (permutation applied inside)."""
    return jnp.take(banded_spmv_ro(B, jnp.take(x, B.perm, axis=0)),
                    B.iperm, axis=0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "pidx", "far"],
    meta_fields=["meta", "shape", "slot_ranges"],
)
@dataclasses.dataclass(frozen=True)
class RectBanded:
    """Rectangular banded operator (transfer P/R in an RCM hierarchy)."""

    vals: jax.Array
    pidx: jax.Array  # packed page*1024 + idx, int32
    meta: Tuple[int, ...]  # (K, n, n_cols, tile, WpP, npage)
    shape: Tuple[int, int]
    # near/far split (banded_plan_rect_split): out-of-window remainder —
    # the distance-2 plane couplings of a natural-ordered restriction
    far: Optional[FarBlock] = None
    # static per-slot page ranges (banded_plan_rect `ranges`)
    slot_ranges: Optional[Tuple] = None

    def plan(self) -> dict:
        K, n, n_cols, tile, WpP, npage = self.meta
        return dict(vals=self.vals, pidx=self.pidx, K=K, n=n,
                    n_cols=n_cols, tile=tile, WpP=WpP, npage=npage,
                    ranges=self.slot_ranges)


def rect_banded_from_ell(E: EllMatrix, n_cols_pad: int,
                         tile: int = 1024) -> Optional[RectBanded]:
    """Build the rectangular banded layout for a transfer operator whose
    column indices follow the grid-proportional band (RCM hierarchy).
    Returns None when shapes don't tile."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        BandedPlanError,
        banded_plan_rect_split,
    )

    if E.n_rows_pad % tile or n_cols_pad % 1024:
        return None
    try:
        plan, far = banded_plan_rect_split(
            np.asarray(E.cols), np.asarray(E.row_nnz), np.asarray(E.data),
            n_cols_pad=n_cols_pad, tile=tile,
        )
    except BandedPlanError:
        return None
    return RectBanded(
        vals=plan["vals"], pidx=plan["pidx"],
        meta=(plan["K"], plan["n"], plan["n_cols"], plan["tile"],
              plan["WpP"], plan["npage"]),
        shape=E.shape, far=_far_from_dict(far),
        slot_ranges=plan.get("ranges"),
    )


def rect_banded_spmv(B: RectBanded, x: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """y = B @ x; x padded to meta n_cols.  Kernel on TPU, ref elsewhere."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        banded_spmv_rect_pallas,
        banded_spmv_rect_ref,
    )

    use_kernel = bool(interpret) or jax.default_backend() == "tpu"
    if use_kernel:
        y = banded_spmv_rect_pallas(B.plan(), x, interpret=bool(interpret))
    else:
        y = banded_spmv_rect_ref(B.plan(), x)
    return far_spmv_add(y, B.far, x)


# ---------------------------------------------------------------------------
# Geo-split transfer operators (setup/hierarchy geo levels): alternating
# semicoarsening on a lexicographic grid makes P/R applications expressible
# as STATIC reshapes + elementwise weight products — no gathers, no plans,
# nothing to pull off the device at attach time.  apply cost = pure
# vector-memory traffic (the structured engine's transfer shape).
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["wm", "wp"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class GeoTransfer:
    """P (and its exact transpose R) of one geo-split level.

    Fine index i = hi*(m*s) + j*s + lo  (j = coordinate of the coarsened
    dim, extent m, stride s); coarse point t sits at fine j = 2t.  F rows
    (odd j) interpolate  wm[i] * xc(t) + wp[i] * xc(t+1)  with wp = 0 at
    the right boundary; C rows copy.  ``wm``/``wp`` are (n_pad_f,) in fine
    ordering (only odd-j entries are used)."""

    wm: jax.Array
    wp: jax.Array
    # (H, m, mc, s, n_f, n_pad_f, nc_pad)
    meta: tuple


def geo_prolong(T: GeoTransfer, xc: jax.Array) -> jax.Array:
    H, m, mc, s, n_f, n_pad_f, nc_pad = T.meta
    mo = m // 2
    dt = xc.dtype
    Xc = xc[: H * mc * s].reshape(H, mc, s)
    Wm = T.wm[:n_f].reshape(H, m, s)[:, 1::2, :].astype(dt)
    Wp = T.wp[:n_f].reshape(H, m, s)[:, 1::2, :].astype(dt)
    L = Xc[:, :mo, :]
    R_ = jnp.pad(Xc, ((0, 0), (0, 1), (0, 0)))[:, 1 : mo + 1, :]
    O = Wm * L + Wp * R_
    if mo < mc:  # odd extent: pad the odd plane stack to mc, trim after
        O = jnp.pad(O, ((0, 0), (0, mc - mo), (0, 0)))
    Y = jnp.stack([Xc, O], axis=2).reshape(H, 2 * mc, s)[:, :m, :]
    out = Y.reshape(-1)
    return jnp.concatenate([out, jnp.zeros(n_pad_f - n_f, dt)])


def geo_restrict(T: GeoTransfer, xf: jax.Array) -> jax.Array:
    H, m, mc, s, n_f, n_pad_f, nc_pad = T.meta
    mo = m // 2
    dt = xf.dtype
    Xf = xf[:n_f].reshape(H, m, s)
    E = Xf[:, 0::2, :]  # (H, mc, s)
    Od = Xf[:, 1::2, :]  # (H, mo, s)
    Wm = T.wm[:n_f].reshape(H, m, s)[:, 1::2, :].astype(dt)
    Wp = T.wp[:n_f].reshape(H, m, s)[:, 1::2, :].astype(dt)
    WmO = Wm * Od
    WpO = Wp * Od
    yc = E
    yc = yc + jnp.pad(WmO, ((0, 0), (0, mc - mo), (0, 0)))
    # odd j = 2t-1 contributes wp to coarse t >= 1; the last odd plane's
    # wp is zero for even m (right grid boundary), so trimming to mc-1
    # planes before the top-pad is exact for both parities
    yc = yc + jnp.pad(WpO[:, : mc - 1, :], ((0, 0), (1, 0), (0, 0)))
    out = yc.reshape(-1)
    return jnp.concatenate([out, jnp.zeros(nc_pad - H * mc * s, dt)])
