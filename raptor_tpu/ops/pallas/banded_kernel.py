"""Banded gather SpMV: the TPU-native general-matrix kernel.

Capability target (SURVEY.md §0 — the public RAPtor AMG library named by
BASELINE.json:5; convergence spec = tests/oracle/amg_oracle.py): a
competitive SpMV for general CSR matrices (BASELINE.json:5) — the layout
the reference's CSR kernels become on TPU.

Why this exists: XLA lowers ``jnp.take`` from HBM to element-at-a-time
dynamic slices (~0.02 GDOF/s measured, docs/DESIGN.md §1).  The TPU *does*
have a vectorized gather — ``tpu.dynamic_gather`` — but only within a
single (8, 128) vreg along the gathered axis.  The kernel turns the
general SpMV into exactly that:

1. **RCM** (host, setup): reorder so every entry sits within bandwidth W
   of the diagonal (shuffled Poisson: W drops from O(n) to O(n^(2/3))).
2. **Windowed tiles**: for a tile of R output rows, the touched x-span is
   a VMEM window of R + 2*Wp values, delivered by the Pallas pipeline as
   neighbor blocks — x is read once per tile, never gathered from HBM.
3. **Paged two-stage vreg gather**: the window is a stack of 1024-element
   pages (one (8, 128) vreg each).  An entry's target is (page, idx)
   with idx = sub*128 + lane.  Per ELL slot and output row:

       g1 = dyn_gather(page_vreg, lane_idx, axis=1)   # lane gather
       g2 = dyn_gather(g1,       sub_idx,  axis=0)    # sublane gather
       val = where(page == p, g2[0], val)             # page select

   Both index vectors depend only on the output lane, so the composition
   yields  page_vreg[sub[j], lane[j]]  exactly — the ELL gather, at full
   VPU lane width, ~5 vreg ops per page.

All metadata is precomputed host-side at setup (structure-only pass) and
streamed as ONE packed int32 per entry — ``pidx = page*1024 + idx``
(= the entry's offset into the tile's window), unpacked in-kernel with a
shift and a mask.  Packing halves the metadata HBM traffic (8 B/entry with
fp32 values, 6 B with a bf16-cast preconditioner, vs 12 B unpacked), and
the banded SpMV is bandwidth-bound on exactly that stream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_plan", "banded_spmv_pallas", "banded_spmv_ref",
           "banded_df64_residual_pallas", "banded_df64_residual_ref",
           "BandedPlanError"]

LANE = 128
SUB = 8
PAGE = SUB * LANE  # 1024 elements = one (8, 128) f32 vreg

# Plan-time bounds (ADVICE r2): a matrix whose RCM bandwidth stays large is
# not banded — an unbounded plan would emit 2*kh+1 neighbor BlockSpecs and a
# K*npage-unrolled page-select chain (compile-time scoped-VMEM OOM /
# pathological compiles).  Production plans sit far below these caps
# (shuffled 48^3 Poisson: kh=3, npage=7); callers catch BandedPlanError and
# stay on the gather-ELL path.
MAX_NPAGE = 48
MAX_KH = 24
VMEM_BUDGET = 13 * 2**20  # same budget as ops/pallas/dia_kernel


class BandedPlanError(ValueError):
    """Matrix bandwidth too large for the paged-gather kernel."""


def _round_up(x, m):
    return (x + m - 1) // m * m


def _check_plan_bounds(kh: int, npage: int, K: int, tile: int,
                       itemsize: int, what: str):
    # double-buffered window + 2 meta blocks (vals + packed pidx) + output
    vmem = 2 * ((2 * kh + 1 + 1) * tile * itemsize
                + 2 * K * tile * max(itemsize, 4))
    if npage > MAX_NPAGE or kh > MAX_KH or vmem > VMEM_BUDGET:
        raise BandedPlanError(
            f"{what}: bandwidth too large for the paged-gather kernel "
            f"(kh={kh}, npage={npage}, est VMEM={vmem >> 20}MiB)")


def banded_plan(cols: np.ndarray, nnz: np.ndarray, vals: np.ndarray,
                tile: int = 1024):
    """Host structure pass.  ``cols``/``vals`` are entry-major ELL arrays
    (K, n_pad) of a matrix whose entries all lie within |col - row| <= W
    (e.g. after RCM); ``nnz`` (n_pad,).  Returns the static plan dict
    consumed by ``banded_spmv_pallas``.  ``tile`` (= R output rows per
    grid step) must be a multiple of 1024.
    """
    K, n = cols.shape
    assert tile % PAGE == 0, tile
    assert n % tile == 0, (n, tile)
    # int32 throughout: this pass runs per level at setup time; int64
    # temporaries doubled its memory traffic (cols is int32 by layout)
    rows = np.arange(n, dtype=np.int32)
    cols = cols.astype(np.int32, copy=False)
    mask = np.arange(K, dtype=np.int32)[:, None] < nnz[None, :]
    delta = np.where(mask, cols - rows[None, :], 0)
    W = int(np.abs(delta).max()) if mask.any() else 1
    Wp = _round_up(max(W, 1), PAGE)  # page-aligned halo
    kh = Wp // tile + (1 if Wp % tile else 0)
    npage = (tile + 2 * Wp) // PAGE
    _check_plan_bounds(kh, npage, K, tile, np.dtype(vals.dtype).itemsize,
                       "banded_plan")

    tbase = (rows // tile) * tile
    # packed meta: window offset = page*PAGE + (sub*128 + lane), one int32
    f = np.where(mask, cols + np.int32(Wp) - tbase[None, :], 0)
    v = np.where(mask, vals, 0)

    # static per-slot page ranges: column-sorted rows (CSR slot order) give
    # each slot a NARROW page interval — e.g. the plane groups of a
    # natural-ordered 3D coarse operator — so the kernel's page-select
    # chain shrinks from K*npage to sum_k |range_k| (measured 9x on the
    # 128^3 algebraic L1, round 4).  Slots whose entries span the window
    # (RCM-jittered data) degenerate to the full range — no loss.  Masked
    # slots take their slot's lo page as a harmless in-range dummy.
    pg = f >> 10  # f // PAGE
    BIG = np.int32(1 << 20)
    lo_k = np.where(mask, pg, BIG).min(axis=1)
    hi_k = np.where(mask, pg, -1).max(axis=1)
    empty = hi_k < 0
    lo_k = np.where(empty, 1, lo_k)
    hi_k = np.where(empty, 0, hi_k)  # (1, 0): statically skipped slot
    f = np.where(mask, f, (np.where(empty, 0, lo_k) << 10)[:, None])
    ranges = tuple((int(a), int(b)) for a, b in zip(lo_k, hi_k))

    T = n // tile
    R_rows = tile // LANE

    def blk(a, dtype):
        # transpose + astype in one contiguous copy
        return a.reshape(K, T, R_rows, LANE).transpose(1, 0, 2, 3).astype(
            dtype, order="C")

    return dict(
        pidx=jnp.asarray(blk(f, np.int32)),
        vals=jnp.asarray(blk(v, vals.dtype)),
        K=K, n=n, tile=tile, kh=kh, npage=npage, Wp=Wp, ranges=ranges,
    )


def _compact_far(cols: np.ndarray, vals: np.ndarray, far_mask: np.ndarray,
                 pad_row: int, max_far_frac: float, max_far_k: int,
                 what: str, nnz_total: int = 0):
    """Compact the out-of-window entries of an ELL matrix into a dense
    row-subset block: only rows that HAVE far entries are stored, front-
    packed along a small K_far slot axis.  The apply gathers x at
    K_far * m indices and scatter-adds m partial sums — at the measured
    ~1-5%% far fractions this is ~20-100x less gather volume than the
    full-K gather-ELL fallback the split replaces (round 4: the L0
    restrict at 128^3 ran 143 ms as gather-ELL).

    Returns dict(rows (m_pad,), cols (K_far, m_pad), vals, m) or raises
    BandedPlanError when the far part is too heavy for the split to pay
    (fraction > max_far_frac or K_far > max_far_k)."""
    far_cnt = far_mask.sum(axis=0)
    rows_f = np.nonzero(far_cnt)[0].astype(np.int32)
    m = rows_f.size
    if m == 0:
        return None
    K_far = int(far_cnt.max())
    frac = float(far_mask.sum()) / float(max(nnz_total, 1))
    if K_far > max_far_k or frac > max_far_frac:
        raise BandedPlanError(
            f"{what}: far remainder too heavy for a split plan "
            f"(K_far={K_far}, frac={frac:.3f})")
    m_pad = _round_up(m, LANE)
    sel = far_mask[:, rows_f]
    order = np.argsort(~sel, axis=0, kind="stable")  # far slots first
    cc = np.take_along_axis(cols[:, rows_f], order, axis=0)[:K_far]
    vv = np.take_along_axis(vals[:, rows_f], order, axis=0)[:K_far]
    ss = np.take_along_axis(sel, order, axis=0)[:K_far]
    fc = np.zeros((K_far, m_pad), np.int32)
    fv = np.zeros((K_far, m_pad), vals.dtype)
    fc[:, :m] = np.where(ss, cc, 0)
    fv[:, :m] = np.where(ss, vv, 0)
    rows_pad = np.full(m_pad, pad_row, np.int32)
    rows_pad[:m] = rows_f
    return dict(rows=rows_pad, cols=fc, vals=fv, m=m)


def banded_plan_split(cols: np.ndarray, nnz: np.ndarray, vals: np.ndarray,
                      tile: int = 1024, max_far_frac: float = 0.15,
                      max_far_k: int = 16):
    """``banded_plan`` with a near/far split: entries within the largest
    cap-admissible window ride the paged-gather kernel; the few outside
    (e.g. the distance-2 plane couplings of a natural-ordered 3D coarse
    operator, ~1-5%% of nnz) become a compacted row-subset block
    (``_compact_far``).  Returns (plan, far_or_None); raises
    BandedPlanError when even the split cannot fit."""
    K, n = cols.shape
    rows = np.arange(n, dtype=np.int32)
    cols = cols.astype(np.int32, copy=False)
    mask = np.arange(K, dtype=np.int32)[:, None] < nnz[None, :]
    delta = np.where(mask, cols - rows[None, :], 0)
    W = int(np.abs(delta).max()) if mask.any() else 1
    # largest page-aligned half-window the caps admit (npage binds for
    # tile=1024: (tile + 2*Wp)//PAGE <= MAX_NPAGE)
    w_cap = ((MAX_NPAGE * PAGE - tile) // 2 // PAGE) * PAGE
    w_cap = min(w_cap, MAX_KH * tile)
    if W <= w_cap:
        return banded_plan(cols, nnz, vals, tile=tile), None
    far_mask = mask & (np.abs(delta) > w_cap)
    far = _compact_far(cols, vals, far_mask, n - 1, max_far_frac,
                       max_far_k, "banded_plan_split",
                       nnz_total=int(mask.sum()))
    near_cols = np.where(far_mask, rows[None, :], cols)
    near_vals = np.where(far_mask, 0, vals)
    return banded_plan(near_cols, nnz, near_vals, tile=tile), far


def banded_plan_rect_split(cols: np.ndarray, nnz: np.ndarray,
                           vals: np.ndarray, n_cols_pad: int,
                           tile: int = 1024, max_far_frac: float = 0.15,
                           max_far_k: int = 16):
    """``banded_plan_rect`` with a near/far split (see banded_plan_split).
    The restriction operator of a natural-ordered 3D hierarchy is the
    canonical client: its distance-2 fine-plane couplings put the full
    window at ~2x the npage cap while carrying ~1-5%% of nnz."""
    K, n = cols.shape
    T = n // tile
    rows = np.arange(n, dtype=np.int64)
    cols64 = cols.astype(np.int64, copy=False)
    t = rows // tile
    mask = np.arange(K, dtype=np.int32)[:, None] < nnz[None, :]
    center = ((t * n_cols_pad) // (T * PAGE)) * PAGE
    delta = np.where(mask, cols64 - center[None, :], 0)
    lo_d = int(delta.min()) if mask.any() else 0
    hi_d = int(delta.max()) if mask.any() else 1
    WpP = max(-(-(-lo_d) // PAGE), 0) if lo_d < 0 else 0
    npage = max(WpP + -(-(hi_d + 1) // PAGE), 1)
    if npage <= MAX_NPAGE:
        return banded_plan_rect(cols, nnz, vals, n_cols_pad, tile=tile), None
    d = delta[mask]
    for q in (0.999, 0.995, 0.99, 0.98, 0.95, 0.9, 0.8):
        lo_q = int(np.quantile(d, 1.0 - q))
        hi_q = int(np.quantile(d, q))
        WpP = max(-(-(-lo_q) // PAGE), 0) if lo_q < 0 else 0
        npage = max(WpP + -(-(hi_q + 1) // PAGE), 1)
        if npage <= MAX_NPAGE:
            break
    else:
        raise BandedPlanError(
            f"banded_plan_rect_split: no admissible window (npage={npage})")
    lo_e, hi_e = -WpP * PAGE, (npage - WpP) * PAGE - 1
    far_mask = mask & ((delta < lo_e) | (delta > hi_e))
    far = _compact_far(cols.astype(np.int32), vals, far_mask, n - 1,
                       max_far_frac, max_far_k, "banded_plan_rect_split",
                       nnz_total=int(mask.sum()))
    # in-window dummy target for the far slots: the tile's own center
    near_cols = np.where(far_mask, center[None, :], cols64).astype(np.int32)
    near_vals = np.where(far_mask, 0, vals)
    return banded_plan_rect(near_cols, nnz, near_vals, n_cols_pad,
                            tile=tile), far


def _unpack_pidx(pi):
    """(page, sub, lane) broadcast forms from the packed window offset.
    Shift amounts are typed int32 explicitly: under jax_enable_x64 a bare
    Python literal weak-promotes to int64 and lax.shift_right_logical
    rejects the mixed dtypes."""
    dt = pi.dtype
    pg = jax.lax.shift_right_logical(pi, jnp.asarray(10, dt))  # // PAGE
    ix = jnp.bitwise_and(pi, jnp.asarray(PAGE - 1, dt))
    sub = jnp.broadcast_to(
        jax.lax.shift_right_logical(ix, jnp.asarray(7, dt)), (SUB, LANE))
    ln = jnp.broadcast_to(jnp.bitwise_and(ix, jnp.asarray(LANE - 1, dt)),
                          (SUB, LANE))
    return pg, sub, ln


@partial(jax.jit, static_argnames=("K", "n", "tile", "kh", "npage",
                                   "interpret", "vma", "ranges"))
def _banded_call(vals, pidx, x_pad, K: int, n: int, tile: int, kh: int,
                 npage: int, interpret: bool = False,
                 vma: tuple | None = None,
                 ranges: tuple | None = None):
    R_rows = tile // LANE
    T = n // tile
    nref = 2 * kh + 1
    # first window page starts at element kh*tile - Wp of the concat; with
    # Wp page-aligned this is a whole-page offset
    Wp_pages = (npage - tile // PAGE) // 2
    p0 = kh * (tile // PAGE) - Wp_pages  # concat page index of window page 0

    x2 = x_pad.reshape(-1, LANE)

    def kernel(*refs):
        x_refs = refs[:nref]
        d_ref, pi_ref, o_ref = refs[nref:]
        win = jnp.concatenate([r[:] for r in x_refs], axis=0)
        for r in range(R_rows):
            acc = None
            for k in range(K):
                p_lo, p_hi = ranges[k] if ranges else (0, npage - 1)
                if p_lo > p_hi:
                    continue  # statically empty slot (padding-only)
                pg, sub, ln = _unpack_pidx(pi_ref[0, k, r:r + 1, :])
                # two-stage gather per page + (1, LANE) select, restricted
                # to the slot's static page range (banded_plan's `ranges`:
                # column-sorted slots of plane-structured operators span a
                # few pages each, so the chain shrinks from K*npage to
                # sum_k |range_k|).  Measured alternatives that LOST:
                # lane-gather-per-page with one final sublane gather (the
                # widened (8,128) page selects cost more than the saved
                # gathers, 0.70->0.80 ms), and per-(t,k,r) ranges (RCM
                # jitter spans the window)
                val = jnp.zeros((1, LANE), x_pad.dtype)
                for p in range(p_lo, p_hi + 1):
                    wp = win[(p0 + p) * SUB: (p0 + p + 1) * SUB]  # (8, 128)
                    g1 = jnp.take_along_axis(wp, ln, axis=1)
                    g2 = jnp.take_along_axis(g1, sub, axis=0)
                    val = jnp.where(pg == p, g2[0:1, :], val)
                term = d_ref[0, k, r:r + 1, :] * val
                acc = term if acc is None else acc + term
            o_ref[r:r + 1, :] = acc if acc is not None else jnp.zeros(
                (1, LANE), x_pad.dtype)

    x_specs = [
        pl.BlockSpec((R_rows, LANE), (lambda t, i=i: (t + i, 0)),
                     memory_space=pltpu.VMEM)
        for i in range(nref)
    ]
    meta = pl.BlockSpec((1, K, R_rows, LANE), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=x_specs + [meta, meta],
        out_specs=pl.BlockSpec((R_rows, LANE), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        # vma: inside shard_map with check_vma, the output varies over the
        # mesh axes the sharded inputs vary over (parallel.dist)
        out_shape=jax.ShapeDtypeStruct((n // LANE, LANE), x_pad.dtype,
                                       vma=frozenset(vma) if vma else None),
        interpret=interpret,
    )(*([x2] * nref), vals, pidx)
    return out.reshape(-1)


def banded_spmv_pallas(plan: dict, x, interpret: bool = False):
    """y = A @ x through the banded dynamic-gather kernel (see module doc).
    ``x`` has length plan['n']; same ordering as the plan's cols."""
    tile, kh = plan["tile"], plan["kh"]
    pad = kh * tile
    x_pad = jnp.concatenate([jnp.zeros(pad, x.dtype), x,
                             jnp.zeros(pad, x.dtype)])
    return _banded_call(plan["vals"], plan["pidx"], x_pad,
                        K=plan["K"], n=plan["n"], tile=tile, kh=kh,
                        npage=plan["npage"], interpret=interpret,
                        ranges=plan.get("ranges"))


def banded_spmv_ref(plan: dict, x):
    """Reference implementation of the same plan (plain jnp gathers) for
    correctness tests on any backend."""
    pad = plan["kh"] * plan["tile"]
    x_pad = jnp.concatenate([jnp.zeros(pad, x.dtype), x,
                             jnp.zeros(pad, x.dtype)])
    return banded_ref_padded(plan, x_pad)


def banded_ref_padded(plan: dict, x_pad):
    """Reference path on an externally padded vector: ``x_pad`` is
    [left pad | x | right pad] with kh*tile values each side — zeros on a
    single device, neighbor halos in the distributed SpMV
    (parallel.dist.dist_banded_spmv)."""
    n, tile = plan["n"], plan["tile"]
    kh = plan["kh"]
    R_rows = tile // LANE
    npage = plan["npage"]
    Wp_pages = (npage - tile // PAGE) // 2
    p0 = kh * (tile // PAGE) - Wp_pages
    T = n // tile
    y = jnp.zeros((T, R_rows, LANE), x_pad.dtype)
    for t in range(T):
        wstart = t * tile + p0 * PAGE
        win = x_pad[wstart: wstart + npage * PAGE]
        for k in range(plan["K"]):
            y = y.at[t].add(plan["vals"][t, k] * win[plan["pidx"][t, k]])
    return y.reshape(-1)


# ---------------------------------------------------------------------------
# Fused df64 compensated residual on the banded layout: one kernel computes
# (rh, rl) = df64[ (bh, bl) - v - A @ xh ] with the Dekker two_prod error
# term (and optionally the operator's own fp32 truncation remainder
# A_lo * xh, setup/hierarchy.attach_residual_lo) folded into the
# compensation.  Replaces solve_hier_refined's per-slot jnp.take chain —
# K full-vector HBM gathers plus ~4K elementwise passes per refinement
# round — with a single pass that reads xh once per tile through the same
# paged vreg gather as the SpMV.  ``v`` carries the fp32 A @ x_lo term
# (one ordinary banded apply; its rounding sits ~2^-48 below the residual).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("K", "n", "tile", "kh", "npage",
                                   "interpret", "ranges"))
def _banded_df64_resid_call(vals, vals_lo, pidx, x_pad, bh, bl, v,
                            K: int, n: int, tile: int, kh: int, npage: int,
                            interpret: bool = False,
                            ranges: tuple | None = None):
    from raptor_tpu.utils.df64 import df_add, two_prod

    R_rows = tile // LANE
    T = n // tile
    nref = 2 * kh + 1
    Wp_pages = (npage - tile // PAGE) // 2
    p0 = kh * (tile // PAGE) - Wp_pages

    x2 = x_pad.reshape(-1, LANE)
    bh2 = bh.reshape(-1, LANE)
    bl2 = bl.reshape(-1, LANE)
    v2 = v.reshape(-1, LANE)
    has_lo = vals_lo is not None

    def kernel(*refs):
        x_refs = refs[:nref]
        refs = refs[nref:]
        d_ref = refs[0]
        dl_ref = refs[1] if has_lo else None
        pi_ref, bh_ref, bl_ref, v_ref, rh_ref, rl_ref = refs[
            2 if has_lo else 1:]
        win = jnp.concatenate([r[:] for r in x_refs], axis=0)
        for r in range(R_rows):
            vv = v_ref[r:r + 1, :]
            sh, se = df_add(bh_ref[r:r + 1, :], bl_ref[r:r + 1, :],
                            -vv, jnp.zeros_like(vv))
            for k in range(K):
                p_lo, p_hi = ranges[k] if ranges else (0, npage - 1)
                if p_lo > p_hi:
                    continue  # statically empty slot
                pg, sub, ln = _unpack_pidx(pi_ref[0, k, r:r + 1, :])
                gh = jnp.zeros((1, LANE), x_pad.dtype)
                for p in range(p_lo, p_hi + 1):
                    wp = win[(p0 + p) * SUB: (p0 + p + 1) * SUB]
                    g1 = jnp.take_along_axis(wp, ln, axis=1)
                    g2 = jnp.take_along_axis(g1, sub, axis=0)
                    gh = jnp.where(pg == p, g2[0:1, :], gh)
                ph, pe = two_prod(d_ref[0, k, r:r + 1, :], gh)
                if has_lo:
                    # a0_lo * x_hi: certify against the UNROUNDED operator
                    pe = pe + dl_ref[0, k, r:r + 1, :] * gh
                sh, se = df_add(sh, se, -ph, -pe)
            rh_ref[r:r + 1, :] = sh
            rl_ref[r:r + 1, :] = se

    x_specs = [
        pl.BlockSpec((R_rows, LANE), (lambda t, i=i: (t + i, 0)),
                     memory_space=pltpu.VMEM)
        for i in range(nref)
    ]
    meta = pl.BlockSpec((1, K, R_rows, LANE), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((R_rows, LANE), lambda t: (t, 0),
                       memory_space=pltpu.VMEM)
    meta_specs = [meta, meta] if has_lo else [meta]
    meta_args = ([vals, vals_lo] if has_lo else [vals]) + [pidx]
    rh, rl = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=x_specs + meta_specs + [meta, vec, vec, vec],
        out_specs=(vec, vec),
        out_shape=(jax.ShapeDtypeStruct((n // LANE, LANE), x_pad.dtype),
                   jax.ShapeDtypeStruct((n // LANE, LANE), x_pad.dtype)),
        interpret=interpret,
    )(*([x2] * nref), *meta_args, bh2, bl2, v2)
    return rh.reshape(-1), rl.reshape(-1)


def banded_df64_residual_pallas(plan: dict, vals_lo, xh, bh, bl, v,
                                interpret: bool = False):
    """(rh, rl) = df64[(bh, bl) - v - A@xh] through the fused kernel.
    ``vals_lo``: optional (T, K, R_rows, LANE) fp32 truncation remainder of
    the operator data in the plan's blocked layout (None to skip)."""
    tile, kh = plan["tile"], plan["kh"]
    pad = kh * tile
    x_pad = jnp.concatenate([jnp.zeros(pad, xh.dtype), xh,
                             jnp.zeros(pad, xh.dtype)])
    return _banded_df64_resid_call(
        plan["vals"], vals_lo, plan["pidx"], x_pad, bh, bl, v,
        K=plan["K"], n=plan["n"], tile=tile, kh=kh, npage=plan["npage"],
        interpret=interpret)


def banded_df64_residual_ref(plan: dict, vals_lo, xh, bh, bl, v):
    """Plain-jnp reference of the fused df64 residual (any backend): the
    same EFT accumulation order as the kernel, windowed gathers in jnp."""
    from raptor_tpu.utils.df64 import df_add, two_prod

    n, tile, kh = plan["n"], plan["tile"], plan["kh"]
    R_rows = tile // LANE
    npage = plan["npage"]
    Wp_pages = (npage - tile // PAGE) // 2
    p0 = kh * (tile // PAGE) - Wp_pages
    T = n // tile
    pad = kh * tile
    x_pad = jnp.concatenate([jnp.zeros(pad, xh.dtype), xh,
                             jnp.zeros(pad, xh.dtype)])
    rh = jnp.zeros((T, R_rows, LANE), xh.dtype)
    rl = jnp.zeros((T, R_rows, LANE), xh.dtype)
    bh3 = bh.reshape(T, R_rows, LANE)
    bl3 = bl.reshape(T, R_rows, LANE)
    v3 = v.reshape(T, R_rows, LANE)
    for t in range(T):
        wstart = t * tile + p0 * PAGE
        win = x_pad[wstart: wstart + npage * PAGE]
        sh, se = df_add(bh3[t], bl3[t], -v3[t], jnp.zeros_like(v3[t]))
        for k in range(plan["K"]):
            gh = win[plan["pidx"][t, k]]
            ph, pe = two_prod(plan["vals"][t, k], gh)
            if vals_lo is not None:
                pe = pe + vals_lo[t, k] * gh
            sh, se = df_add(sh, se, -ph, -pe)
        rh = rh.at[t].set(sh)
        rl = rl.at[t].set(se)
    return rh.reshape(-1), rl.reshape(-1)


# ---------------------------------------------------------------------------
# Rectangular variant: transfer operators P (fine x coarse) and R
# (coarse x fine) in an RCM-ordered hierarchy are banded under the
# grid-proportional map col ~ row * (n_cols/n_rows) — coarse ranks are
# cumsum-compacted C-point positions, monotone in the fine ordering.  The
# window base for output tile t is page-aligned floor(t * tile_c / PAGE),
# and the window is delivered as npage single-page neighbor refs.
# ---------------------------------------------------------------------------


def banded_plan_rect(cols: np.ndarray, nnz: np.ndarray, vals: np.ndarray,
                     n_cols_pad: int, tile: int = 1024):
    """Host structure pass for a rectangular banded operator.

    ``cols`` (K, n_rows_pad) index the x-space [0, n_cols_pad);
    entries must satisfy |col - row * n_cols_pad/n_rows_pad| <= W for a
    moderate W (checked by construction below).  Returns the plan dict for
    ``banded_spmv_rect_pallas``.
    """
    K, n = cols.shape
    assert tile % PAGE == 0 and n % tile == 0, (n, tile)
    assert n_cols_pad % PAGE == 0, n_cols_pad
    T = n // tile
    rows = np.arange(n, dtype=np.int64)
    cols = cols.astype(np.int64, copy=False)
    t = rows // tile
    mask = np.arange(K, dtype=np.int32)[:, None] < nnz[None, :]
    # per-tile window center: whole pages, monotone in t; integer floor
    # arithmetic IDENTICAL to the kernel's index map
    # ((t*nc)//T)//PAGE == (t*nc)//(T*PAGE) for non-negative ints
    center = ((t * n_cols_pad) // (T * PAGE)) * PAGE
    delta = np.where(mask, cols - center[None, :], 0)
    lo_d = int(delta.min()) if mask.any() else 0
    hi_d = int(delta.max()) if mask.any() else 1
    # window [center - WpP*PAGE, ...) covering [lo_d, hi_d]
    WpP = max(-(-(-lo_d) // PAGE), 0) if lo_d < 0 else 0
    npage = WpP + -(-(hi_d + 1) // PAGE)
    npage = max(npage, 1)
    _check_plan_bounds(0, npage, K, tile, np.dtype(vals.dtype).itemsize,
                       "banded_plan_rect")

    f = np.where(mask, delta + np.int64(WpP * PAGE), 0).astype(np.int32)
    assert (f[mask] >= 0).all() and (f[mask] < npage * PAGE).all()
    v = np.where(mask, vals, 0)

    # static per-slot page ranges (see banded_plan): transfer slots of a
    # natural-ordered hierarchy are column-sorted, so each slot covers a
    # narrow page interval of the window
    pg = f >> 10
    BIG = np.int32(1 << 20)
    lo_k = np.where(mask, pg, BIG).min(axis=1)
    hi_k = np.where(mask, pg, -1).max(axis=1)
    empty = hi_k < 0
    lo_k = np.where(empty, 1, lo_k)
    hi_k = np.where(empty, 0, hi_k)
    f = np.where(mask, f, (np.where(empty, 0, lo_k) << 10)[:, None])
    ranges = tuple((int(a), int(b)) for a, b in zip(lo_k, hi_k))

    R_rows = tile // LANE

    def blk(a, dtype):
        # transpose + astype in one contiguous copy
        return a.reshape(K, T, R_rows, LANE).transpose(1, 0, 2, 3).astype(
            dtype, order="C")

    return dict(
        pidx=jnp.asarray(blk(f, np.int32)),
        vals=jnp.asarray(blk(v, vals.dtype)),
        K=K, n=n, n_cols=n_cols_pad, tile=tile, WpP=WpP, npage=npage,
        ranges=ranges,
    )


@partial(jax.jit, static_argnames=("K", "n", "n_cols", "tile", "WpP",
                                   "npage", "interpret", "map_cols", "vma",
                                   "ranges"))
def _banded_call_rect(vals, pidx, x, K: int, n: int, n_cols: int,
                      tile: int, WpP: int, npage: int,
                      interpret: bool = False, map_cols: int | None = None,
                      vma: tuple | None = None,
                      ranges: tuple | None = None):
    """``map_cols`` (default n_cols): numerator of the window index map —
    the distributed wrapper passes the LOCAL plan ratio while ``x`` is the
    halo-extended local buffer (parallel.dist.dist_rect_banded_spmv), with
    WpP folded into the buffer offset (passed as 0)."""
    R_rows = tile // LANE
    T = n // tile
    total_pages = x.shape[0] // PAGE  # buffer size; n_cols == len(x) when
    x2 = x.reshape(total_pages * SUB, LANE)  # not distributed

    def kernel(*refs):
        x_refs = refs[:npage]  # one page (SUB, LANE) each
        d_ref, pi_ref, o_ref = refs[npage:]
        for r in range(R_rows):
            acc = None
            for k in range(K):
                p_lo, p_hi = ranges[k] if ranges else (0, npage - 1)
                if p_lo > p_hi:
                    continue  # statically empty slot
                pg, sub, ln = _unpack_pidx(pi_ref[0, k, r:r + 1, :])
                val = jnp.zeros((1, LANE), x.dtype)
                for p in range(p_lo, p_hi + 1):
                    wp = x_refs[p][:]
                    g1 = jnp.take_along_axis(wp, ln, axis=1)
                    g2 = jnp.take_along_axis(g1, sub, axis=0)
                    val = jnp.where(pg == p, g2[0:1, :], val)
                term = d_ref[0, k, r:r + 1, :] * val
                acc = term if acc is None else acc + term
            o_ref[r:r + 1, :] = acc if acc is not None else jnp.zeros(
                (1, LANE), x.dtype)

    # window page p of tile t = clamp((t*tile_c)//PAGE - WpP + p); the
    # division is done in the index map (traced integer arithmetic)
    tc_num = n_cols if map_cols is None else map_cols
    tc_den = T  # tile_c = tc_num / tc_den

    def page_index(t, p):
        base = (t * tc_num) // (tc_den * PAGE) - WpP
        return jnp.clip(base + p, 0, total_pages - 1)

    x_specs = [
        pl.BlockSpec((SUB, LANE), (lambda t, p=p: (page_index(t, p), 0)),
                     memory_space=pltpu.VMEM)
        for p in range(npage)
    ]
    meta = pl.BlockSpec((1, K, R_rows, LANE), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=x_specs + [meta, meta],
        out_specs=pl.BlockSpec((R_rows, LANE), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // LANE, LANE), x.dtype,
                                       vma=frozenset(vma) if vma else None),
        interpret=interpret,
    )(*([x2] * npage), vals, pidx)
    return out.reshape(-1)


def banded_rect_ref_buf(plan: dict, x_buf, map_cols: int):
    """Plain-jnp reference of the rectangular plan against a halo-extended
    local buffer (the distributed form: WpP folded into the buffer offset,
    window base = (t*map_cols)//(T*PAGE), clamped to the buffer)."""
    n, tile = plan["n"], plan["tile"]
    T = n // tile
    R_rows = tile // LANE
    total_pages = x_buf.shape[0] // PAGE
    y = jnp.zeros((T, R_rows, LANE), x_buf.dtype)
    for t in range(T):
        base = (t * map_cols) // (T * PAGE)
        pages = np.clip(np.arange(plan["npage"]) + base, 0, total_pages - 1)
        win = x_buf.reshape(total_pages, PAGE)[pages].reshape(-1)
        y = y.at[t].add(jnp.sum(plan["vals"][t] * win[plan["pidx"][t]],
                                axis=0))
    return y.reshape(-1)


def banded_spmv_rect_pallas(plan: dict, x, interpret: bool = False):
    """y = A @ x for a rectangular banded plan; x has length plan['n_cols']."""
    return _banded_call_rect(plan["vals"], plan["pidx"], x,
                             K=plan["K"], n=plan["n"],
                             n_cols=plan["n_cols"], tile=plan["tile"],
                             WpP=plan["WpP"], npage=plan["npage"],
                             interpret=interpret,
                             ranges=plan.get("ranges"))


def banded_spmv_rect_ref(plan: dict, x):
    """Plain-jnp reference of the rectangular plan (any backend)."""
    n, tile = plan["n"], plan["tile"]
    T = n // tile
    R_rows = tile // LANE
    total_pages = plan["n_cols"] // PAGE
    y = jnp.zeros((T, R_rows, LANE), x.dtype)
    for t in range(T):
        base = (t * plan["n_cols"]) // (T * PAGE) - plan["WpP"]
        pages = np.clip(np.arange(plan["npage"]) + base, 0, total_pages - 1)
        win = x.reshape(total_pages, PAGE)[pages].reshape(-1)
        y = y.at[t].add(jnp.sum(plan["vals"][t] * win[plan["pidx"][t]],
                                axis=0))
    return y.reshape(-1)
