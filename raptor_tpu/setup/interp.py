"""Interpolation operators, jit-traceable (SURVEY.md §2b C12).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``interpolation.cpp`` (direct + modified
classical interpolation; BASELINE.json:5 "interpolation").

Direct interpolation with ±-splitting (matches the oracle,
tests/oracle/amg_oracle.py::direct_interpolation): for F point i with strong
C neighbors C_i,

    alpha = sum_{k in N_i} a_ik^-  /  sum_{j in C_i} a_ij^-
    beta  = sum_{k in N_i} a_ik^+  /  sum_{j in C_i} a_ij^+
    w_ij  = -(alpha * a_ij^-  +  beta * a_ij^+) / a~_ii

with positive couplings absorbed into the diagonal when C_i has none.
Entirely per-row vector work in the entry-major layout; output width is A's
slot count (strong C neighbors are a subset of the row).

The jitted kernel cannot know the coarse count n_c (data-dependent), so the
returned P uses the fine padded size as its column-space upper bound; the
host hierarchy loop reads n_c once per level and re-tightens the metadata
(SURVEY.md §7 hard part 1: static shapes via a host-driven level loop).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix, pad_rows
from raptor_tpu.setup.splitting import C_PT

__all__ = ["direct_interpolation", "direct_interpolation_core",
           "classical_interpolation", "classical_interpolation_core",
           "extended_interpolation", "extended_interpolation_core",
           "tighten_coarse_space", "add_identity_padding"]


def direct_interpolation_core(
    A: EllMatrix,
    smask: jax.Array,
    is_c_row: jax.Array,
    is_c_col: jax.Array,
    cmap_row: jax.Array,
    cmap_col: jax.Array,
) -> EllMatrix:
    """Direct-interpolation body with caller-supplied C/coarse-index views.

    ``is_c_row``/``cmap_row`` are indexed by A's *row* space (n_rows_pad);
    ``is_c_col``/``cmap_col`` by its *column* space (n_cols_pad).  On a single
    device the two views are the same vector; in the distributed setup
    (parallel.dist_setup) the column views are halo-extended and ``cmap``
    holds global block-padded coarse indices.  Entirely per-row vector work —
    no communication happens in here.
    """
    K, n = A.data.shape
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    a = A.data
    diag = A.diagonal()

    strong_c = smask & jnp.take(is_c_col, A.cols)
    neg = off & (a < 0)
    pos = off & (a > 0)
    num_neg = jnp.sum(jnp.where(neg, a, 0), axis=0)
    num_pos = jnp.sum(jnp.where(pos, a, 0), axis=0)
    den_neg = jnp.sum(jnp.where(strong_c & (a < 0), a, 0), axis=0)
    den_pos = jnp.sum(jnp.where(strong_c & (a > 0), a, 0), axis=0)
    alpha = jnp.where(den_neg != 0, num_neg / jnp.where(den_neg != 0, den_neg, 1), 0)
    beta = jnp.where(den_pos != 0, num_pos / jnp.where(den_pos != 0, den_pos, 1), 0)
    dii = diag + jnp.where(den_pos == 0, num_pos, 0)

    coef = jnp.where(a < 0, alpha[None, :], beta[None, :])
    w = -(coef * a) / dii[None, :]
    pvals = jnp.where(strong_c, w, 0)
    pcols = jnp.take(cmap_col, A.cols)

    # compact strong-C slots to the front of each row
    slotpos = jnp.cumsum(strong_c.astype(jnp.int32), axis=0) - 1
    posk = jnp.where(strong_c, slotpos, K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, n), 1)
    P_data = jnp.zeros((K, n), A.dtype).at[posk, lane].add(pvals, mode="drop")
    P_cols = jnp.zeros((K, n), jnp.int32).at[posk, lane].max(pcols, mode="drop")
    p_nnz = jnp.sum(strong_c, axis=0).astype(jnp.int32)

    # C rows: identity
    k0 = jax.lax.broadcasted_iota(jnp.int32, (K, n), 0) == 0
    own = jnp.where(k0, cmap_row[None, :], 0)
    P_data = jnp.where(is_c_row[None, :], jnp.where(k0, 1.0, 0.0).astype(A.dtype),
                       P_data)
    P_cols = jnp.where(is_c_row[None, :], own, P_cols)
    p_nnz = jnp.where(is_c_row, 1, p_nnz)

    return EllMatrix(
        data=P_data,
        cols=P_cols,
        row_nnz=p_nnz,
        shape=(A.shape[0], A.n_rows_pad),  # logical n_cols fixed by host
        n_rows_pad=A.n_rows_pad,
        n_cols_pad=A.n_rows_pad,  # upper bound; tightened on host
    )


@jax.jit
def direct_interpolation(
    A: EllMatrix, smask: jax.Array, cf: jax.Array
) -> tuple[EllMatrix, jax.Array]:
    """Build P from the C/F splitting. Returns (P, n_coarse).

    P's rows: identity for C points, direct-interpolation weights on strong C
    neighbors for F points, empty for isolated F points.  P.n_cols_pad is the
    fine padded size (upper bound) — see ``tighten_coarse_space``.
    """
    is_c = cf == C_PT
    cmap = (jnp.cumsum(is_c.astype(jnp.int32)) - 1).astype(jnp.int32)
    P = direct_interpolation_core(A, smask, is_c, is_c, cmap, cmap)
    nc = jnp.sum(is_c.astype(jnp.int32))
    return P, nc


def _assemble_p_views(A: EllMatrix, strong_c, pvals, is_c_row, cmap_row,
                      cmap_col):
    """Compact slot-aligned P values into an ELL (shared by direct and
    classical interpolation).  ``cmap_col`` is indexed by A's column space,
    ``is_c_row``/``cmap_row`` by its row space (identical on one device;
    halo-extended column views in the distributed setup)."""
    K, n = A.data.shape
    slotpos = jnp.cumsum(strong_c.astype(jnp.int32), axis=0) - 1
    posk = jnp.where(strong_c, slotpos, K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, n), 1)
    pcols = jnp.take(cmap_col, A.cols)
    P_data = jnp.zeros((K, n), A.dtype).at[posk, lane].add(pvals, mode="drop")
    P_cols = jnp.zeros((K, n), jnp.int32).at[posk, lane].max(pcols, mode="drop")
    p_nnz = jnp.sum(strong_c, axis=0).astype(jnp.int32)

    k0 = jax.lax.broadcasted_iota(jnp.int32, (K, n), 0) == 0
    own = jnp.where(k0, cmap_row[None, :], 0)
    P_data = jnp.where(is_c_row[None, :],
                       jnp.where(k0, 1.0, 0.0).astype(A.dtype), P_data)
    P_cols = jnp.where(is_c_row[None, :], own, P_cols)
    p_nnz = jnp.where(is_c_row, 1, p_nnz)
    return EllMatrix(
        data=P_data, cols=P_cols, row_nnz=p_nnz,
        shape=(A.shape[0], A.n_rows_pad),
        n_rows_pad=A.n_rows_pad, n_cols_pad=A.n_rows_pad,
    )


def classical_interpolation_core(
    A: EllMatrix,
    ext_data: jax.Array,
    ext_cols_glob: jax.Array,
    ext_nnz: jax.Array,
    smask: jax.Array,
    is_c_row: jax.Array,
    is_c_col: jax.Array,
    cmap_row: jax.Array,
    cmap_col: jax.Array,
    gcol: jax.Array,
) -> EllMatrix:
    """Modified-classical interpolation body with caller-supplied views.

    The distance-2 pass gathers NEIGHBOR ROWS: ``ext_data``/``ext_cols_glob``
    /``ext_nnz`` hold a row for every index A's columns can reference (on a
    single device: A's own arrays; distributed: the halo-extended rows from
    ``parallel.dist_setup``), with ``ext_cols_glob`` in a GLOBAL column id
    space so ids from different shards compare correctly.  ``gcol`` maps A's
    (extended) column indices to the same global space.  No communication
    happens in here — same contract as ``direct_interpolation_core``.
    """
    K, n = A.data.shape
    K2 = ext_data.shape[0]
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    a = A.data

    strong_c = smask & jnp.take(is_c_col, A.cols)
    strong_f = smask & ~jnp.take(is_c_col, A.cols) & off
    weak = off & ~smask

    w = jnp.where(strong_c, a, 0.0)  # direct a_ij part, slot-aligned
    dii = A.diagonal() + jnp.sum(jnp.where(weak, a, 0), axis=0)

    # row i's strong-C GLOBAL column set (sentinel -1 elsewhere)
    sC_cols = jnp.where(strong_c, jnp.take(gcol, A.cols), -1)

    for k1 in range(K):
        kk = A.cols[k1]  # (n,) neighbor ids (extended space)
        a_ik = a[k1]
        active = strong_f[k1]
        rowk_cols = jnp.take(ext_cols_glob, kk, axis=1)  # (K2, n) global ids
        rowk_vals = jnp.take(ext_data, kk, axis=1)
        rowk_nnz = jnp.take(ext_nnz, kk)
        k2 = jax.lax.broadcasted_iota(jnp.int32, (K2, n), 0)
        rowk_mask = k2 < rowk_nnz[None, :]
        eq = rowk_cols[:, None, :] == sC_cols[None, :, :]  # (K2, KC, n)
        memb = jnp.any(eq, axis=1) & rowk_mask  # (K2, n)
        den = jnp.sum(jnp.where(memb, rowk_vals, 0), axis=0)  # (n,)
        has = jnp.any(memb, axis=0) & (den != 0)
        coef = jnp.where(active & has,
                         a_ik / jnp.where(den != 0, den, 1), 0.0)
        # per strong-C slot kc: sum of a_kj that landed there
        add = jnp.sum(
            jnp.where(eq & rowk_mask[:, None, :], rowk_vals[:, None, :], 0),
            axis=0,
        )  # (KC, n)
        w = w + coef[None, :] * add
        dii = dii + jnp.where(active & ~has, a_ik, 0)

    pvals = jnp.where(strong_c, -w / dii[None, :], 0)
    return _assemble_p_views(A, strong_c, pvals, is_c_row, cmap_row, cmap_col)


@jax.jit
def classical_interpolation(
    A: EllMatrix, smask: jax.Array, cf: jax.Array
) -> tuple[EllMatrix, jax.Array]:
    """Modified classical (Ruge-Stüben) interpolation, jit-traceable.

    Strong F-F couplings are distributed through the common strong-C set
    (matches the oracle, tests/oracle/amg_oracle.py::classical_interpolation):

      w_ij = -( a_ij + Σ_{k∈Fs_i} a_ik a_kj / Σ_{m∈Cs_i} a_km ) / ã_ii

    with weak couplings (and F-F pairs lacking a common C) collapsed into
    the diagonal.  The distance-2 pass loops over the (static) K slots and
    gathers neighbor rows spgemm-style — peak memory K^2 * n per step
    (SURVEY.md §3b stack 2; setup-only)."""
    is_c = cf == C_PT
    cmap = (jnp.cumsum(is_c.astype(jnp.int32)) - 1).astype(jnp.int32)
    gcol = jnp.arange(A.n_rows_pad, dtype=jnp.int32)
    P = classical_interpolation_core(
        A, A.data, A.cols, A.row_nnz, smask, is_c, is_c, cmap, cmap, gcol)
    return P, jnp.sum(is_c.astype(jnp.int32))


def extended_interpolation_core(
    A: EllMatrix,
    ext_data: jax.Array,
    ext_cols_glob: jax.Array,
    ext_nnz: jax.Array,
    ext_strongc: jax.Array,
    ext_ccols: jax.Array,
    smask: jax.Array,
    is_c_row: jax.Array,
    is_c_col: jax.Array,
    cmap_row: jax.Array,
    cmap_col: jax.Array,
    gcol: jax.Array,
    gid_row: jax.Array,
    p_max: int = 4,
    dii_init: jax.Array | None = None,
) -> EllMatrix:
    """Extended+i (distance-two) interpolation body, jit-traceable.

    The formula (De Sterck, Falgout, Nolting & Yang 2008; hypre's ext+i —
    the standard PMIS companion, see setup/host_setup.py::
    np_distance_two_interpolation for why plain classical diverges off
    PMIS):

        T_i   = C_i ∪ (∪_{k∈F^s_i} C_k)          (distance-two coarse set)
        w_ij  = -( a_ij + Σ_k a_ik a_kj / D_ik ) / â_ii,   j ∈ T_i
        D_ik  = Σ_{l ∈ T_i ∪ {i}} a_kl
        â_ii  = a_ii + Σ_{weak l ∉ T_i} a_il + Σ_k a_ik a_ki / D_ik
                + Σ_{k: D_ik=0} a_ik

    Same view contract as ``classical_interpolation_core`` (ext rows /
    global column ids for the distributed seam) plus ``ext_strongc``
    ((K2, n_ext) strong-C mask of the ext rows' slots), ``ext_ccols``
    ((K2, n_ext) global COARSE id of each ext-row entry's column, -1 for
    F/invalid — targets are distance-2, so their coarse ids are shipped
    per-entry with the rows instead of gathered from a global cmap; the
    (gid, cid) pairs ride together through the dedup), and ``gid_row``
    ((n,) global id of each local row, for the +i membership test).

    The target set lives in KT = K*(K2+1) static slots (min-extract dedup of
    the candidate union) — affordable for fine-level widths; the hierarchy
    loop falls back to direct interpolation on device levels wider than
    ``EXT_DEVICE_MAX_K`` (the host-NumPy tail applies full ext+i to every
    level below ``host_setup_threshold``).  ``p_max`` > 0 truncates each row
    to its largest-|w| entries with ±-separate rescaling (hypre
    P_max_elmts), capping the Galerkin fill.
    """
    K, n = A.data.shape
    K2 = ext_data.shape[0]
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    a = A.data
    dt = A.dtype

    strong_c = smask & jnp.take(is_c_col, A.cols)
    strong_f = smask & ~jnp.take(is_c_col, A.cols) & off

    BIG = jnp.int32(2**30)
    gcols_own = jnp.take(gcol, A.cols)  # (K, n) global ids of own entries

    # ---- candidate union of distance-1 and distance-2 strong-C ids ----
    # each candidate is a (global id, global coarse id) pair; the pairs
    # ride together through the dedup so no global cmap gather is needed
    # (distance-2 targets can live outside the local+halo index space in
    # the distributed setup)
    cand = [jnp.where(strong_c, gcols_own, BIG)]
    candc = [jnp.where(strong_c, jnp.take(cmap_col, A.cols), -1)]
    for k1 in range(K):
        kk = A.cols[k1]
        rowk_cols = jnp.take(ext_cols_glob, kk, axis=1)  # (K2, n)
        rowk_sc = jnp.take(ext_strongc, kk, axis=1)
        rowk_cc = jnp.take(ext_ccols, kk, axis=1)
        keep_k = strong_f[k1][None, :] & rowk_sc
        cand.append(jnp.where(keep_k, rowk_cols, BIG))
        candc.append(jnp.where(keep_k, rowk_cc, -1))
    cand = jnp.concatenate(cand, axis=0)  # (K*(K2+1), n)
    candc = jnp.concatenate(candc, axis=0)

    KT = cand.shape[0]
    # sorted-unique compaction: KT rounds of min extraction (duplicates
    # collapse because every equal candidate is masked at once)
    t_rows = []
    t_cids = []
    cur = cand
    for _ in range(KT):
        m = jnp.min(cur, axis=0)
        t_cids.append(jnp.max(
            jnp.where(cand == m[None, :], candc, -1), axis=0))
        t_rows.append(m)
        cur = jnp.where(cur == m[None, :], BIG, cur)
    T_mat = jnp.stack(t_rows)  # (KT, n) ascending global C ids, BIG = empty
    T_cid = jnp.stack(t_cids)  # (KT, n) matching global coarse ids
    t_mask = T_mat < BIG

    # ---- numerators / denominators ----
    w = jnp.zeros((KT, n), dt)
    # dii_init: a pre-folded modified diagonal (strength_compact lumps every
    # dropped weak/overflow entry there); default = the plain diagonal
    dii = A.diagonal() if dii_init is None else dii_init
    for k1 in range(K):
        # direct a_ij part for ANY own entry whose col is in T_i (weak C
        # neighbors in T included, per the formula); entries outside T that
        # are not strong-F collapse into the diagonal
        eq_own = (gcols_own[k1][None, :] == T_mat) & t_mask
        w = w + jnp.where(eq_own & off[k1][None, :], a[k1][None, :], 0)
        in_t = jnp.any(eq_own, axis=0)
        dii = dii + jnp.where(off[k1] & ~strong_f[k1] & ~in_t, a[k1], 0)

    for k1 in range(K):
        kk = A.cols[k1]
        act = strong_f[k1]
        rowk_cols = jnp.take(ext_cols_glob, kk, axis=1)  # (K2, n)
        rowk_vals = jnp.take(ext_data, kk, axis=1)
        rowk_nnz = jnp.take(ext_nnz, kk)
        u = jnp.zeros((KT, n), dt)
        den = jnp.zeros(n, dt)
        diag_add = jnp.zeros(n, dt)
        for k2 in range(K2):
            va = (k2 < rowk_nnz)
            rc = rowk_cols[k2]
            rv = jnp.where(va, rowk_vals[k2], 0)
            eq = (rc[None, :] == T_mat) & t_mask
            u = u + jnp.where(eq, rv[None, :], 0)
            hit_i = rc == gid_row
            den = den + jnp.where(jnp.any(eq, axis=0) | hit_i, rv, 0)
            diag_add = diag_add + jnp.where(hit_i, rv, 0)
        ok = den != 0
        coef = jnp.where(act & ok, a[k1] / jnp.where(ok, den, 1), 0)
        w = w + coef[None, :] * u
        dii = dii + coef * diag_add  # the +i cross term a_ik a_ki / D_ik
        dii = dii + jnp.where(act & ~ok, a[k1], 0)  # zero-D fallback

    dii = jnp.where(dii != 0, dii, 1)
    pvals = jnp.where(t_mask, -w / dii[None, :], 0)

    # ---- truncation (hypre P_max_elmts) with ±-separate rescale ----
    if p_max > 0 and KT > p_max:
        absw = jnp.where(t_mask, jnp.abs(pvals), -1.0)
        keep = jnp.zeros((KT, n), bool)
        lanei = jax.lax.broadcasted_iota(jnp.int32, (KT, n), 0)
        cur = absw
        for _ in range(p_max):
            arg = jnp.argmax(cur, axis=0)
            oh = lanei == arg[None, :]
            keep = keep | (oh & (cur > 0))
            cur = jnp.where(oh, -1.0, cur)
        pos = pvals > 0
        neg = t_mask & ~pos
        full_p = jnp.sum(jnp.where(pos, pvals, 0), axis=0)
        full_n = jnp.sum(jnp.where(neg, pvals, 0), axis=0)
        kept_p = jnp.sum(jnp.where(keep & pos, pvals, 0), axis=0)
        kept_n = jnp.sum(jnp.where(keep & ~pos, pvals, 0), axis=0)
        sc_p = jnp.where(kept_p != 0,
                         full_p / jnp.where(kept_p != 0, kept_p, 1), 1)
        sc_n = jnp.where(kept_n != 0,
                         full_n / jnp.where(kept_n != 0, kept_n, 1), 1)
        pvals = jnp.where(
            keep, pvals * jnp.where(pos, sc_p[None, :], sc_n[None, :]), 0)
        Kp = p_max
    else:
        Kp = KT

    sel = pvals != 0
    # compact kept slots to the front (width Kp); T_mat is ascending so the
    # compacted columns stay sorted per row
    slotpos = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1
    posk = jnp.where(sel, slotpos, Kp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (KT, n), 1)
    pcols = T_cid
    P_data = jnp.zeros((Kp, n), dt).at[posk, lane].add(pvals, mode="drop")
    P_cols = jnp.zeros((Kp, n), jnp.int32).at[posk, lane].max(
        jnp.where(sel, pcols, 0), mode="drop")
    p_nnz = jnp.sum(sel, axis=0).astype(jnp.int32)

    k0 = jax.lax.broadcasted_iota(jnp.int32, (Kp, n), 0) == 0
    own = jnp.where(k0, cmap_row[None, :], 0)
    P_data = jnp.where(is_c_row[None, :],
                       jnp.where(k0, 1.0, 0.0).astype(dt), P_data)
    P_cols = jnp.where(is_c_row[None, :], own, P_cols)
    p_nnz = jnp.where(is_c_row, 1, p_nnz)
    return EllMatrix(
        data=P_data, cols=P_cols, row_nnz=p_nnz,
        shape=(A.shape[0], A.n_rows_pad),
        n_rows_pad=A.n_rows_pad, n_cols_pad=A.n_rows_pad,
    )


# device levels wider than this run ext+i on the strength-compacted
# operator (extended_interpolation_strong) instead of the full one — the
# KT = K*(K2+1) slot bound of the jitted ext+i core grows quadratically in
# the operator width; every level below config.host_setup_threshold gets
# full ext+i via the host-NumPy path regardless
EXT_DEVICE_MAX_K = 16

# static strong width of the compacted fat-level ext+i: KT = 12*13 = 156
# target slots — (KT, n) temporaries stay a few hundred MB at the ~0.5M-row
# coarse levels where the fat path fires (128^3 L1)
EXT_STRONG_MAX_K = 12


def strength_compact(A: EllMatrix, smask: jax.Array, k_out: int):
    """Top-|a| strength compaction (the operator view of modularized ext+i,
    cf. hypre's MM-ext+i): S keeps each row's ``k_out`` largest-|a_ij|
    STRONG off-diagonal entries, front-packed at static width k_out; every
    dropped off-diagonal entry (weak, or strong overflow past k_out) is
    lumped into the returned modified diagonal
    ``dii0 = a_ii + sum(dropped a_il)``.  Running the ext+i core on
    (S, dii0) bounds its quadratic slot cost by k_out instead of A.K, which
    is what lets fat device levels (A.K > EXT_DEVICE_MAX_K) keep distance-2
    interpolation instead of degrading to direct (VERDICT r4 next #5: the
    direct fallback cost the 128^3 algebraic row 17-vs-7 PCG iterations)."""
    K, n = A.data.shape
    row = A.row_index()
    off = (A.cols != row) & A.slot_mask()
    strong = smask & off
    a = A.data
    kw = min(k_out, K)
    absa = jnp.where(strong, jnp.abs(a), -1.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, n), 0)
    keep = jnp.zeros((K, n), bool)
    cur = absa
    for _ in range(kw):
        arg = jnp.argmax(cur, axis=0)
        oh = lane == arg[None, :]
        keep = keep | (oh & (cur > 0))
        cur = jnp.where(oh, -1.0, cur)
    slotpos = jnp.cumsum(keep.astype(jnp.int32), axis=0) - 1
    posk = jnp.where(keep, slotpos, kw)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (K, n), 1)
    S_data = jnp.zeros((kw, n), A.dtype).at[posk, lane2].add(
        jnp.where(keep, a, 0), mode="drop")
    S_cols = jnp.zeros((kw, n), jnp.int32).at[posk, lane2].max(
        jnp.where(keep, A.cols, 0), mode="drop")
    s_nnz = jnp.sum(keep, axis=0).astype(jnp.int32)
    # empty slots point at the row itself (value 0), the EllMatrix invariant
    ks = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 0)
    srow = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (kw, n))
    S_cols = jnp.where(ks < s_nnz[None, :], S_cols, srow)
    dii0 = A.diagonal() + jnp.sum(jnp.where(off & ~keep, a, 0), axis=0)
    S = EllMatrix(data=S_data, cols=S_cols, row_nnz=s_nnz, shape=A.shape,
                  n_rows_pad=A.n_rows_pad, n_cols_pad=A.n_cols_pad)
    return S, dii0


def ext_mm_core(
    S: EllMatrix,
    ext_data: jax.Array,
    ext_cols_glob: jax.Array,
    ext_nnz: jax.Array,
    ext_ccols: jax.Array,
    ext_rowsum_c: jax.Array,
    is_c_row: jax.Array,
    is_c_col: jax.Array,
    cmap_row: jax.Array,
    cmap_col: jax.Array,
    gid_row: jax.Array,
    dii0: jax.Array,
    p_max: int = 4,
) -> EllMatrix:
    """MM-formulation ext+i on a strength-compacted operator — the
    production device path (the formula-exact reference core is
    ``extended_interpolation_core``; host oracle:
    host_setup.np_distance_two_interpolation).

    On the compacted operator S (only strong entries; dropped weak/overflow
    entries pre-folded into ``dii0``) the ext+i denominator collapses to a
    per-row quantity:  every strong-C entry of a strong-F neighbor k lies in
    the target set T_i *by construction*, so

        D_ik = ext_rowsum_c[k] + s_ki
        w_ij = -( s_ij + sum_k s_ik s_kj / D_ik ) / d_ii
        d_ii = dii0 + sum_k s_ik s_ki / D_ik + sum_{k: D_ik=0} s_ik

    with no (targets x n) membership matching anywhere: the contribution
    list (distance-1 strong-C entries + per-k scaled strong-C rows) keys on
    GLOBAL COARSE ids, one ``lax.sort`` + run-merge sums duplicates, and
    hypre-style p_max truncation finishes the row.  The HLO is ~K^2 small
    ops + one sort instead of the reference core's O(K^2) passes over
    (K*(K+1), n) target buffers — the difference between a ~600 s and a
    ~30 s remote-TPU compile of the fused setup program at 128^3 L0
    (VERDICT r4 next #4), and the same construction the distributed setup
    shards (rowsum_c is a per-row scalar that rides the existing halo).

    View contract (mirrors ``extended_interpolation_core``): ``ext_*`` are
    the (K2, n_ext) row views addressable by ``S.cols`` (single device: S's
    own arrays), ``ext_cols_glob`` global column ids, ``ext_ccols`` the
    global coarse id of each ext entry (-1 for F), ``ext_rowsum_c`` the
    per-ext-row sum of strong-C values, ``is_c_col``/``cmap_col`` over the
    column index space, ``gid_row`` the global id of each local row."""
    from raptor_tpu.ops.sparse_ops import _merge_sorted_rows

    K2, n = S.data.shape
    dt = S.dtype
    off = S.slot_mask()
    BIGC = jnp.int32(2**30)
    isc_own = jnp.take(is_c_col, S.cols)
    strong_c = off & isc_own
    strong_f = off & ~isc_own

    cands = [jnp.where(strong_c, jnp.take(cmap_col, S.cols), BIGC)]
    cvals = [jnp.where(strong_c, S.data, 0)]
    dii = dii0
    for k1 in range(K2):
        kk = S.cols[k1]
        rc = jnp.take(ext_cols_glob, kk, axis=1)  # (K2, n)
        rv = jnp.take(ext_data, kk, axis=1)
        rcc = jnp.take(ext_ccols, kk, axis=1)
        kb = jax.lax.broadcasted_iota(jnp.int32, (K2, n), 0)
        vrow = kb < jnp.take(ext_nnz, kk)[None, :]
        act = strong_f[k1]
        hit = vrow & (rc == gid_row[None, :])
        ski = jnp.sum(jnp.where(hit, rv, 0), axis=0)
        D = jnp.take(ext_rowsum_c, kk) + ski
        ok = D != 0
        coef = jnp.where(act & ok, S.data[k1] / jnp.where(ok, D, 1), 0)
        dii = dii + coef * ski  # the +i cross term s_ik s_ki / D_ik
        dii = dii + jnp.where(act & ~ok, S.data[k1], 0)  # zero-D fallback
        keep = act[None, :] & vrow & (rcc >= 0)
        cands.append(jnp.where(keep, rcc, BIGC))
        cvals.append(jnp.where(keep, coef[None, :] * rv, 0))
    cand = jnp.concatenate(cands, axis=0)  # (K2*(K2+1), n) coarse ids
    cval = jnp.concatenate(cvals, axis=0)
    KV = cand.shape[0]
    cand, cval = jax.lax.sort((cand, cval), dimension=0, num_keys=1)
    oc, ov, p_nnz = _merge_sorted_rows(cand, cval, BIGC, KV)

    dii = jnp.where(dii != 0, dii, 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (KV, n), 0)
    t_mask = lane_k < p_nnz[None, :]
    pvals = jnp.where(t_mask, -ov / dii[None, :], 0)

    # hypre P_max_elmts truncation with +/- -separate rescale (identical to
    # the reference core's)
    if p_max > 0 and KV > p_max:
        absw = jnp.where(t_mask, jnp.abs(pvals), -1.0)
        keep = jnp.zeros((KV, n), bool)
        cur = absw
        for _ in range(p_max):
            arg = jnp.argmax(cur, axis=0)
            oh = lane_k == arg[None, :]
            keep = keep | (oh & (cur > 0))
            cur = jnp.where(oh, -1.0, cur)
        pos = pvals > 0
        full_p = jnp.sum(jnp.where(pos, pvals, 0), axis=0)
        full_n = jnp.sum(jnp.where(t_mask & ~pos, pvals, 0), axis=0)
        kept_p = jnp.sum(jnp.where(keep & pos, pvals, 0), axis=0)
        kept_n = jnp.sum(jnp.where(keep & ~pos, pvals, 0), axis=0)
        sc_p = jnp.where(kept_p != 0,
                         full_p / jnp.where(kept_p != 0, kept_p, 1), 1)
        sc_n = jnp.where(kept_n != 0,
                         full_n / jnp.where(kept_n != 0, kept_n, 1), 1)
        pvals = jnp.where(
            keep, pvals * jnp.where(pos, sc_p[None, :], sc_n[None, :]), 0)
        Kp = p_max
    else:
        Kp = KV

    sel = pvals != 0
    slotpos = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1
    posk = jnp.where(sel, slotpos, Kp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (KV, n), 1)
    P_data = jnp.zeros((Kp, n), dt).at[posk, lane].add(pvals, mode="drop")
    P_cols = jnp.zeros((Kp, n), jnp.int32).at[posk, lane].max(
        jnp.where(sel, oc, 0), mode="drop")
    p_nnz = jnp.sum(sel, axis=0).astype(jnp.int32)

    k0 = jax.lax.broadcasted_iota(jnp.int32, (Kp, n), 0) == 0
    own = jnp.where(k0, cmap_row[None, :], 0)
    P_data = jnp.where(is_c_row[None, :],
                       jnp.where(k0, 1.0, 0.0).astype(dt), P_data)
    P_cols = jnp.where(is_c_row[None, :], own, P_cols)
    p_nnz = jnp.where(is_c_row, 1, p_nnz)
    return EllMatrix(
        data=P_data, cols=P_cols, row_nnz=p_nnz,
        shape=(S.shape[0], S.n_rows_pad),
        n_rows_pad=S.n_rows_pad, n_cols_pad=S.n_rows_pad,
    )


@partial(jax.jit, static_argnames=("p_max", "k_s"))
def extended_interpolation_strong(
    A: EllMatrix, smask: jax.Array, cf: jax.Array, p_max: int = 4,
    k_s: int = EXT_STRONG_MAX_K,
) -> tuple[EllMatrix, jax.Array]:
    """Ext+i on the strength-compacted operator (``strength_compact`` +
    ``ext_mm_core``): the production device interpolation.  When no entry
    is dropped (all off-diags strong and A.K <= k_s) this equals
    ``extended_interpolation`` up to fp reassociation."""
    is_c = cf == C_PT
    cmap = (jnp.cumsum(is_c.astype(jnp.int32)) - 1).astype(jnp.int32)
    S, dii0 = strength_compact(A, smask, k_s)
    smask_S = (S.cols != S.row_index()) & S.slot_mask()
    sc = smask_S & jnp.take(is_c, S.cols)
    ccols = jnp.where(sc, jnp.take(cmap, S.cols), -1)
    rowsum_c = jnp.sum(jnp.where(sc, S.data, 0), axis=0)
    gcol = jnp.arange(A.n_rows_pad, dtype=jnp.int32)
    P = ext_mm_core(
        S, S.data, S.cols, S.row_nnz, ccols, rowsum_c, is_c, is_c, cmap,
        cmap, gcol, dii0, p_max=p_max)
    return P, jnp.sum(is_c.astype(jnp.int32))


@partial(jax.jit, static_argnames=("p_max",))
def extended_interpolation(
    A: EllMatrix, smask: jax.Array, cf: jax.Array, p_max: int = 4
) -> tuple[EllMatrix, jax.Array]:
    """Single-device extended+i interpolation (see
    ``extended_interpolation_core``).  Returns (P, n_coarse)."""
    is_c = cf == C_PT
    cmap = (jnp.cumsum(is_c.astype(jnp.int32)) - 1).astype(jnp.int32)
    gcol = jnp.arange(A.n_rows_pad, dtype=jnp.int32)
    sc = smask & jnp.take(is_c, A.cols)
    ccols = jnp.where(jnp.take(is_c, A.cols), jnp.take(cmap, A.cols), -1)
    P = extended_interpolation_core(
        A, A.data, A.cols, A.row_nnz, sc, ccols, smask, is_c, is_c, cmap,
        cmap, gcol, gcol, p_max=p_max)
    return P, jnp.sum(is_c.astype(jnp.int32))


def tighten_coarse_space(P: EllMatrix, nc: int, pad_multiple: int = 8) -> EllMatrix:
    """Host step: shrink P's column space to the measured coarse size
    (metadata only — all stored column indices are already < nc)."""
    return dataclasses.replace(
        P,
        shape=(P.shape[0], nc),
        n_cols_pad=pad_rows(nc, pad_multiple),
    )


def add_identity_padding(A: EllMatrix, n: int) -> EllMatrix:
    """Give rows >= n (coarse padding produced by RAP) AND dead rows (zero
    diagonal — e.g. coarse dofs of rank-deficient aggregates in smoothed
    aggregation) a unit diagonal so the padded operator stays SPD
    (n is static: the host knows the coarse size)."""
    K, npad = A.data.shape
    row = A.row_index()
    k0 = jax.lax.broadcasted_iota(jnp.int32, (K, npad), 0) == 0
    dead = A.diagonal() == 0
    padrow = (row >= n) | dead[None, :]
    data = jnp.where(padrow & k0, 1.0, jnp.where(padrow, 0.0, A.data)).astype(A.dtype)
    cols = jnp.where(padrow & k0, row, jnp.where(padrow, 0, A.cols))
    row_nnz = jnp.where((jnp.arange(npad) >= n) | dead, 1, A.row_nnz).astype(jnp.int32)
    return dataclasses.replace(A, data=data, cols=cols, row_nnz=row_nnz)
