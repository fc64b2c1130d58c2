"""Smoothed-aggregation AMG setup (SURVEY.md §2b C13).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``aggregation/par_*`` (mis.cpp,
aggregate.cpp, candidates.cpp, prolongation.cpp); BASELINE.json:5
"smoothed-aggregation setup phases run end-to-end under jit",
BASELINE.json:10 config 4 (3D elasticity, 3x3 blocks, rigid-body-mode
candidates), PAPERS.md:5 (GPU aggregation AMG) and PAPERS.md:8 (distance-2
MIS) for the parallel patterns.

Pipeline (device-side; per-level widths resolved by the host loop):
  1. nodal condensation of the block matrix (|a_ij| summed per b x b block),
  2. SA symmetric strength  |a_ij| >= theta sqrt(a_ii a_jj),
  3. distance-2 MIS roots via the PMIS engine on G^2 (boolean SpGEMM),
  4. two rounds of neighbor assignment to the best-root aggregate,
  5. tentative prolongator: batched QR of the near-nullspace candidates per
     aggregate (zero-padded batch; Q rows on padding come out exactly 0),
  6. prolongator smoothing  P = (I - omega D^{-1} A) P_tent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import EllMatrix, pad_rows
from raptor_tpu.ops.sparse_ops import (
    ell_add,
    ell_transpose,
    spgemm,
    spmv,
)
from raptor_tpu.setup.interp import add_identity_padding
from raptor_tpu.setup.splitting import C_PT, make_perm, pmis_splitting
from raptor_tpu.solve.smoothers import estimate_lmax

__all__ = ["build_sa_hierarchy", "nodal_condense", "sa_strength_mask",
           "aggregate", "tentative_prolongator"]


# ---------------------------------------------------------------------------
# 1. Nodal condensation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bs",))
def _condense_wide(A: EllMatrix, bs: int):
    """Group the bs dof-rows of each node into one row (width bs*K) with
    |value| entries and node column ids; returns sorted (cols, vals)."""
    K, n = A.data.shape
    nn = n // bs
    # entry-major rows are [node0*bs + 0..bs-1, node1*bs + ...]: fold dof axis
    data = jnp.abs(A.data).reshape(K, nn, bs)
    cols = (A.cols // bs).reshape(K, nn, bs)
    mask = A.slot_mask().reshape(K, nn, bs)
    data = jnp.moveaxis(data, 2, 0).reshape(K * bs, nn)
    cols = jnp.moveaxis(cols, 2, 0).reshape(K * bs, nn)
    mask = jnp.moveaxis(mask, 2, 0).reshape(K * bs, nn)
    sent = jnp.int32(nn)
    cols = jnp.where(mask, cols, sent)
    vals = jnp.where(mask, data, 0)
    cols, vals = jax.lax.sort((cols, vals), dimension=0, num_keys=1)
    return cols, vals, sent


def nodal_condense(A: EllMatrix, bs: int) -> EllMatrix:
    """Block matrix -> nodal matrix: C[u,v] = sum |A[bu+i, bv+j]| (host-wrapped
    exact-width merge; the nodal graph drives aggregation)."""
    from raptor_tpu.ops.sparse_ops import _merge_sorted_rows, _fix_padding_cols

    assert A.n_rows_pad % bs == 0
    nn = A.n_rows_pad // bs
    cols, vals, sent = _condense_wide(A, bs)

    @partial(jax.jit, static_argnames=("k_out",))
    def merge(cols, vals, k_out):
        oc, ov, nnz = _merge_sorted_rows(cols, vals, sent, k_out)
        return _fix_padding_cols(oc, nnz, nn), ov, nnz

    first = jnp.concatenate(
        [jnp.ones((1, cols.shape[1]), bool), cols[1:] != cols[:-1]], axis=0
    )
    width = int(jnp.max(jnp.sum(first & (cols < sent), axis=0)))
    oc, ov, nnz = merge(cols, vals, max(width, 1))
    return EllMatrix(
        data=ov, cols=oc, row_nnz=nnz,
        shape=(A.shape[0] // bs if A.shape[0] % bs == 0 else nn, nn),
        n_rows_pad=nn, n_cols_pad=nn,
    )


# ---------------------------------------------------------------------------
# 2. SA strength
# ---------------------------------------------------------------------------

@jax.jit
def sa_strength_mask(C: EllMatrix, theta: float) -> jax.Array:
    """|c_ij| >= theta * sqrt(c_ii * c_jj), off-diagonal (symmetric SA test)."""
    diag = C.diagonal()
    off = (C.cols != C.row_index()) & C.slot_mask()
    dj = jnp.take(diag, C.cols)
    thresh = theta * jnp.sqrt(jnp.abs(diag)[None, :] * jnp.abs(dj))
    return off & (jnp.abs(C.data) >= thresh) & (jnp.abs(C.data) > 0)


# ---------------------------------------------------------------------------
# 3+4. Aggregation: distance-2 MIS roots + assignment rounds
# ---------------------------------------------------------------------------

def _strength_ell(C: EllMatrix, smask, with_diag: bool) -> EllMatrix:
    """Boolean strength pattern as an EllMatrix (1.0 entries), compacted."""
    from raptor_tpu.ops.sparse_ops import _merge_sorted_rows, _fix_padding_cols

    K, n = C.data.shape
    keep = smask | (with_diag & (C.cols == C.row_index()) & C.slot_mask())
    sent = jnp.int32(C.n_cols_pad)
    cols = jnp.where(keep, C.cols, sent)
    vals = jnp.where(keep, 1.0, 0.0).astype(C.dtype)
    cols, vals = jax.lax.sort((cols, vals), dimension=0, num_keys=1)
    oc, ov, nnz = _merge_sorted_rows(cols, vals, sent, K)
    return EllMatrix(
        data=jnp.minimum(ov, 1.0), cols=_fix_padding_cols(oc, nnz, n),
        row_nnz=nnz, shape=C.shape, n_rows_pad=C.n_rows_pad,
        n_cols_pad=C.n_cols_pad,
    )


# joins that would push an aggregate past this size are refused (capping is
# per-round approximate: same-round joiners can overshoot slightly).  Large
# aggregates degrade SA interpolation quality and blow up the tentative-QR
# batch width at scale (VERDICT r2 next #9); a 3D distance-2 aggregate is
# ~27 nodes, so 64 only clips pathological accretion.
AGG_SIZE_CAP = 64


def _agg_sizes(agg):
    """(nn+1,) current aggregate sizes (ids are < nn; -1 -> slot nn)."""
    nn = agg.shape[0]
    tgt = jnp.where(agg >= 0, agg, nn)
    return jnp.zeros(nn + 1, jnp.int32).at[tgt].add(1, mode="drop")


@jax.jit
def _assign_rounds(G: EllMatrix, smask_g, agg, w):
    """Two rounds: unaggregated nodes join the strong neighbor's aggregate
    with the largest weight (ties by aggregate id), skipping aggregates at
    the size cap."""
    nn = agg.shape[0]

    def one_round(agg):
        sizes = _agg_sizes(agg)
        nbr_agg = jnp.take(agg, G.cols)
        room = jnp.take(sizes, jnp.clip(nbr_agg, 0, nn)) < AGG_SIZE_CAP
        cand = smask_g & (nbr_agg >= 0) & room
        wn = jnp.where(cand, jnp.take(w, G.cols), -1)
        m = jnp.max(wn, axis=0)
        pick = jnp.max(jnp.where(cand & (wn == m[None, :]), nbr_agg, -1), axis=0)
        return jnp.where((agg < 0) & (m >= 0), pick, agg)

    agg = one_round(agg)
    agg = one_round(agg)
    return agg


@jax.jit
def _join_smallest(C: EllMatrix, agg):
    """Straggler pass (VERDICT r2 next #9): nodes still unaggregated after
    the strong-edge rounds join the SMALLEST adjacent aggregate over the
    full nodal pattern (weak edges included) — a slightly weak member beats
    a rank-deficient singleton against nc candidates."""
    nn = agg.shape[0]
    off = (C.cols != C.row_index()) & C.slot_mask()
    sizes = _agg_sizes(agg)
    nbr_agg = jnp.take(agg, C.cols)
    cand = off & (nbr_agg >= 0)
    # prefer small: weight = -size (ties -> larger aggregate id)
    wn = jnp.where(cand, -jnp.take(sizes, jnp.clip(nbr_agg, 0, nn)),
                   -jnp.int32(2**30))
    m = jnp.max(wn, axis=0)
    pick = jnp.max(jnp.where(cand & (wn == m[None, :]), nbr_agg, -1), axis=0)
    return jnp.where((agg < 0) & (pick >= 0), pick, agg)


def aggregate(C: EllMatrix, smask, seed: int):
    """Node -> aggregate id map via distance-2 MIS roots + assignment.

    Returns (agg (nn,) int32 with -1 for padding/isolated, n_agg int).
    Isolated nodes become singleton aggregates (they must still appear on the
    coarse grid to keep P full rank over real rows).
    """
    nn = C.n_rows_pad
    n = C.shape[0]
    G = _strength_ell(C, smask, with_diag=True)
    G2 = spgemm(G, G)
    g2_off = (G2.cols != G2.row_index()) & G2.slot_mask()
    perm = make_perm(n, nn, seed)
    cf = pmis_splitting(G2, g2_off, perm)

    lane = jnp.arange(nn, dtype=jnp.int32)
    is_real = lane < n
    is_root = (cf == C_PT) & is_real
    # isolated real nodes (no strong neighbors at all): singleton aggregates
    has_strong = jnp.any(smask, axis=0)
    singleton = is_real & ~has_strong & ~is_root
    root_like = is_root | singleton
    agg_id = jnp.cumsum(root_like.astype(jnp.int32)) - 1
    agg = jnp.where(root_like, agg_id, -1)

    w = jnp.minimum(jnp.sum(smask, axis=0), 63) * nn + perm  # assignment pref
    # G's slots are the COMPACTED strength entries — gate on G's own slot
    # mask, not the C-layout smask (slot misalignment dropped strong
    # neighbors into the weak straggler pass; the diag slot self-joins are
    # inert because only agg<0 nodes update and their own agg is -1)
    agg = _assign_rounds(G, G.slot_mask(), agg, w)
    # straggler pass: join the smallest adjacent aggregate (full pattern)
    agg = jnp.where(is_real, _join_smallest(C, agg), agg)

    # truly isolated leftovers: their own aggregates
    strag = is_real & (agg < 0)
    n_so_far = int(jnp.sum(root_like))
    extra = jnp.cumsum(strag.astype(jnp.int32)) - 1
    agg = jnp.where(strag, n_so_far + extra, agg)
    n_agg = n_so_far + int(jnp.sum(strag))
    return agg, n_agg


# ---------------------------------------------------------------------------
# 5. Tentative prolongator (batched QR over aggregates)
# ---------------------------------------------------------------------------

def tentative_prolongator(
    agg: jax.Array, n_agg: int, B: jax.Array, bs: int, n_dof: int,
    pad_multiple: int = 8,
):
    """P_tent (dofs x n_agg*nc ELL) and coarse candidates Bc (n_agg*nc, nc).

    B is (n_dof_pad, nc).  Aggregate a's dof block of P_tent is Q_a from the
    reduced QR of B's rows in that aggregate; Bc rows are R_a.
    """
    nn = agg.shape[0]
    nc = B.shape[1]
    counts = np.asarray(
        jnp.zeros(n_agg + 1, jnp.int32).at[jnp.where(agg >= 0, agg, n_agg)].add(1)
    )
    max_nodes = int(counts[:n_agg].max()) if n_agg else 1

    P_data, P_cols, p_nnz, Bc = _tentative_jit(agg, B, bs, n_agg, max_nodes, nc)
    ncoarse = n_agg * nc
    # coarse padded size must divide by both pad_multiple (sublane/device
    # count) and nc (next level's block size, for nodal condensation)
    mult = pad_multiple * nc // np.gcd(pad_multiple, nc)
    P = EllMatrix(
        data=P_data, cols=P_cols, row_nnz=p_nnz,
        shape=(n_dof, ncoarse),
        n_rows_pad=B.shape[0], n_cols_pad=pad_rows(ncoarse, mult),
    )
    return P, Bc, ncoarse


@partial(jax.jit, static_argnames=("bs", "n_agg", "max_nodes", "nc"))
def _tentative_jit(agg, B, bs: int, n_agg: int, max_nodes: int, nc: int):
    nn = agg.shape[0]
    n_pad = B.shape[0]
    # slot of each node within its aggregate (sort by agg, stable in node id)
    node = jnp.arange(nn, dtype=jnp.int32)
    key = jnp.where(agg >= 0, agg, n_agg)
    skey, snode = jax.lax.sort((key, node), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, node, 0))
    slot = node - run_start
    # node-slot table (n_agg, max_nodes): node ids, -1 padding
    ok = (skey < n_agg) & (slot < max_nodes)
    tbl = (
        jnp.full((n_agg, max_nodes), -1, jnp.int32)
        .at[jnp.where(ok, skey, 0), jnp.where(ok, slot, 0)]
        .max(jnp.where(ok, snode, -1), mode="drop")
    )
    # gather candidate rows: (n_agg, max_nodes*bs, nc), zero rows for padding
    dof_tbl = tbl[:, :, None] * bs + jnp.arange(bs)[None, None, :]
    dof_tbl = jnp.where(tbl[:, :, None] >= 0, dof_tbl, n_pad).reshape(
        n_agg, max_nodes * bs
    )
    rows = jnp.take(
        jnp.concatenate([B, jnp.zeros((1, nc), B.dtype)], axis=0),
        jnp.minimum(dof_tbl, n_pad), axis=0,
    )
    rows = jnp.where((dof_tbl < n_pad)[:, :, None], rows, 0)
    Q, R = jnp.linalg.qr(rows, mode="reduced")  # (n_agg, mn*bs, nc), (n_agg, nc, nc)
    # fix signs: make R diag nonnegative for determinism
    sgn = jnp.where(jnp.diagonal(R, axis1=1, axis2=2) < 0, -1.0, 1.0)
    Q = Q * sgn[:, None, :]
    R = R * sgn[:, :, None]

    # scatter Q back into ELL rows of P_tent: dof d of node (a, s) has row
    # tbl[a,s]*bs+d and nc entries (cols a*nc + j, vals Q[a, s*bs+d, j]).
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (n_agg, max_nodes * bs), 0)
    tgt_dof = jnp.where(dof_tbl < n_pad, dof_tbl, n_pad)  # drop padding
    P_data = (
        jnp.zeros((nc, n_pad + 1), B.dtype)
        .at[:, tgt_dof]
        .add(jnp.moveaxis(Q, 2, 0), mode="drop")[:, :n_pad]
    )
    colbase = (a_idx * nc)
    P_cols = jnp.zeros((nc, n_pad + 1), jnp.int32)
    cvals = colbase[None, :, :] + jnp.arange(nc, dtype=jnp.int32)[:, None, None]
    P_cols = P_cols.at[:, tgt_dof].max(cvals, mode="drop")[:, :n_pad]
    p_nnz = jnp.zeros(n_pad + 1, jnp.int32).at[tgt_dof].add(nc, mode="drop")[:n_pad]
    p_nnz = jnp.minimum(p_nnz, nc)
    Bc = R.reshape(n_agg * nc, nc)
    return P_data, P_cols, p_nnz, Bc


@partial(jax.jit, static_argnames=("bs",))
def _lumped_filter(A: EllMatrix, tol: float, bs: int) -> EllMatrix:
    """Lumped strength filtering of A for prolongator smoothing (filtered
    SA, config.sa_filter): off-node entries failing the symmetric test
    |a_ij| >= tol*sqrt(|a_ii a_jj|) are dropped and LUMPED into the
    diagonal, so A_F preserves A's row action on constants while the
    smoothed P = (I - omega D^{-1} A_F) P_t keeps only meaningful fill.
    Dropped slots point at the row's diagonal with value 0 (the SpGEMM
    merge collapses duplicates), so the product pattern shrinks too."""
    ri = A.row_index()
    valid = A.slot_mask()
    isdiag = (A.cols == ri) & valid
    dabs = jnp.abs(A.diagonal())
    dj = jnp.take(dabs, A.cols)
    thr = tol * jnp.sqrt(dabs[None, :] * dj)
    samenode = (A.cols // bs) == (ri // bs)
    drop = valid & ~samenode & (jnp.abs(A.data) < thr)
    lump = jnp.sum(jnp.where(drop, A.data, 0), axis=0)
    data = jnp.where(drop, 0, A.data) + jnp.where(isdiag, lump[None, :], 0)
    cols = jnp.where(drop, ri, A.cols)
    import dataclasses

    return dataclasses.replace(A, data=data, cols=cols)


# ---------------------------------------------------------------------------
# 6. Hierarchy driver
# ---------------------------------------------------------------------------

def _block_layout(A: EllMatrix, config: AmgConfig, bs: int, lmax_s):
    """(Abell, binv, cheb_lmax) for a level when a block smoother is
    configured (BASELINE.json:5,10): re-lay A as bs x bs BlockELL so the
    solve path's SpMV and smoothing batch on the MXU.  bs == 1 levels keep
    the scalar path (their "blocks" would be scalars)."""
    if config.smoother not in ("block_jacobi", "block_cheb") or bs <= 1:
        return None, None, lmax_s
    if A.n_rows_pad % bs or A.shape[0] % bs:
        return None, None, lmax_s  # padding breaks block alignment here
    from raptor_tpu.core.bell import (
        block_diag_inv,
        ell_to_bell,
        estimate_lmax_bell,
    )

    Abell = ell_to_bell(A, bs)
    binv = block_diag_inv(Abell)
    if config.smoother == "block_cheb":
        lmax_s = estimate_lmax_bell(Abell, binv)
    return Abell, binv, lmax_s


def build_sa_hierarchy(A, config: AmgConfig, dtype=jnp.float32, B=None,
                       block_size: int | None = None):
    """Smoothed-aggregation hierarchy (config 4, BASELINE.json:10).

    ``B``: (n, nc) near-nullspace candidates (rigid body modes for
    elasticity); defaults to the constant vector.  ``config.num_candidates``
    caps how many are used; block size is inferred as 3 when nc >= 3 and the
    size divides by 3 (elasticity convention) else 1 — pass ``block_size``
    to override (e.g. a Galerkin coarse operator whose natural block is nc).
    """
    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.setup.hierarchy import Hierarchy, Level, _dense_inverse, _smoother_data

    if B is None and isinstance(A, tuple) and len(A) in (2, 3):
        # allow gallery tuples (A, B[, coords])
        A, B = A[0], A[1]
    n_in = A.shape[0]
    if (not isinstance(A, EllMatrix)
            and 0 < n_in <= config.host_setup_threshold):
        # small problems are compile-latency-bound on device (per-shape jit
        # programs + ~6 host syncs per level — ~6 min at n=23k through the
        # remote-TPU tunnel); the identical pipeline runs in vectorized
        # NumPy in seconds (the SA counterpart of setup/host_setup.py)
        from raptor_tpu.setup.hierarchy import attach_residual_lo
        from raptor_tpu.setup.host_aggregation import host_build_sa_hierarchy

        return attach_residual_lo(
            host_build_sa_hierarchy(A, config, dtype=dtype, B=B,
                                    block_size=block_size), A)
    if B is None:
        B = np.ones((n_in, 1), dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)[:, : config.num_candidates]
    nc = B.shape[1]
    bs = block_size or (3 if (nc >= 3 and n_in % 3 == 0) else 1)
    A_in = None if isinstance(A, EllMatrix) else A
    if not isinstance(A, EllMatrix):
        # padded size must divide by both pad_multiple and the block size
        mult = config.pad_multiple * bs // np.gcd(config.pad_multiple, bs)
        A = ell_from_csr(A, dtype=dtype, row_pad_multiple=mult)
    assert A.n_rows_pad % bs == 0, (A.n_rows_pad, bs)
    n = A.shape[0]

    Bd = jnp.zeros((A.n_rows_pad, nc), dtype=dtype)
    Bd = Bd.at[:n].set(jnp.asarray(B, dtype=dtype))

    levels = []
    while len(levels) + 1 < config.max_levels and n > config.coarse_size:
        C = nodal_condense(A, bs) if bs > 1 else A
        smask = sa_strength_mask(C, config.theta) if bs > 1 else sa_strength_mask(A, config.theta)
        agg, n_agg = aggregate(C, smask, config.seed + len(levels))
        # stop when coarsening stalls (tiny aggregates also go rank-deficient
        # against nc candidates)
        if n_agg == 0 or n_agg * nc >= 0.7 * n:
            break
        P_t, Bc, ncoarse = tentative_prolongator(agg, n_agg, Bd, bs, n, config.pad_multiple)
        # smooth: P = (I - omega D^{-1} A) P_t
        dA = A.diagonal()
        dinv = 1.0 / jnp.where(dA != 0, dA, 1.0)
        lmax = estimate_lmax(A, dinv)
        omega = config.sa_omega / float(lmax)
        A_sm = (_lumped_filter(A, config.sa_filter, bs)
                if config.sa_filter > 0 else A)
        DA_P = spgemm(A_sm.scale_rows(dinv * omega), P_t)
        P = ell_add(P_t, DA_P, alpha=1.0, beta=-1.0)
        R = ell_transpose(P)
        AP = spgemm(A, P)
        Ac = add_identity_padding(spgemm(R, AP), ncoarse)

        dinv_s, color, ncolors, lmax_s = _smoother_data(A, config, smask)
        Abell, binv, lmax_s = _block_layout(A, config, bs, lmax_s)
        levels.append(
            Level(A=A, dinv=dinv_s, P=P, R=R, color=color, cheb_lmax=lmax_s,
                  n=n, ncolors=ncolors, Abell=Abell, binv=binv)
        )
        # next level: block size nc, candidates Bc
        A, n, bs = Ac, ncoarse, nc
        Bd = jnp.zeros((A.n_rows_pad, nc), dtype=dtype).at[:n].set(
            jnp.asarray(Bc, dtype=dtype)
        )

    dinv_s, color, ncolors, lmax_s = _smoother_data(A, config, None)
    Abell, binv, lmax_s = _block_layout(A, config, bs, lmax_s)
    levels.append(
        Level(A=A, dinv=dinv_s, P=None, R=None, color=color,
              cheb_lmax=lmax_s, n=n, ncolors=ncolors, Abell=Abell,
              binv=binv)
    )
    inv = _dense_inverse(A, n_true=n)
    hier = Hierarchy(levels=tuple(levels), coarse_inv=inv, config=config)
    if A_in is not None:
        from raptor_tpu.setup.hierarchy import attach_residual_lo

        hier = attach_residual_lo(hier, A_in)
    return hier
