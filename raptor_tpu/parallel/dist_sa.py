"""Distributed smoothed-aggregation setup (SURVEY.md §2b C13 + C19).

Capability target (SURVEY.md §0 — the public RAPtor AMG library named by
BASELINE.json:5): RAPtor's parallel aggregation setup
(``aggregation/par_*``) — config 4's pipeline with the setup itself
sharded over the mesh.

Division of labor (the same playbook as the distributed aggressive
coarsening in parallel/dist_setup.py):

* **Aggregation decisions are a host structure pass**: nodal condensation,
  SA strength, distance-2 MIS on G² and the capped assignment rounds run
  in vectorized NumPy over the level's global structure — the identical
  exact-integer-weight algorithms as setup/host_aggregation.py, so the
  aggregates are bit-identical to the single-device SA paths.  (The
  distributed classical setups keep their structure passes host-side the
  same way: halo plans, G² patterns, colorings.)
* **Every numeric phase runs under shard_map**: the batched tentative QR
  (each device factors its owned aggregates, with remote member rows of
  the candidate matrix delivered by a widened halo plan and the resulting
  P rows returned to their owners by the adjoint halo reduce), the
  prolongator smoothing SpGEMM, the Galerkin RAP (reusing
  dist_setup._run_rap/_run_ac with a P-pattern-widened plan — multi-hop
  interpolation reach, exactly like multipass), the distributed lambda_max
  power iterations, and the block-diagonal smoother inverses.

Aggregate ownership: an aggregate lives on the device owning its smallest
member node; coarse dofs use the block-padded global numbering
``device * (max_agg * nc) + rank`` shared with the rest of the distributed
setup.  Coarse levels stay sharded until they drop under ``tail_size``
(the decision pass compacts the block-padded numbering host-side); SA's
strong coarsening (20-50x) usually makes that one or two levels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import EllMatrix, ell_from_csr, pad_rows
from raptor_tpu.ops.sparse_ops import (
    _spgemm_width,
    ell_add_fixed,
    spgemm_fixed,
)
from raptor_tpu.parallel.dist import (
    AXIS,
    DistHierarchy,
    DistLevel,
    _dm_spec,
    _plan_spec,
    make_solve_mesh,
)
from raptor_tpu.parallel.dist_setup import (
    _dist_lmax,
    _exchange_rows,
    _ext2glob,
    _make_dist,
    _run_ac,
    _run_rap,
    _run_widths,
    _shmap,
)
from raptor_tpu.parallel.halo import halo_exchange, halo_exchange_many, halo_reduce
from raptor_tpu.parallel.partition import plan_and_remap, DistMatrix
from raptor_tpu.setup.hierarchy import Hierarchy

__all__ = ["dist_build_sa_hierarchy"]


def _host_aggregate(data_np, cols_np, nnz_np, real_nodal, n_pad, bs, cfg,
                    seed):
    """Host decision pass: nodal condense + SA strength + distance-2 MIS +
    capped assignment (setup/host_aggregation internals — bit-identical
    aggregates).  ``real_nodal`` (nn_pad,) masks the true nodal lanes: on
    coarse levels the block-padded numbering scatters per-device identity
    pads through the lane space, so the decision pass runs on the
    compacted real submatrix and scatters the ids back.  Returns
    ((agg (nn_pad,) int32, n_agg), n_nodal, nn_pad)."""
    import scipy.sparse as sp

    from raptor_tpu.setup.aggregation import AGG_SIZE_CAP
    from raptor_tpu.setup.host_aggregation import _np_aggregate
    from raptor_tpu.setup.host_setup import _ell_np_to_coo

    A_csr = _ell_np_to_coo(data_np, cols_np, nnz_np, n_pad, n_pad).tocsr()
    if bs > 1:
        nn_pad = n_pad // bs
        S = sp.csr_matrix(
            (np.ones(n_pad, data_np.dtype),
             (np.arange(n_pad), np.arange(n_pad) // bs)),
            shape=(n_pad, nn_pad))
        absA = A_csr.copy()
        absA.data = np.abs(absA.data)
        C = (S.T @ absA @ S).tocsr()
    else:
        C, nn_pad = A_csr, n_pad
    r = np.flatnonzero(real_nodal)
    n_nodal = int(r.size)
    C_comp = C[r][:, r].tocsr()
    agg_c, n_agg = _np_aggregate(C_comp, n_nodal, n_nodal, cfg.theta, seed,
                                 AGG_SIZE_CAP)
    agg = np.full(nn_pad, -1, np.int32)
    agg[r] = agg_c
    return (agg, n_agg), n_nodal, nn_pad


def dist_build_sa_hierarchy(
    A,
    config: AmgConfig = AmgConfig(splitting="aggregation", interp="smoothed"),
    B=None,
    ndev: int | None = None,
    mesh: Mesh | None = None,
    tail_size: int = 4096,
    dtype=jnp.float32,
) -> DistHierarchy:
    """Smoothed-aggregation hierarchy with the setup sharded over the mesh
    (module docstring).  ``B``: (n, nc) near-nullspace candidates (rigid
    body modes for elasticity).  Returns a DistHierarchy solvable with
    ``parallel.dist.dist_solve`` unchanged.

    Per-device identity padding of the coarse space becomes singleton
    aggregates in the replicated tail's further coarsening — harmless
    identity dofs, bounded by the block padding."""
    import scipy.sparse as sp

    if mesh is None:
        mesh = make_solve_mesh(ndev)
    ndev = mesh.devices.size

    n_in = A.shape[0]
    if B is None:
        B = np.ones((n_in, 1), np.float64)
    B = np.asarray(B, np.float64)[:, : config.num_candidates]
    nc = B.shape[1]
    bs = 3 if (nc >= 3 and n_in % 3 == 0) else 1
    mult = int(np.lcm(max(config.pad_multiple, 8 * ndev), bs * ndev))
    E = ell_from_csr(sp.csr_matrix(A), dtype=dtype, row_pad_multiple=mult,
                     device=False)
    n_real, n_pad = n_in, E.n_rows_pad
    assert (n_pad // ndev) % bs == 0

    data_np = np.asarray(E.data)
    cols_np = np.asarray(E.cols)
    nnz_np = np.asarray(E.row_nnz)
    A_dist = _make_dist(jnp.asarray(data_np), cols_np, jnp.asarray(nnz_np),
                        ndev, n_pad // ndev, E.K, E.shape)
    Bd = np.zeros((nc, n_pad), np.float64)
    Bd[:, :n_real] = B.T
    B_sh = jnp.asarray(Bd.astype(dtype))  # (nc, n_pad), sharded on axis 1

    # realness of the nodal lanes: contiguous at the fine level, per-device
    # blocks (first cc aggregates of each max_agg block) after coarsening
    real_nodal = np.arange(n_pad // bs) < (n_in // bs)
    records = []
    while True:
        if n_real <= tail_size or len(records) + 2 >= config.max_levels:
            break
        seed = config.seed + len(records)
        (agg, n_agg), n_nodal, nn_pad = _host_aggregate(
            data_np, cols_np, nnz_np, real_nodal, n_pad, bs, config, seed)
        if n_agg == 0 or n_agg * nc >= 0.7 * n_real:
            break

        # ---- aggregate ownership + block-padded coarse numbering ----
        nodal_local = nn_pad // ndev
        first_member = np.full(n_agg, nn_pad, np.int64)
        lanes = np.arange(nn_pad)
        real_m = agg >= 0
        np.minimum.at(first_member, agg[real_m], lanes[real_m])
        owner = (first_member // nodal_local).astype(np.int64)
        cc_agg = np.bincount(owner, minlength=ndev)
        max_agg = pad_rows(int(cc_agg.max(initial=1)), 8)
        rank = np.zeros(n_agg, np.int64)
        for p in range(ndev):
            sel = owner == p
            rank[sel] = np.arange(int(sel.sum()))
        agg_glob = owner * max_agg + rank  # aggregate -> global block id
        max_c = max_agg * nc
        nc_glob = ndev * max_c

        # per-device member tables (owned aggregates x members, nodal lanes)
        order = np.argsort(agg[real_m], kind="stable")
        mem_lanes = lanes[real_m][order]
        mem_aggs = agg[real_m][order]
        counts = np.bincount(mem_aggs, minlength=n_agg)
        starts = np.r_[0, np.cumsum(counts[:-1])]
        max_nodes = max(int(counts.max(initial=1)), 1)
        tbl = np.full((ndev, max_agg, max_nodes), -1, np.int64)
        slot = np.arange(mem_lanes.size) - starts[mem_aggs]
        tbl[owner[mem_aggs], rank[mem_aggs], slot] = mem_lanes

        # ---- widened plan: owners receive remote member dof rows ----
        extra = []
        for p in range(ndev):
            m = tbl[p][tbl[p] >= 0]
            dofs = (m[:, None] * bs + np.arange(bs)[None, :]).ravel()
            extra.append(dofs)
        plan_qr, _ = plan_and_remap(cols_np, nnz_np, ndev, n_pad // ndev,
                                    extra_ghosts=extra)
        ghosts = _ghost_sets(cols_np, nnz_np, ndev, n_pad // ndev, extra)

        # member dof lanes -> extended indices per owner device
        n_local = n_pad // ndev
        tbl_ext = np.zeros((ndev, max_agg, max_nodes * bs), np.int32)
        wmask = np.zeros((ndev, max_agg, max_nodes * bs), dtype)
        for p in range(ndev):
            t = tbl[p]
            dofs = np.where(t[:, :, None] >= 0,
                            t[:, :, None] * bs + np.arange(bs), -1)
            dofs = dofs.reshape(max_agg, max_nodes * bs)
            own = (dofs >= p * n_local) & (dofs < (p + 1) * n_local)
            gpos = np.searchsorted(ghosts[p], np.maximum(dofs, 0))
            gpos = np.clip(gpos, 0, max(ghosts[p].size - 1, 0))
            ext = np.where(own, dofs - p * n_local, n_local + gpos)
            tbl_ext[p] = np.where(dofs >= 0, ext, 0)
            wmask[p] = (dofs >= 0).astype(dtype)

        # agg id per owned dof (global coarse block base), -1 on padding
        nodal_of_dof = np.arange(n_pad) // bs
        nd = agg[nodal_of_dof]
        agg_dof = np.where(nd >= 0, agg_glob[np.maximum(nd, 0)], -1)

        (P_t_data, Bc_sh) = _run_qr(
            mesh, plan_qr, B_sh, jnp.asarray(tbl_ext),
            jnp.asarray(wmask), nc, bs, max_agg, max_nodes, ndev, dtype)

        # assemble tentative P as a DistLevel-style ELL: width nc, cols
        # agg_glob(dof)*nc + j (host-known pattern)
        Pt_cols = np.where(
            agg_dof[None, :] >= 0,
            np.maximum(agg_dof[None, :], 0) * nc
            + np.arange(nc, dtype=np.int64)[:, None], 0).astype(np.int32)
        Pt_nnz = np.where(agg_dof >= 0, nc, 0).astype(np.int32)

        # ---- prolongator smoothing + level aux under shard_map ----
        (P_data, P_cols, P_nnz, dinv, lmax_s, binv) = _run_smooth(
            mesh, A_dist, P_t_data, jnp.asarray(Pt_cols),
            jnp.asarray(Pt_nnz), config, nc_glob, bs, ndev, cols_np, nnz_np)

        # ---- RAP with the P-pattern-widened plan (multi-hop reach) ----
        pc_host = np.asarray(P_cols)
        pn_host = np.asarray(P_nnz)
        pmask = np.arange(pc_host.shape[0])[:, None] < pn_host[None, :]
        fine = np.broadcast_to(np.arange(n_pad)[None, :], pc_host.shape)
        owner_c = pc_host // max_c
        extra_rap = [np.unique(fine[pmask & (owner_c == p)])
                     for p in range(ndev)]
        A_rap = _make_dist(A_dist.data, cols_np, jnp.asarray(nnz_np), ndev,
                           n_pad // ndev, A_dist.K, A_dist.shape,
                           extra_ghosts=extra_rap)
        k_ap, k_pt = _run_widths(mesh, A_rap, (P_data, P_cols, P_nnz),
                                 max_c, ndev)
        *ap_pt, k_ac = _run_rap(mesh, A_rap, (P_data, P_cols, P_nnz),
                                int(k_ap), int(k_pt), max_c, ndev)
        ccounts = jnp.asarray((cc_agg * nc).astype(np.int32))
        Ac_data, Ac_cols, Ac_nnz = _run_ac(
            mesh, A_rap, ap_pt[:3], ap_pt[3:], ccounts, int(k_ac),
            max_c, ndev, filter_tol=config.filter_tol)

        records.append(dict(
            A=A_dist, dinv=dinv, cheb_lmax=lmax_s, binv=binv,
            n=n_real, n_pad=n_pad, P=(P_data, P_cols, P_nnz),
            Pt=ap_pt[3:], max_c=max_c, rap_halo=A_rap.halo,
        ))

        # ---- advance (host structure pass on the coarse level) ----
        nc_real = int((cc_agg * nc).sum())
        ac_cols_np = np.asarray(Ac_cols)
        data_np = np.asarray(Ac_data)
        nnz_np = np.asarray(Ac_nnz)
        A_dist = _make_dist(Ac_data, ac_cols_np, Ac_nnz, ndev, max_c,
                            int(k_ac), (nc_real, nc_real))
        cols_np = ac_cols_np
        n_real, n_pad, bs = nc_real, nc_glob, nc
        B_sh = jnp.transpose(Bc_sh)  # (nc, nc_glob): next level candidates
        # coarse nodal lanes (block size nc): per device, the first
        # cc_agg[p] aggregates of its max_agg block are real
        real_nodal = (np.arange(ndev * max_agg) % max_agg
                      < cc_agg[np.arange(ndev * max_agg) // max_agg])

    if not records:
        raise ValueError(
            f"nothing to shard: n={n_real} <= tail_size={tail_size} "
            "(use build_sa_hierarchy + distribute_hierarchy)")

    # ---- replicated SA tail from the gathered coarse operator ----
    from raptor_tpu.core.ell import ell_to_csr
    from raptor_tpu.setup.aggregation import build_sa_hierarchy

    A_tail = EllMatrix(
        data=np.asarray(A_dist.data),
        cols=cols_np,
        row_nnz=np.asarray(A_dist.row_nnz),
        shape=(n_pad, n_pad), n_rows_pad=n_pad, n_cols_pad=n_pad,
    )
    B_tail = np.asarray(B_sh).T.astype(np.float64)  # (n_pad, nc)
    tail_cfg = dataclasses.replace(
        config, max_levels=max(config.max_levels - len(records), 1),
        pad_multiple=8)
    # scipy round trip: the host-NumPy SA path builds the small tail in
    # seconds; block size is the coarse nc, not the fine inference
    tail = build_sa_hierarchy(ell_to_csr(A_tail).tocsr(), tail_cfg,
                              dtype=np.dtype(dtype), B=B_tail,
                              block_size=nc)
    if config.tail_max_n > 0:
        from raptor_tpu.solve.cycle import materialize_tail

        tail = materialize_tail(tail, config.tail_max_n, min_start=0)

    # ---- assemble DistLevels; last sharded level bridges globally ----
    from raptor_tpu.ops.sparse_ops import ell_transpose as _ellT

    last = records[-1]
    P_g = EllMatrix(
        data=jnp.asarray(np.asarray(last["P"][0])),
        cols=jnp.asarray(np.asarray(last["P"][1])),
        row_nnz=jnp.asarray(np.asarray(last["P"][2])),
        shape=(last["n_pad"], n_pad),
        n_rows_pad=last["n_pad"], n_cols_pad=n_pad,
    )
    bridge_R = _ellT(P_g)

    dlevels = []
    for k, rec in enumerate(records):
        if k + 1 < len(records):
            nxt = records[k + 1]
            Pm = _make_dist(
                rec["P"][0], np.asarray(rec["P"][1]), rec["P"][2], ndev,
                rec["max_c"], rec["P"][0].shape[0], (rec["n"], nxt["n"]))
            Rm = DistMatrix(
                data=rec["Pt"][0], cols=rec["Pt"][1], row_nnz=rec["Pt"][2],
                halo=rec["rap_halo"], n_rows_local=rec["max_c"],
                K=rec["Pt"][0].shape[0], shape=(nxt["n"], rec["n"]))
        else:
            Pm = Rm = None
        dlevels.append(DistLevel(
            A=rec["A"], dinv=rec["dinv"], Pmat=Pm, Rmat=Rm, color=None,
            cheb_lmax=rec["cheb_lmax"], n_local=rec["n_pad"] // ndev,
            ncolors=1, n=rec["n"], binv=rec["binv"]))

    return DistHierarchy(
        levels=tuple(dlevels), bridge_P=P_g, bridge_R=bridge_R,
        tail=tail, config=config, ndev=ndev)


def _ghost_sets(cols_np, nnz_np, ndev, nc_own, extra):
    """The per-device sorted ghost sets plan_and_remap builds internally
    (host bookkeeping for mapping arbitrary global indices to extended
    positions)."""
    K, n_rows = cols_np.shape
    nl = n_rows // ndev
    mask = np.arange(K)[:, None] < nnz_np[None, :]
    owner = cols_np // nc_own
    shard_of_row = np.repeat(np.arange(ndev), nl)[None, :]
    out = []
    for p in range(ndev):
        sel = mask & (shard_of_row == p) & (owner != p)
        g = cols_np[sel]
        if extra is not None and len(extra[p]):
            e = np.asarray(extra[p])
            g = np.concatenate([g, e[e // nc_own != p]])
        out.append(np.unique(g))
    return out


def _run_qr(mesh, plan_qr, B_sh, tbl_ext, wmask, nc: int, bs: int,
            max_agg: int, max_nodes: int, ndev: int, dtype):
    """Batched tentative QR under shard_map: each device factors its owned
    aggregates from the halo-delivered candidate rows, scatters Q back to
    the member dofs' extended slots and adjoint-reduces them to the row
    owners (setup/aggregation._tentative_jit sharded).

    Returns (P_t data (nc, n) sharded on rows, Bc (nc_glob=ndev*max_agg*nc
    rows, nc) sharded on rows)."""

    def body(B_loc, tbl, wm, plan):
        B_ext = halo_exchange_many(B_loc, plan, AXIS)  # (nc, n_ext)
        t = tbl[0]  # (max_agg, max_nodes*bs) ext indices
        rows = jnp.take(B_ext, t, axis=1)  # (nc, max_agg, mn*bs)
        rows = jnp.moveaxis(rows, 0, 2) * wm[0][:, :, None]
        Q, R = jnp.linalg.qr(rows)  # (max_agg, mn*bs, nc), (max_agg, nc, nc)
        sgn = jnp.where(jnp.diagonal(R, axis1=1, axis2=2) < 0, -1.0, 1.0
                        ).astype(rows.dtype)
        Q = Q * sgn[:, None, :]
        R = R * sgn[:, :, None]
        # scatter Q rows to the member dofs' extended slots, adjoint-reduce
        # to owners (each dof belongs to exactly one aggregate)
        Qm = jnp.moveaxis(Q * wm[0][:, :, None], 2, 0)  # (nc, max_agg, mn*bs)
        vals_ext = jnp.zeros((nc, plan.n_ext), rows.dtype)
        vals_ext = vals_ext.at[:, t].add(Qm, mode="drop")
        P_rows = []
        for j in range(nc):
            P_rows.append(halo_reduce(vals_ext[j], plan, AXIS, op="add"))
        Bc = R.reshape(max_agg * nc, nc)
        return jnp.stack(P_rows), Bc

    run = _shmap(
        mesh, body,
        in_specs=(P(None, AXIS), P(AXIS, None, None), P(AXIS, None, None),
                  _plan_spec(plan_qr)),
        out_specs=(P(None, AXIS), P(AXIS, None)))
    return run(B_sh, tbl_ext, wmask, plan_qr)


def _sm_lumped_filter(A_loc: EllMatrix, plan, gext0, tol: float, bs: int):
    """Shard-local mirror of setup.aggregation._lumped_filter (filtered
    SA): the column diagonal magnitudes arrive by halo exchange, the
    same-node test runs on GLOBAL lane ids (take(gext0, cols)), and the
    lump accumulates in the identical ELL slot order as the single-device
    path — operator values stay bit-identical to the unsharded build."""
    n_local = A_loc.n_rows_pad
    ri = A_loc.row_index()
    valid = A_loc.slot_mask()
    isdiag = (A_loc.cols == ri) & valid
    dabs = jnp.abs(A_loc.diagonal())
    dj = jnp.take(halo_exchange(dabs, plan, AXIS), A_loc.cols)
    thr = tol * jnp.sqrt(dabs[None, :] * dj)
    colsg = jnp.take(gext0, A_loc.cols)
    me = jax.lax.axis_index(AXIS).astype(jnp.int32)
    lane_g = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
    samenode = (colsg // bs) == (lane_g // bs)[None, :]
    drop = valid & ~samenode & (jnp.abs(A_loc.data) < thr)
    lump = jnp.sum(jnp.where(drop, A_loc.data, 0), axis=0)
    data = (jnp.where(drop, 0, A_loc.data)
            + jnp.where(isdiag, lump[None, :], 0))
    cols = jnp.where(drop, ri, A_loc.cols)
    return dataclasses.replace(A_loc, data=data, cols=cols)


def _run_smooth(mesh, A_dist, Pt_data, Pt_cols, Pt_nnz, cfg: AmgConfig,
                nc_glob: int, bs: int, ndev: int, cols_np, nnz_np):
    """P = (I - omega D^{-1} A) P_t plus the level's smoother data (dinv,
    scalar/block lambda_max, block-diag inverses), all under shard_map."""
    want_block = cfg.smoother in ("block_jacobi", "block_cheb") and bs > 1
    nc = Pt_data.shape[0]
    e2g = jnp.asarray(_ext2glob(cols_np, nnz_np, ndev,
                                A_dist.data.shape[1] // ndev,
                                A_dist.halo.n_ext))

    def body(dm: DistMatrix, ptd, ptc, ptn, gext):
        A_loc = dm.local_ell()
        plan = dm.halo
        n_local = dm.n_rows_local
        Pl = EllMatrix(data=ptd, cols=ptc, row_nnz=ptn,
                       shape=(n_local, nc_glob),
                       n_rows_pad=n_local, n_cols_pad=nc_glob)
        d = A_loc.diagonal()
        dinv = 1.0 / jnp.where(d != 0, d, 1.0)
        lmax = _dist_lmax(A_loc, plan, dinv, n_local)
        omega = (cfg.sa_omega / lmax).astype(A_loc.dtype)
        P_ext = _exchange_rows(Pl, plan, nc_glob)
        A_w = (_sm_lumped_filter(A_loc, plan, gext[0], cfg.sa_filter, bs)
               if cfg.sa_filter > 0 else A_loc)
        k_dap = jax.lax.pmax(_spgemm_width(A_w, P_ext), AXIS)
        return dinv, lmax, k_dap

    run0 = _shmap(mesh, body,
                  in_specs=(_dm_spec(A_dist), P(None, AXIS), P(None, AXIS),
                            P(AXIS), P(AXIS, None)),
                  out_specs=(P(AXIS), P(), P()))
    dinv, lmax, k_dap = run0(A_dist, Pt_data, Pt_cols, Pt_nnz, e2g)
    k_dap = int(k_dap)
    k_p = nc + k_dap  # merge width bound: distinct cols <= sum

    def body2(dm: DistMatrix, ptd, ptc, ptn, dinv_sh, lmax_r, gext):
        A_loc = dm.local_ell()
        plan = dm.halo
        n_local = dm.n_rows_local
        Pl = EllMatrix(data=ptd, cols=ptc, row_nnz=ptn,
                       shape=(n_local, nc_glob),
                       n_rows_pad=n_local, n_cols_pad=nc_glob)
        P_ext = _exchange_rows(Pl, plan, nc_glob)
        omega = (cfg.sa_omega / lmax_r).astype(A_loc.dtype)
        A_sm = (_sm_lumped_filter(A_loc, plan, gext[0], cfg.sa_filter, bs)
                if cfg.sa_filter > 0 else A_loc)
        W = A_sm.scale_rows(dinv_sh * omega)
        DAP = spgemm_fixed(W, P_ext, k_out=k_dap)
        DAP = dataclasses.replace(DAP, shape=(n_local, nc_glob),
                                  n_cols_pad=nc_glob)
        Psm = ell_add_fixed(Pl, DAP, k_out=k_p, alpha=1.0, beta=-1.0)
        out = (Psm.data, Psm.cols, Psm.row_nnz)
        if want_block:
            colsg = jnp.take(gext[0], A_loc.cols)
            me = jax.lax.axis_index(AXIS).astype(jnp.int32)
            lane_g = me * n_local + jnp.arange(n_local)
            blk = lane_g // bs
            hit = (colsg // bs == blk[None, :]) & A_loc.slot_mask()
            sub_r = (lane_g % bs)
            sub_c = (colsg % bs)
            dblk = jnp.zeros((n_local // bs, bs, bs), A_loc.dtype)
            rows_b = jnp.broadcast_to((jnp.arange(n_local) // bs)[None, :],
                                      A_loc.cols.shape)
            dblk = dblk.at[
                jnp.where(hit, rows_b, 0),
                jnp.where(hit, jnp.broadcast_to(sub_r[None, :],
                                                A_loc.cols.shape), 0),
                jnp.where(hit, sub_c, 0),
            ].add(jnp.where(hit, A_loc.data, 0))
            binv = jnp.linalg.inv(dblk).astype(A_loc.dtype)
            # block-preconditioned lambda_max (power iteration, psum norms)
            def app(v):
                from raptor_tpu.ops.sparse_ops import spmv

                w = spmv(A_loc, halo_exchange(v, plan, AXIS))
                wb = w.reshape(-1, bs)
                return jnp.einsum("nij,nj->ni", binv, wb).reshape(-1)

            i = (me * n_local + jnp.arange(n_local)).astype(A_loc.dtype)
            v = jnp.sin(i * 0.7511) + 0.01
            nrm2 = lambda u: jax.lax.psum(jnp.vdot(u, u), AXIS)
            v = v / jnp.sqrt(nrm2(v))
            def it(_, v):
                w = app(v)
                return w / jnp.sqrt(nrm2(w))
            v = jax.lax.fori_loop(0, 40, it, v)
            w = app(v)
            lmax_b = 1.1 * jax.lax.psum(jnp.vdot(v, w), AXIS) / nrm2(v)
            out += (binv, lmax_b)
        return out

    out_specs = (P(None, AXIS), P(None, AXIS), P(AXIS))
    if want_block:
        out_specs += (P(AXIS, None, None), P())
    run2 = _shmap(mesh, body2,
                  in_specs=(_dm_spec(A_dist), P(None, AXIS), P(None, AXIS),
                            P(AXIS), P(AXIS), P(), P(AXIS, None)),
                  out_specs=out_specs)
    out = run2(A_dist, Pt_data, Pt_cols, Pt_nnz, dinv, lmax, e2g)
    if want_block:
        pd, pc, pn, binv, lmax_b = out
        return pd, pc, pn, dinv, lmax_b, binv
    pd, pc, pn = out
    return pd, pc, pn, dinv, lmax, None
