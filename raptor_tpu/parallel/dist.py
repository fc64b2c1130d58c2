"""Distributed AMG: sharded hierarchy + shard_map solve (SURVEY.md §2b C19).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's MPI-distributed everything — here via a
``jax.sharding.Mesh`` with one ICI axis, ``shard_map``-wrapped solves,
``ppermute`` halo exchange (raptor_tpu.parallel.halo) and ``psum`` dots
(BASELINE.json:5,11 — config 5).

Design:
* Fine levels are row-sharded over the mesh axis; every SpMV (operator,
  restriction, prolongation) is halo-exchange + local ELL SpMV.
* Coarse levels below a threshold are *agglomerated*: replicated on all
  devices and solved with the single-device cycle (SURVEY.md §7 hard part 5
  — tiny coarse matrices are latency-bound, sharding them is a loss).  The
  bridge is one all_gather of the last sharded residual (small by
  construction) and a local slice of the correction.
* The Krylov loop runs inside one jitted shard_map: the only global syncs
  per iteration are the psum'd dot products (SURVEY.md §3b stack 1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import EllMatrix
from raptor_tpu.ops.sparse_ops import spmv
from raptor_tpu.parallel.halo import dist_spmv, psum_dot
from raptor_tpu.parallel.partition import DistMatrix, HaloPlan, distribute_matrix
from raptor_tpu.setup.hierarchy import Hierarchy
from raptor_tpu.solve.cycle import _level as _tail_cycle
from raptor_tpu.solve.krylov import bicgstab, krylov_dispatch, pcg

__all__ = [
    "DistLevel",
    "DistHierarchy",
    "comm_report",
    "dist_banded_spmv",
    "dist_rect_banded_spmv",
    "distribute_hierarchy",
    "dist_solve",
    "make_solve_mesh",
]

AXIS = "x"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Pmat", "Rmat", "dinv", "color", "cheb_lmax", "Aband",
                 "Pband", "Rband", "binv"],
    meta_fields=["n_local", "ncolors", "n"],
)
@dataclasses.dataclass(frozen=True)
class DistLevel:
    A: DistMatrix
    dinv: jax.Array  # (n_rows_global,), sharded
    Pmat: Optional[DistMatrix]  # None on the bridge level
    Rmat: Optional[DistMatrix]
    color: Optional[jax.Array]
    cheb_lmax: Optional[jax.Array]  # replicated scalar
    n_local: int
    ncolors: int
    n: int
    # banded paged-gather layout of A (core.hybrid.BandedMatrix), tiled so
    # each shard owns whole kernel tiles: the sharded operator apply then
    # runs the Pallas banded kernel on the local tile block with a
    # kh*tile ppermute halo instead of the scalar gather ELL
    # (VERDICT r2 missing #3: Pallas on the algebraic sharded solve path)
    Aband: Optional[object] = None
    # rectangular banded transfers (core.hybrid.RectBanded): same tile
    # sharding for P (coarse->fine) and R (fine->coarse) when both levels
    # are sharded — the proportional window means one-neighbor page halos
    Pband: Optional[object] = None
    Rband: Optional[object] = None
    # block-diagonal inverses (nb, b, b) for block smoothers (SA/elasticity,
    # BASELINE.json:10): row-local, sharded with the block rows; the
    # operator apply stays the scalar dist SpMV
    binv: Optional[jax.Array] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "bridge_P", "bridge_R", "tail"],
    meta_fields=["config", "ndev"],
)
@dataclasses.dataclass(frozen=True)
class DistHierarchy:
    levels: Tuple[DistLevel, ...]  # sharded levels, finest first
    bridge_P: EllMatrix  # replicated: last sharded level's transfer ops
    bridge_R: EllMatrix
    tail: Hierarchy  # replicated coarse hierarchy (agglomerated)
    config: AmgConfig
    ndev: int


# ---------------------------------------------------------------------------
# Partition specs (shard_map in/out trees)
# ---------------------------------------------------------------------------

def _plan_spec(plan: HaloPlan) -> HaloPlan:
    return HaloPlan(
        send_idx=tuple(P(AXIS, None) for _ in plan.send_idx),
        recv_tgt=tuple(P(AXIS, None) for _ in plan.recv_tgt),
        offsets=plan.offsets,
        n_local=plan.n_local,
        n_ext=plan.n_ext,
    )


def _dm_spec(dm: Optional[DistMatrix]):
    if dm is None:
        return None
    return DistMatrix(
        data=P(None, AXIS), cols=P(None, AXIS), row_nnz=P(AXIS),
        halo=_plan_spec(dm.halo), n_rows_local=dm.n_rows_local, K=dm.K,
        shape=dm.shape,
    )


def _band_spec(B):
    if B is None:
        return None
    from raptor_tpu.core.hybrid import BandedMatrix

    # vals/pidx are (T, K, R_rows, 128): shard whole kernel tiles; the
    # (n_pad,) perms are unused inside the dist apply (the hierarchy lives
    # in one global RCM ordering) but shard consistently
    # far: the dist plans are built per-shard without a near/far split;
    # mirror whatever the container carries so the spec prefix matches
    far_spec = None if B.far is None else dataclasses.replace(
        B.far, rows=P(None), cols=P(None, None), vals=P(None, None))
    return BandedMatrix(
        vals=P(AXIS, None, None, None), pidx=P(AXIS, None, None, None),
        perm=P(AXIS), iperm=P(AXIS),
        meta=B.meta, shape=B.shape, reordered=B.reordered,
        far=far_spec, slot_ranges=B.slot_ranges,
    )


def _rect_spec(B):
    if B is None:
        return None
    from raptor_tpu.core.hybrid import RectBanded

    far_spec = None if B.far is None else dataclasses.replace(
        B.far, rows=P(None), cols=P(None, None), vals=P(None, None))
    return RectBanded(
        vals=P(AXIS, None, None, None), pidx=P(AXIS, None, None, None),
        meta=B.meta, shape=B.shape, far=far_spec,
        slot_ranges=B.slot_ranges,
    )


def _lvl_spec(lv: DistLevel) -> DistLevel:
    return DistLevel(
        A=_dm_spec(lv.A),
        dinv=P(AXIS),
        Pmat=_dm_spec(lv.Pmat),
        Rmat=_dm_spec(lv.Rmat),
        color=None if lv.color is None else P(AXIS),
        cheb_lmax=None if lv.cheb_lmax is None else P(),
        n_local=lv.n_local,
        ncolors=lv.ncolors,
        n=lv.n,
        Aband=_band_spec(lv.Aband),
        Pband=_rect_spec(lv.Pband),
        Rband=_rect_spec(lv.Rband),
        binv=None if lv.binv is None else P(AXIS, None, None),
    )


def hier_spec(dh: DistHierarchy) -> DistHierarchy:
    rep = lambda t: jax.tree_util.tree_map(lambda _: P(), t)
    return DistHierarchy(
        levels=tuple(_lvl_spec(lv) for lv in dh.levels),
        bridge_P=rep(dh.bridge_P),
        bridge_R=rep(dh.bridge_R),
        tail=rep(dh.tail),
        config=dh.config,
        ndev=dh.ndev,
    )


# ---------------------------------------------------------------------------
# Distribution of a (pad_multiple = 8*ndev) hierarchy
# ---------------------------------------------------------------------------

def distribute_hierarchy(
    hier: Hierarchy, ndev: int, tail_size: int = 4096
) -> DistHierarchy:
    """Shard the fine levels of a hierarchy built with
    ``AmgConfig(pad_multiple=8*ndev)``; agglomerate levels <= tail_size.

    At least one level is sharded and at least one stays in the tail.
    """
    nlev = len(hier.levels)
    t = 1
    while t < nlev - 1 and hier.levels[t].n > tail_size:
        t += 1
    # levels [0, t) sharded; [t, nlev) replicated tail
    dlevels = []
    for k in range(t):
        lev = hier.levels[k]
        A_d = distribute_matrix(lev.A, ndev)
        Pb = Rb = None
        if k + 1 < t:
            nc_pad = hier.levels[k + 1].A.n_rows_pad
            nf_pad = lev.A.n_rows_pad
            nlc = nc_pad // ndev
            nlf = nf_pad // ndev
            R_d = distribute_matrix(lev.R, ndev, n_col_owned=nlf)
            P_d = distribute_matrix(lev.P, ndev, n_col_owned=nlc)
            # rect-banded transfers when both level vectors shard evenly
            Rb = _shardable_rect(getattr(lev, "Rband", None), ndev,
                                 nc_pad, nf_pad)
            Pb = _shardable_rect(getattr(lev, "Pband", None), ndev,
                                 nf_pad, nc_pad)
        else:
            R_d = P_d = None
        binv = None
        if (lev.binv is not None
                and lev.binv.shape[0] % ndev == 0
                and (lev.A.n_rows_pad // ndev) % lev.binv.shape[-1] == 0):
            binv = lev.binv  # block rows shard with the dof rows
        dlevels.append(
            DistLevel(
                A=A_d, dinv=lev.dinv, Pmat=P_d, Rmat=R_d, color=lev.color,
                cheb_lmax=lev.cheb_lmax,
                n_local=lev.A.n_rows_pad // ndev,
                ncolors=lev.ncolors, n=lev.n,
                Aband=_shardable_band(lev.Aband, ndev),
                Pband=Pb, Rband=Rb, binv=binv,
            )
        )
    bridge = hier.levels[t - 1]
    tail = Hierarchy(
        levels=hier.levels[t:], coarse_inv=hier.coarse_inv,
        config=hier.config,
    )
    if hier.config.tail_max_n > 0:
        # fold the whole replicated tail cycle into one dense matvec
        # (min_start=0: the dist tail is already coarse at its level 0)
        from raptor_tpu.solve.cycle import materialize_tail

        tail = materialize_tail(tail, hier.config.tail_max_n, min_start=0)
    return DistHierarchy(
        levels=tuple(dlevels), bridge_P=bridge.P, bridge_R=bridge.R,
        tail=tail, config=hier.config, ndev=ndev,
    )


def _shardable_band(B, ndev: int):
    """The level's BandedMatrix, if its tile grid splits evenly over the
    mesh: each shard must own whole (T // ndev) kernel tiles and the
    kh-tile halo must fit inside one neighbor shard.  Page/idx metadata are
    tile-relative, so slicing the leading T axis IS the per-shard plan."""
    if B is None or B.far is not None:
        # a near/far-split layout cannot shard by tiles (the far block's
        # rows/cols cross shard boundaries); stay on the DistMatrix path
        return None
    K, n, tile, kh, npage, Wp = B.meta
    T = n // tile
    if T % ndev == 0 and T // ndev >= kh:
        return B
    return None


def _shardable_rect(B, ndev: int, n_rows_pad: int, n_cols_pad: int):
    """The level's RectBanded transfer, if both its row tiles and its
    column space split evenly over the mesh and the proportional window's
    page halos fit inside one neighbor block.  Requires the plan's spaces
    to coincide exactly with the sharded vectors' padded sizes."""
    if B is None or B.far is not None:
        return None  # see _shardable_band: split layouts stay unsharded
    from raptor_tpu.ops.pallas.banded_kernel import PAGE

    K, n, n_cols, tile, WpP, npage = B.meta
    T = n // tile
    if n != n_rows_pad or n_cols != n_cols_pad:
        return None
    if T % ndev or n_cols % (ndev * PAGE):
        return None
    p_loc = n_cols // ndev // PAGE
    # ring halos may span several neighbors (_ring_halo) but not the whole
    # ring (beyond that the window wraps into this shard's own block)
    if max(WpP, npage - WpP) > (ndev - 1) * p_loc:
        return None
    return B


# ---------------------------------------------------------------------------
# Distributed banded SpMV (VERDICT r2 missing #3): the Pallas paged-gather
# kernel on the local tile block.  The global plan's page/idx are relative
# to each output tile's own x-window, so the sharded call is literally the
# single-device kernel on the shard's tiles with the zero pad replaced by
# a kh*tile ppermute halo from each ring neighbor.  Wrap-around halos at
# the global edges are annihilated exactly like the single-device zero pad:
# no real entry references x outside [0, n), and masked ELL slots carry
# zero values.
# ---------------------------------------------------------------------------

# tests force the interpreted Pallas kernel on the CPU mesh by setting this
# to True (mirrors structured.dia.PALLAS_INTERPRET); None = backend-gated
BANDED_INTERPRET: bool | None = None


def dist_banded_spmv(B, x_own: jax.Array, axis: str = AXIS,
                     interpret: bool | None = None) -> jax.Array:
    """y_own = (A @ x)_own through the banded kernel; inside shard_map."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        _banded_call,
        banded_ref_padded,
    )

    if interpret is None:
        interpret = BANDED_INTERPRET
    K, _, tile, kh, npage, Wp = B.meta
    ndev = jax.lax.axis_size(axis)
    n_loc = B.vals.shape[0] * tile  # leading T axis arrives sharded
    halo = kh * tile
    # left halo = left neighbor's tail (every device sends to its right)
    left = jax.lax.ppermute(
        x_own[-halo:], axis, [(i, (i + 1) % ndev) for i in range(ndev)])
    # right halo = right neighbor's head
    right = jax.lax.ppermute(
        x_own[:halo], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
    x_pad = jnp.concatenate([left, x_own, right])
    use_kernel = bool(interpret) or jax.default_backend() == "tpu"
    if use_kernel:
        return _banded_call(B.vals, B.pidx, x_pad, K=K, n=n_loc,
                            tile=tile, kh=kh, npage=npage,
                            interpret=bool(interpret), vma=(axis,),
                            ranges=B.slot_ranges)
    plan = dict(vals=B.vals, pidx=B.pidx, K=K, n=n_loc,
                tile=tile, kh=kh, npage=npage, Wp=Wp)
    return banded_ref_padded(plan, x_pad)


def _ring_halo(x_own: jax.Array, h: int, axis: str, ndev: int,
               left: bool) -> jax.Array:
    """The h elements of the global vector adjacent to this shard's block
    (on its left or right), assembled from as many ring neighbors as the
    span covers: hop j ppermutes a slice of every shard's block j positions
    around the ring; blocks wrap at the global edges (wrapped values are
    only ever read by zero-value plan slots, like the zero pad they
    replace)."""
    block = x_own.shape[0]
    q = -(-h // block)  # neighbors touched
    parts = []
    for j in range(q, 0, -1):
        take = h - (j - 1) * block  # partial for the farthest hop
        take = min(take, block)
        src = x_own[-take:] if left else x_own[:take]
        shift = j if left else -j
        buf = jax.lax.ppermute(
            src, axis, [(i, (i + shift) % ndev) for i in range(ndev)])
        parts.append(buf)
    if not left:
        parts.reverse()  # farthest hop goes last on the right side
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def dist_rect_banded_spmv(B, x_own: jax.Array, axis: str = AXIS,
                          interpret: bool | None = None) -> jax.Array:
    """Sharded transfer apply (P or R) through the rectangular banded
    kernel; inside shard_map.  The window base is proportional (tile t of T
    reads around t*n_cols/T), so with the column space sharded in equal
    page-aligned blocks each shard needs WpP pages from its left neighbor
    and npage-WpP from its right; WpP folds into the buffer offset, so the
    local call uses WpP=0 with the LOCAL ratio as the index map
    (banded_kernel._banded_call_rect map_cols).  Wrap halos at the global
    edges are read only by zero-value slots, like the clamp they replace."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        PAGE,
        _banded_call_rect,
        banded_rect_ref_buf,
    )

    if interpret is None:
        interpret = BANDED_INTERPRET
    K, _, _, tile, WpP, npage = B.meta
    ndev = jax.lax.axis_size(axis)
    n_loc = B.vals.shape[0] * tile
    cols_loc = x_own.shape[0]
    lh = WpP * PAGE
    rh = (npage - WpP) * PAGE
    parts = [x_own]
    if lh:
        parts.insert(0, _ring_halo(x_own, lh, axis, ndev, left=True))
    if rh:
        parts.append(_ring_halo(x_own, rh, axis, ndev, left=False))
    x_buf = jnp.concatenate(parts) if len(parts) > 1 else x_own
    use_kernel = bool(interpret) or jax.default_backend() == "tpu"
    if use_kernel:
        return _banded_call_rect(
            B.vals, B.pidx, x_buf, K=K, n=n_loc,
            n_cols=x_buf.shape[0], tile=tile, WpP=0, npage=npage,
            interpret=bool(interpret), map_cols=cols_loc, vma=(axis,),
            ranges=B.slot_ranges)
    plan = dict(vals=B.vals, pidx=B.pidx, K=K, n=n_loc,
                n_cols=x_buf.shape[0], tile=tile, WpP=0, npage=npage)
    return banded_rect_ref_buf(plan, x_buf, map_cols=cols_loc)


# ---------------------------------------------------------------------------
# Distributed smoothers / cycle / solve (all called inside shard_map)
# ---------------------------------------------------------------------------

class CommCtx:
    """Pluggable communication for the distributed cycle: the flat 1D-mesh
    ring exchange and the TAPS 2D-mesh exchange (parallel.dist_taps) share
    the cycle/smoother code through this seam."""

    def __init__(self, sp, axes, shard_index):
        self.sp = sp  # sp(level_slot, DistMatrix, x_own) -> y_own
        self.axes = axes  # axis name(s) for all_gather/psum
        self.shard_index = shard_index  # () -> global shard index

    @staticmethod
    def flat():
        return CommCtx(
            sp=lambda slot, dm, x: dist_spmv(dm, x, AXIS),
            axes=AXIS,
            shard_index=lambda: jax.lax.axis_index(AXIS),
        )


def _dist_smooth(lev: DistLevel, cfg: AmgConfig, b, x, backward: bool,
                 sp, x0_zero: bool = False):
    """``x0_zero`` (trace-time): x == 0 on entry, so the first residual is
    exactly ``b`` — elides one sharded SpMV INCLUDING its halo exchange per
    level per cycle (XLA does not fold A@0; see solve/cycle._smooth_sp)."""
    sweeps = cfg.nu2 if backward else cfg.nu1
    smoother = cfg.smoother
    if sweeps == 0:
        return x
    first = [x0_zero]  # consumed by the FIRST residual below

    def res(x):
        if first[0]:
            first[0] = False
            return b
        return b - sp(x)

    if smoother == "jacobi":
        for _ in range(sweeps):
            x = x + cfg.omega * lev.dinv * res(x)
        return x
    if smoother == "mcgs":
        order = list(range(lev.ncolors))
        if backward:
            order.reverse()
        for _ in range(sweeps):
            for c in order:
                r = res(x)
                x = x + jnp.where(lev.color == c, lev.dinv * r, 0)
        return x
    if smoother == "tsgs":
        # hybrid two-stage Gauss-Seidel (PAPERS.md:9): the inner Jacobi
        # series runs on the PROCESSOR-LOCAL strict triangle (halo columns
        # masked out of the triangular part; they couple only through the
        # outer residual, exactly RAPtor's hybrid-GS processor split) —
        # no communication inside the inner iterations.
        from raptor_tpu.solve.smoothers import triangular_apply

        Aloc = lev.A.local_ell()
        nloc = Aloc.n_rows_pad

        def tri(z):
            z_ext = jnp.zeros(Aloc.n_cols_pad, z.dtype).at[:nloc].set(z)
            return triangular_apply(Aloc, z_ext, upper=backward,
                                    col_bound=nloc)

        for _ in range(sweeps):
            r = res(x)
            z = lev.dinv * r
            for _j in range(cfg.gs_inner):
                z = lev.dinv * (r - tri(z))
            x = x + z
        return x
    if smoother == "chebyshev":
        lmax = lev.cheb_lmax
        lmin = lmax / 30.0
        d = (lmax + lmin) / 2
        c = (lmax - lmin) / 2
        p = jnp.zeros_like(x)
        alpha = jnp.zeros_like(d)
        for i in range(cfg.cheb_degree):
            z = lev.dinv * res(x)
            if i == 0:
                p, alpha = z, 1.0 / d
            else:
                beta = (c * alpha / 2) ** 2
                alpha = 1.0 / (d - beta / alpha)
                p = z + beta * p
            x = x + alpha * p
        return x
    if smoother in ("cheb4", "block_cheb", "block_jacobi"):
        # block smoothers (SA/elasticity, BASELINE.json:10): the block-diag
        # preconditioner is row-local (lev.binv shards with the rows), the
        # operator apply is the ordinary dist SpMV — no extra communication.
        # Levels without a block layout fall back to the scalar diagonal,
        # mirroring solve/cycle._smooth.
        if lev.binv is not None:
            bs = lev.binv.shape[-1]

            def prec(r):
                rb = r.reshape(-1, bs)
                return jnp.einsum("nij,nj->ni", lev.binv, rb).reshape(-1)
        else:
            def prec(r):
                return lev.dinv * r

        if smoother == "block_jacobi":
            for _ in range(sweeps):
                x = x + cfg.omega * prec(res(x))
            return x
        # cheb4 / block_cheb: 4th-kind Chebyshev on the (block-)normalized
        # spectrum, mirrors smoothers.chebyshev4 / bell.block_chebyshev4
        r = res(x)
        d = (4.0 / 3.0) / lev.cheb_lmax * prec(r)
        x = x + d
        for k in range(2, cfg.cheb_degree + 1):
            r = r - sp(d)
            d = ((2 * k - 3) / (2 * k + 1)) * d + (
                (8 * k - 4) / (2 * k + 1) / lev.cheb_lmax
            ) * prec(r)
            x = x + d
        return x
    raise ValueError(f"unknown smoother: {smoother}")


def _apply_dist_A(dh: DistHierarchy, k: int, v, ctx: CommCtx):
    """Sharded operator apply at level k: the banded Pallas route when the
    level carries a shardable banded layout (flat 1D mesh only — the TAPS
    2D exchange stays on its own plan-driven path), else the gather ELL
    halo SpMV through the CommCtx seam."""
    lev = dh.levels[k]
    if lev.Aband is not None and isinstance(ctx.axes, str):
        return dist_banded_spmv(lev.Aband, v, ctx.axes)
    return ctx.sp(("A", k), lev.A, v)


def _dist_level_solve(dh: DistHierarchy, k: int, b, ctx: CommCtx):
    """Distributed V-cycle at sharded level k (b is the owned shard)."""
    cfg = dh.config
    lev = dh.levels[k]
    spA = lambda v: _apply_dist_A(dh, k, v, ctx)
    x = _dist_smooth(lev, cfg, b, jnp.zeros_like(b), backward=False, sp=spA,
                     x0_zero=True)
    r = b - spA(x) if cfg.nu1 else b
    if k + 1 < len(dh.levels):
        banded_txf = lev.Rband is not None and isinstance(ctx.axes, str)
        rc = (dist_rect_banded_spmv(lev.Rband, r, ctx.axes) if banded_txf
              else ctx.sp(("R", k), lev.Rmat, r))
        ec = _dist_level_solve(dh, k + 1, rc, ctx)
        if cfg.cycle == "W":
            # second coarse visit (gamma=2); a sharded level always has the
            # tail below it, so the single-device k+1 < nlev-1 guard holds
            rc2 = rc - _apply_dist_A(dh, k + 1, ec, ctx)
            ec = ec + _dist_level_solve(dh, k + 1, rc2, ctx)
        x = x + (dist_rect_banded_spmv(lev.Pband, ec, ctx.axes)
                 if banded_txf and lev.Pband is not None
                 else ctx.sp(("P", k), lev.Pmat, ec))
    else:
        # bridge to the replicated (agglomerated) tail
        r_glob = jax.lax.all_gather(r, ctx.axes, tiled=True)
        rc = spmv(dh.bridge_R, r_glob[: dh.bridge_R.n_cols_pad])
        ec = _tail_cycle(dh.tail, cfg, 0, rc)
        if cfg.cycle == "W" and len(dh.tail.levels) > 1:
            rc2 = rc - spmv(dh.tail.levels[0].A, ec)
            ec = ec + _tail_cycle(dh.tail, cfg, 0, rc2)
        corr = spmv(dh.bridge_P, ec)
        me = ctx.shard_index()
        x = x + jax.lax.dynamic_slice(
            corr, (me * lev.n_local,), (lev.n_local,)
        )
    x = _dist_smooth(lev, cfg, b, x, backward=True, sp=spA)
    return x


def _dist_cycle(dh: DistHierarchy, b, ctx: CommCtx | None = None):
    return _dist_level_solve(dh, 0, b, ctx or CommCtx.flat())


def make_solve_mesh(ndev: int | None = None) -> Mesh:
    devs = jax.devices()
    ndev = ndev or len(devs)
    return jax.make_mesh((ndev,), (AXIS,), devices=devs[:ndev])


def dist_solve(
    dh: DistHierarchy,
    b,
    mesh: Mesh,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
):
    """Jitted distributed AMG-Krylov solve.

    ``b`` is the global padded rhs (host or device array); returns the global
    solution and a replicated KrylovInfo.
    """
    b = jax.device_put(
        jnp.asarray(b), NamedSharding(mesh, P(AXIS))
    )

    @partial(jax.jit, static_argnames=("krylov", "maxiter"))
    def run(dh, b, tol, krylov, maxiter):
        def body(dh, b):
            lev0 = dh.levels[0]

            def apply_A(x):
                if lev0.Aband is not None:
                    return dist_banded_spmv(lev0.Aband, x, AXIS)
                return dist_spmv(lev0.A, x, AXIS)

            def apply_M(r):
                return _dist_cycle(dh, r)

            solver = krylov_dispatch(krylov)
            return solver(
                apply_A, b, apply_M, tol=tol, maxiter=maxiter,
                dot_fn=psum_dot(AXIS),
            )

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(hier_spec(dh), P(AXIS)),
            out_specs=(P(AXIS), jax.tree_util.tree_map(lambda _: P(), _info_struct(maxiter, b.dtype))),
        )(dh, b)

    return run(dh, b, tol, krylov, maxiter)


def _info_struct(maxiter, dtype):
    from raptor_tpu.solve.krylov import KrylovInfo

    z = jnp.zeros(())
    return KrylovInfo(iterations=z, status=z, relres=z,
                      res_hist=jnp.zeros(maxiter + 1, dtype))


def comm_report(dh: DistHierarchy, dtype_bytes: int = 4) -> dict:
    """Quantified per-level halo-communication inventory (VERDICT r3 next
    #6): for each sharded level, the ppermute round count and per-device
    halo bytes of one exchange on A / P / R, plus an estimate of exchanges
    per V-cycle from the configured smoother (the x0==0 trace-time fold
    makes the first pre-smooth sweep exchange-free).  Pure host
    bookkeeping over the precomputed HaloPlans — the weak-scaling comm
    story (BASELINE.json:11) as numbers instead of equality tests."""
    cfg = dh.config

    def plan_row(plan: HaloPlan) -> dict:
        widths = [int(s.shape[1]) for s in plan.send_idx]
        return {
            "ppermute_rounds": len(plan.offsets),
            "ring_offsets": list(plan.offsets),
            "halo_words_per_round": widths,
            "bytes_per_exchange_per_dev": int(sum(widths)) * dtype_bytes,
        }

    # SpMV-equivalent sweeps per smoother application (each sweep = one
    # A-halo exchange); Chebyshev applies its degree in SpMVs per sweep
    per_sweep = cfg.cheb_degree if cfg.smoother in (
        "chebyshev", "cheb4", "block_cheb") else 1
    levels = []
    total = 0
    for lv in dh.levels:
        row = {"n": lv.n, "n_local": lv.n_local,
               "layout": "banded" if lv.Aband is not None else "ell",
               "A": plan_row(lv.A.halo)}
        # per V-cycle on this level: pre-smooth nu1 sweeps (first is
        # exchange-free via the x0-zero fold) + 1 residual + nu2 post-smooth
        a_ex = max(cfg.nu1 * per_sweep - 1, 0) + 1 + cfg.nu2 * per_sweep
        if lv.Pmat is not None:
            row["P"] = plan_row(lv.Pmat.halo)
            row["R"] = plan_row(lv.Rmat.halo)
            p_bytes = row["P"]["bytes_per_exchange_per_dev"]
            r_bytes = row["R"]["bytes_per_exchange_per_dev"]
        else:
            p_bytes = r_bytes = 0
        row["exchanges_per_vcycle"] = a_ex + (2 if lv.Pmat is not None else 0)
        row["halo_bytes_per_vcycle_per_dev"] = (
            a_ex * row["A"]["bytes_per_exchange_per_dev"] + p_bytes + r_bytes)
        total += row["halo_bytes_per_vcycle_per_dev"]
        levels.append(row)
    return {"ndev": dh.ndev, "levels": levels,
            "halo_bytes_per_vcycle_per_dev": total,
            "note": "tail below the sharded levels is replicated "
                    "(all_gather bridge once per cycle, no per-level halos)"}
