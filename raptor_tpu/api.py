"""User-facing API (SURVEY.md §1b L6): ``setup`` + ``solve``.

The solve path is one jitted program per (hierarchy-shape, solver) pair: the
hierarchy rides in as a pytree argument, so repeated solves with the same
structure hit the jit cache, and the Krylov loop runs with zero host
round-trips (BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.config import AmgConfig, SolveConfig, PRESETS
from raptor_tpu.core.ell import EllMatrix, pad_rows, pad_vector
from raptor_tpu.setup.hierarchy import Hierarchy, build_hierarchy, hierarchy_stats
from raptor_tpu.solve.cycle import cycle
from raptor_tpu.solve.krylov import bicgstab, gmres, krylov_dispatch, pcg

__all__ = ["setup", "solve", "solve_hier", "AmgConfig", "SolveConfig", "PRESETS"]

_DTYPES = {"float32": jnp.float32, "float64": jnp.float64}


def setup(A, config: AmgConfig = AmgConfig(), dtype=jnp.float32,
          B=None) -> Hierarchy:
    """Build the AMG hierarchy (host-driven level loop, on-device level work).

    ``B``: optional (n, nc) near-nullspace candidates for smoothed
    aggregation (rigid body modes for elasticity, BASELINE.json:10);
    ignored by the classical paths."""
    if config.splitting in ("aggregation",) or config.interp == "smoothed":
        from raptor_tpu.setup.aggregation import build_sa_hierarchy

        hier = build_sa_hierarchy(A, config, dtype=dtype, B=B)
    elif config.fine_layout == "banded":
        hier = _setup_banded(A, config, dtype)
    else:
        hier = build_hierarchy(A, config, dtype=dtype)
    if config.tail_max_n > 0:
        from raptor_tpu.solve.cycle import materialize_tail

        hier = materialize_tail(hier, config.tail_max_n)
    if not isinstance(A, EllMatrix) and np.dtype(dtype) == np.float32:
        from raptor_tpu.setup.hierarchy import attach_residual_lo

        hier = attach_residual_lo(hier, A)
    return hier


# levels below this stay on the scalar ELL path: tiny operators are
# latency-bound, the banded layout pays off where the gather volume does.
# 2048 (was 8192, VERDICT r2 missing #5): with 1024-aligned level padding
# every level down to two kernel tiles rides the paged-gather kernel; only
# the latency-bound tail (where a gather is microseconds anyway) stays ELL
BANDED_MIN_N = 2048


def _plane_stats(deltas: np.ndarray, n: int, max_offsets: int = 32):
    """(coverage, efficiency) of laying entries with column-row offsets
    ``deltas`` as <= max_offsets dense diagonal planes: coverage = fraction
    of nnz on the top offsets, efficiency = how full those planes are.
    High on structured matrices in their given ordering (a grid stencil has
    a handful of full constant diagonals); low after RCM or shuffling."""
    if deltas.size == 0:
        return 0.0, 0.0
    _, counts = np.unique(deltas, return_counts=True)
    top = np.sort(counts)[::-1][:max_offsets]
    return float(top.sum() / deltas.size), float(top.sum() / (len(top) * n))


def _plane_stats_ell(E, max_rows: int = 65536) -> tuple:
    """_plane_stats over a (host-numpy) EllMatrix's real slots.

    Rows are strided down to <= max_rows: the result only routes the level
    to the DIA-plane vs banded layout, and a 64k-row stride estimates
    coverage/efficiency to well under the 0.9/0.5 decision margins — the
    full pass built several K*n_pad temporaries and a 36M-entry unique
    sort (~17 s at 128^3 L1, measured round 4)."""
    n = E.shape[0]
    step = max(1, -(-n // max_rows))
    rows = np.arange(0, n, step)
    cols = np.asarray(E.cols)[:, rows]
    nnz = np.asarray(E.row_nnz)[rows]
    slot = np.arange(E.K)[:, None] < nnz[None, :]
    return _plane_stats((cols - rows[None, :])[slot], rows.size)


def _detect_grid(coo, n: int, iso_ratio: float = 8.0) -> "list | None":
    """Infer lexicographic grid extents [e0, e1, e2] (stride order) from a
    matrix's nonzero offsets, or None.

    Accepts stencil-patterned matrices whose offsets lie in the
    {-1,0,1}-span of strides {1, a, b} (7/27-point 3D; {1, a} for 2D with
    e2=1).  Gate for geo-split coarsening (AmgConfig.geo_split): also
    requires the unit-stride coupling magnitudes to be near-isotropic
    (max/min mean |a_ij| over the candidate strides <= iso_ratio) —
    strongly anisotropic problems (config 3) must keep strength-driven
    PMIS, where semicoarsening the largest dim would cut across the weak
    couplings."""
    deltas = coo.col.astype(np.int64) - coo.row
    pos = np.unique(deltas[deltas > 0])
    # stencil patterns have a handful of distinct offsets; a shuffled/
    # unstructured matrix has up to n of them and would make the candidate
    # pair scan below quadratic — bail immediately
    if pos.size == 0 or pos.size > 32 or pos[0] != 1:
        return None
    cands = [int(d) for d in pos if d > 1 and n % int(d) == 0]

    def mean_mag(s):
        m = np.abs(deltas) == s
        return float(np.abs(coo.data[m]).mean()) if m.any() else 0.0

    def iso_ok(strides):
        mags = [mean_mag(s) for s in strides]
        return min(mags) > 0 and max(mags) / min(mags) <= iso_ratio

    for a in cands:
        for b in [c for c in cands if c > a and c % a == 0]:
            span = {i + j * a + k * b
                    for i in (-1, 0, 1) for j in (-1, 0, 1)
                    for k in (-1, 0, 1)}
            if all(int(d) in span for d in pos) and iso_ok((1, a, b)):
                return [a, b // a, n // b]
    for a in cands:  # 2D
        span = {i + j * a for i in (-1, 0, 1) for j in (-1, 0, 1)}
        if all(int(d) in span for d in pos) and iso_ok((1, a)):
            return [a, n // a, 1]
    return None


def _setup_banded(A, config: AmgConfig, dtype) -> Hierarchy:
    """fine_layout='banded' (BASELINE.json:5 general CSR): choose the
    ordering and per-level fast layout from the matrix's structure.

    If the input's entries already sit on a few dense constant diagonals
    (a structured matrix fed to the general API without grid info — e.g. a
    natural-ordered grid stencil), keep the given ordering and attach
    hybrid DIA-plane layouts (core/hybrid.HybridMatrix): the apply is then
    plane rolls / the Pallas DIA kernel with ZERO gathers.  Otherwise RCM
    the input once and attach the banded dynamic-gather layout.  Either
    way the hierarchy is built with 1024-aligned padding in ONE fixed
    ordering; P/R and all vectors share it — only the operator *apply*
    changes per level."""
    import dataclasses

    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.core.hybrid import banded_from_ell, hybrid_from_ell

    assert not isinstance(A, EllMatrix), "fine_layout='banded' takes scipy input"
    a = sp.csr_matrix(A)
    n = a.shape[0]
    coo = a.tocoo()
    cov0, eff0 = _plane_stats(coo.col.astype(np.int64) - coo.row, n)
    plane_mode = cov0 >= 0.9 and eff0 >= 0.5
    if plane_mode:
        # already plane-structured: RCM would destroy the constant offsets
        p = np.arange(n, dtype=np.int64)
    else:
        p = np.asarray(
            reverse_cuthill_mckee(a + a.T, symmetric_mode=True)
        ).astype(np.int64)
    ar = a[p][:, p].tocsr()

    import time as _time

    from raptor_tpu.setup.hierarchy import _setup_tick

    _t0 = _time.perf_counter()
    pm_mult = int(np.lcm(config.pad_multiple, 1024))
    # device=False / stage=False: the banded layout attach below reads every
    # level's arrays on host — keep the whole build in numpy and upload the
    # finished hierarchy once (each device pull is a full tunnel round trip)
    E = ell_from_csr(ar, dtype=dtype, row_pad_multiple=pm_mult, device=False)
    _t0 = _setup_tick("ell_from_csr", _t0)
    cfg = dataclasses.replace(config, pad_multiple=pm_mult)
    # row_ids=p: PMIS weights key on ORIGINAL row ids, so the C/F sets (and
    # hence Krylov iteration counts) are identical to the unpermuted build
    # (VERDICT r2 weak #4: the RCM-seeded order cost ~3 iterations)
    # aggressive (config 3) keeps its tuned multipass pipeline; geo-split
    # additionally bails per level when the coarsened dim's couplings are
    # not strong (empty-P-row guard in the level builders)
    geo = (_detect_grid(coo, n)
           if (plane_mode and config.geo_split and not config.aggressive
               and config.smoother != "mcgs")  # geo levels skip coloring
           else None)
    if geo is not None:
        _setup_tick(f"grid detected: extents={geo} -> geo-split", _t0)
    hier = build_hierarchy(E, cfg, dtype=dtype, row_ids=p, stage=False,
                           geo=geo)
    _t0 = _setup_tick("build_hierarchy", _t0)

    from raptor_tpu.core.hybrid import rect_banded_from_ell

    levels = []
    for _i, lev in enumerate(hier.levels):
        if lev.n >= BANDED_MIN_N and lev.A.n_rows_pad % 1024 == 0:
            attached = False
            if lev.Ahyb is not None:
                attached = True  # device planes from the geo RAP program
            elif plane_mode:
                # Galerkin products of plane-structured operators stay
                # plane-structured (offsets at doubled spacings), so the
                # whole hierarchy usually rides the DIA-plane apply
                cov, eff = _plane_stats_ell(lev.A)
                if cov >= 0.9 and eff >= 0.5:
                    H = hybrid_from_ell(
                        lev.A, reorder=False, max_offsets=32,
                        pad_multiple=lev.A.n_rows_pad, device=False)
                    if H.n_pad == lev.A.n_rows_pad:
                        lev = dataclasses.replace(lev, Ahyb=H)
                        attached = True
            if not attached:
                # reorder=True: coarse levels inherit the fine ordering
                # compressed through the irregular PMIS C-set, which can
                # inflate the bandwidth past the kernel caps (128^3 L1:
                # kh 26/npage 53 vs caps 24/48) — an RCM re-banding of just
                # that level re-enters the bounds, and its two O(n) takes
                # per apply are ~50x cheaper than the K*n gather-ELL SpMV
                # the level otherwise falls back to
                B = banded_from_ell(lev.A, reorder=lev is not hier.levels[0])
                if B is not None and B.n_pad == lev.A.n_rows_pad:
                    lev = dataclasses.replace(lev, Aband=B)
                    attached = True
            if attached and lev.P is not None and lev.Tgeo is None:
                # transfer operators follow the same grid-proportional band
                # (coarse ranks are monotone in the fixed fine order);
                # geo levels skip this — their GeoTransfer (static reshape
                # apply) needs no plan and no host pull
                Pb = rect_banded_from_ell(
                    lev.P, pad_rows(lev.P.n_cols_pad, 1024))
                Rb = rect_banded_from_ell(
                    lev.R, pad_rows(lev.R.n_cols_pad, 1024))
                lev = dataclasses.replace(lev, Pband=Pb, Rband=Rb)
            _t0 = _setup_tick(f"layout attach L{_i} (n={lev.n})", _t0)
        levels.append(lev)

    n_pad = hier.levels[0].A.n_rows_pad
    perm = np.arange(n_pad, dtype=np.int32)
    perm[:n] = p
    iperm = np.arange(n_pad, dtype=np.int32)
    iperm[:n][p] = np.arange(n)
    from raptor_tpu.setup.hierarchy import stage_hierarchy

    out = stage_hierarchy(dataclasses.replace(
        hier, levels=tuple(levels), perm=perm, iperm=iperm,
    ))
    _setup_tick("stage_hierarchy", _t0)
    return out


@partial(jax.jit, static_argnames=("maxiter", "outer", "krylov", "restart"))
def solve_hier_refined(
    hier: Hierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 100,
    outer: int = 8,
    b_lo: jax.Array | None = None,
    krylov: str = "cg",
    M_hier: Hierarchy | None = None,
    restart: int = 30,
):
    """Solve to a TRUE <=tol relative residual entirely on device: fp32
    AMG-PCG inner solves inside compensated-double-float32 iterative
    refinement (utils/df64.py) — one jitted program, no host round-trips,
    no fp64 (the algebraic-engine counterpart of
    structured_solve_refined).  Returns ((x_hi, x_lo), true_relres, iters).

    ``M_hier``: optional separate hierarchy for the preconditioner — pass a
    bf16-cast copy (``setup.hierarchy.cast_hierarchy_algebraic``) to halve
    the cycle's operator HBM traffic; the Krylov operator, residuals, and
    the df64 certification all stay on ``hier``'s full-precision data.
    """
    from raptor_tpu.solve.cycle import apply_op
    from raptor_tpu.utils.df64 import df_add, df_from, two_prod

    A = hier.levels[0].A
    lev0 = hier.levels[0]
    Mh = hier if M_hier is None else M_hier

    def apply_A(v):
        # fast-layout route (banded/block kernels) — the PCG operator apply
        # runs every iteration; only the once-per-outer compensated residual
        # below needs the entrywise gather form (two_prod per entry)
        return apply_op(lev0, v)

    def apply_M(r):
        return cycle(Mh, r).astype(r.dtype)

    lo = hier.a0_lo
    band = lev0.Aband
    # fused-kernel residual (ops/pallas/banded_kernel): one pass reading xh
    # once per tile through the paged vreg gather, vs K full-vector HBM
    # gathers + ~4K elementwise passes for the jnp.take chain below
    # far is not None: a near/far-split band's fused kernel would drop the
    # out-of-window entries from the certified residual — use the exact
    # jnp.take chain below instead
    use_band_resid = band is not None and band.far is None and (
        lo is None or hier.a0_lo_band is not None)
    # DIA-plane compensated residual (geo levels: zero gathers, the
    # structured engine's _df64_residual shape).  lo must be None — the
    # fp32 remainder lives in ELL slot layout, not planes — which it is
    # for every grid stencil (attach_residual_lo's fp32-exact early exit)
    hyb = lev0.Ahyb
    use_hyb_resid = (not use_band_resid and hyb is not None
                     and hyb.spill is None and lo is None)

    def residual(xh, xl, bh, bl):
        # A @ x_lo needs only fp32 accuracy (x_lo ~ 2^-24 x_hi, so its
        # rounding sits ~2^-48 below the residual): ONE fast-layout apply
        # instead of a second full-vector gather per slot in the
        # compensated chain — halves the residual's gather traffic
        v = apply_A(xl)
        if use_band_resid:
            from raptor_tpu.core.hybrid import banded_df64_residual

            return banded_df64_residual(band, hier.a0_lo_band, xh, bh, bl, v)
        if use_hyb_resid:
            rh, rl = df_add(bh, bl, -v, jnp.zeros_like(v))
            for k, o in enumerate(hyb.offsets):
                sh = xh if o == 0 else jnp.roll(xh, -o)
                ph, pe = two_prod(hyb.planes[k], sh)
                rh, rl = df_add(rh, rl, -ph, -pe)
            return rh, rl
        rh, rl = df_add(bh, bl, -v, jnp.zeros_like(v))
        for k in range(A.K):
            gh = jnp.take(xh, A.cols[k], axis=0)
            ph, pe = two_prod(A.data[k], gh)
            if lo is not None:
                # a0_lo * x_hi: certify against the UNROUNDED operator
                # (lo*lo and lo*x_lo are below df64 resolution)
                pe = pe + lo[k] * gh
            rh, rl = df_add(rh, rl, -ph, -pe)
        return rh, rl

    bh, bl = (b, b_lo) if b_lo is not None else df_from(b)
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    xh = jnp.zeros_like(b)
    xl = jnp.zeros_like(b)

    # residual-gated outer loop (VERDICT r2 weak #5): stop as soon as a
    # refinement round certifies tol instead of always running ``outer``
    # rounds — well-conditioned systems finish in one
    def cond(s):
        xh, xl, rh, rl, relres, it, k = s
        return (k < outer) & (relres > tol)

    inner = krylov_dispatch(krylov, restart)

    def body(s):
        xh, xl, rh, rl, relres, it, k = s
        inner_tol = jnp.clip(tol / jnp.maximum(relres, 1e-30), 1e-5, 0.9)
        e, info = inner(apply_A, rh, apply_M, tol=inner_tol, maxiter=maxiter)
        xh, xl = df_add(xh, xl, e, jnp.zeros_like(e))
        rh, rl = residual(xh, xl, bh, bl)
        relres = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
        return xh, xl, rh, rl, relres, it + info.iterations, k + 1

    # x0 == 0: the initial residual IS b (exactly) — skip one full
    # compensated-chain evaluation
    rh, rl = bh, bl
    relres0 = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
    xh, xl, rh, rl, true_relres, total_it, _ = jax.lax.while_loop(
        cond, body, (xh, xl, rh, rl, relres0, jnp.int32(0), jnp.int32(0)))
    return (xh, xl), true_relres, total_it


@partial(jax.jit, static_argnames=("krylov", "maxiter", "precondition",
                                   "restart"))
def solve_hier(
    hier: Hierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
    precondition: bool = True,
    x0: jax.Array | None = None,
    restart: int = 30,
):
    """Jitted end-to-end solve given a built hierarchy and padded rhs."""
    from raptor_tpu.solve.cycle import apply_op

    lev0 = hier.levels[0]

    def apply_A(x):
        return apply_op(lev0, x)

    if precondition:
        def apply_M(r):
            return cycle(hier, r)
    else:
        def apply_M(r):
            return r

    if krylov == "cg":
        return pcg(apply_A, b, apply_M, tol=tol, maxiter=maxiter, x0=x0)
    if krylov == "bicgstab":
        return bicgstab(apply_A, b, apply_M, tol=tol, maxiter=maxiter, x0=x0)
    if krylov in ("gmres", "fgmres"):
        return gmres(apply_A, b, apply_M, tol=tol, maxiter=maxiter, x0=x0,
                     restart=restart, flexible=(krylov == "fgmres"))
    if krylov == "none":  # stationary AMG iteration
        def body(s):
            x, r, it, status, hist = s
            x = x + apply_M(r)
            r = b - apply_A(x)
            rr = jnp.vdot(r, r)
            it = it + 1
            hist = hist.at[it].set(jnp.sqrt(rr / bnorm2))
            status = jnp.where(rr <= tol2, 0, -1).astype(jnp.int32)
            return x, r, it, status, hist

        def cond_fn(s):
            x, r, it, status, hist = s
            return (status < 0) & (it < maxiter)

        from raptor_tpu.solve.krylov import KrylovInfo

        x = jnp.zeros_like(b) if x0 is None else x0
        r = b - apply_A(x)
        bnorm2 = jnp.maximum(jnp.vdot(b, b), 1e-300 if b.dtype == jnp.float64 else 1e-30)
        tol2 = tol * tol * bnorm2
        hist = jnp.full(maxiter + 1, jnp.nan, b.dtype)
        hist = hist.at[0].set(jnp.sqrt(jnp.vdot(r, r) / bnorm2))
        x, r, it, status, hist = jax.lax.while_loop(
            cond_fn, body, (x, r, jnp.int32(0), jnp.int32(-1), hist)
        )
        status = jnp.where(status < 0, 1, status)
        return x, KrylovInfo(
            iterations=it, status=status,
            relres=jnp.sqrt(jnp.vdot(r, r) / bnorm2), res_hist=hist,
        )
    raise ValueError(f"unknown krylov: {krylov}")


def solve(
    A,
    b,
    config: AmgConfig = AmgConfig(),
    solve_config: SolveConfig = SolveConfig(),
    hier: Hierarchy | None = None,
):
    """One-call AMG-preconditioned solve from host data.

    Returns (x host array of logical length, info dict).  With
    ``solve_config.refine`` the fp32 device solve is wrapped in fp64
    iterative refinement on host (mixed precision: TPU fp32 cannot reach
    1e-8 relative residual alone at high condition numbers).
    """
    import scipy.sparse as sp

    dtype = _DTYPES[solve_config.dtype]
    A_sp = sp.csr_matrix(A) if not isinstance(A, EllMatrix) else None
    if hier is None:
        hier = setup(A_sp if A_sp is not None else A, config, dtype=dtype)
    A0 = hier.levels[0].A
    n = A0.shape[0]
    b = np.asarray(b, dtype=np.float64)
    pm = None
    if hier.perm is not None:
        # fine_layout='banded': the hierarchy lives in the RCM ordering —
        # permute the rhs in, the solution back out (and, for host-side
        # refinement, the residual matrix too)
        pm = np.asarray(hier.perm)[:n]
        b = b[pm]
        if A_sp is not None:
            A_sp = A_sp[pm][:, pm].tocsr()

    if not solve_config.refine:
        bd = pad_vector(b.astype(dtype), A0.n_rows_pad)
        x, info = solve_hier(
            hier, bd, tol=solve_config.tol, maxiter=solve_config.maxiter,
            krylov=config_krylov(solve_config),
            restart=solve_config.gmres_restart,
        )
        return _finish(x, info, n, hier, pm)

    if solve_config.refine_device and solve_config.krylov in (
            "cg", "bicgstab", "gmres", "fgmres"):
        # fully on-device refinement with compensated-fp32 residuals;
        # b enters as an exact df64 pair so fp64 inputs are certified
        # against the UNROUNDED right-hand side
        b_hi = b.astype(np.float32)
        b_lo = (b - b_hi.astype(np.float64)).astype(np.float32)
        bd = pad_vector(b_hi, A0.n_rows_pad)
        bdl = pad_vector(b_lo, A0.n_rows_pad)
        M_hier = None
        if config.operator_store_dtype != "same":
            # bf16 preconditioner hierarchy: the cycle's operator reads
            # halve while apply_A / the df64 residual stay on the fp32 data
            # (refinement certifies the TRUE residual either way)
            from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic

            M_hier = cast_hierarchy_algebraic(
                hier, jnp.dtype(config.operator_store_dtype))
        (xh, xl), relres, iters = solve_hier_refined(
            hier, bd, tol=solve_config.tol, maxiter=solve_config.maxiter,
            b_lo=bdl, krylov=solve_config.krylov, M_hier=M_hier,
            restart=solve_config.gmres_restart,
        )
        # one batched fetch: each host sync is a full round trip on
        # remote-tunnel backends, so pull all four results together
        xh_h, xl_h, relres, iters = jax.device_get((xh, xl, relres, iters))
        x64 = (xh_h[:n].astype(np.float64) + xl_h[:n].astype(np.float64))
        x64 = _deperm(x64, pm)
        return x64, {
            "iterations": int(iters),
            "relres": float(relres),
            "status": 0,
            "stats": hierarchy_stats(hier),
        }

    # fp64-outer iterative refinement around the fp32 device solve (host).
    assert A_sp is not None, "refinement needs the host matrix for fp64 residuals"
    x64 = np.zeros(n, dtype=np.float64)
    bnorm = np.linalg.norm(b)
    total_it = 0
    hists = []
    info = None
    for _ in range(max(1, solve_config.refine_steps)):
        r = b - A_sp @ x64
        relres = np.linalg.norm(r) / bnorm
        if relres < solve_config.tol:
            break
        rd = pad_vector(r.astype(dtype), A0.n_rows_pad)
        # inner solve to a tolerance fp32 can actually certify
        inner_tol = max(solve_config.tol / max(relres, 1e-300), 1e-5)
        e, info = solve_hier(
            hier, rd, tol=inner_tol, maxiter=solve_config.maxiter,
            krylov=config_krylov(solve_config),
            restart=solve_config.gmres_restart,
        )
        total_it += int(info.iterations)
        hists.append(np.asarray(info.res_hist))
        x64 = x64 + np.asarray(e[:n], dtype=np.float64)
    r = b - A_sp @ x64
    out_info = {
        "iterations": total_it,
        "relres": float(np.linalg.norm(r) / bnorm),
        "status": int(info.status) if info is not None else 0,
        "stats": hierarchy_stats(hier),
    }
    return _deperm(x64, pm), out_info


def config_krylov(sc: SolveConfig) -> str:
    return sc.krylov


def _deperm(x, pm):
    """Map a solution from the hierarchy's (RCM) ordering back to the
    caller's ordering; identity when pm is None."""
    if pm is None:
        return x
    out = np.empty_like(x)
    out[pm] = x
    return out


def _finish(x, info, n, hier, pm=None):
    out_info = {
        "iterations": int(info.iterations),
        "relres": float(info.relres),
        "status": int(info.status),
        "res_hist": np.asarray(info.res_hist),
        "stats": hierarchy_stats(hier),
    }
    return _deperm(np.asarray(x[:n]), pm), out_info
