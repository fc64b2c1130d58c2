"""Structured multigrid engine: semicoarsening + operator-collapsed
interpolation on DIA operators — the TPU speed-of-light solve path.

This is the structured-grid recast of the AMG stack (the "par_stencil" side
of the reference capability, SURVEY.md §2b C18): when the operator lives on
a regular grid (all five BASELINE.json configs), coarsening every second
plane along one dimension per level keeps every grid regular, so

* restriction/prolongation compact/expand via *strided reshapes* (no gather),
* all level operators stay DIA (SpMV = rolls at HBM bandwidth),
* the Galerkin RAP is the static-offset DIA product (no width measurement),
* C/F structure is implicit — setup truly runs end-to-end under one jit
  (BASELINE.json:5), including the hierarchy construction.

Interpolation is operator-dependent 1D collapsing (black-box-MG style): an
F-plane point splits its row between its two in-line C neighbors,
  w_∓ = -(Σ_{o_d = ∓1} a_o) / (Σ_{o_d = 0} a_o),
which reproduces linear interpolation on Poisson and adapts to coefficient
jumps/anisotropy.  The coarsening dimension alternates (largest dim first)
or follows the operator's strongest coupling.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.config import AmgConfig
from raptor_tpu.solve.krylov import bicgstab, krylov_dispatch as _krylov_dispatch, pcg
from raptor_tpu.structured.dia import (
    DiaMatrix,
    boundary_mask,
    boundary_mask_traced,
    dia_add,
    dia_mult,
    dia_prune,
    dia_spmv,
    dia_transpose,
    _linear,
)

__all__ = ["SLevel", "SHierarchy", "build_structured_hierarchy",
           "structured_solve", "structured_solve_refined", "scycle",
           "cast_hierarchy"]

Vec = Tuple[int, ...]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Pt", "Rt", "dinv", "red", "cheb_lmax"],
    meta_fields=["dims", "cdim"],
)
@dataclasses.dataclass(frozen=True)
class SLevel:
    A: DiaMatrix  # operator on this level's grid
    Pt: Optional[DiaMatrix]  # embedded prolongation (this grid), None at coarsest
    Rt: Optional[DiaMatrix]
    dinv: jax.Array
    red: jax.Array  # bool red-black mask (precomputed; avoids per-cycle iota)
    cheb_lmax: Optional[jax.Array]
    dims: Vec
    cdim: int  # dimension coarsened to reach the next level (-1 at coarsest)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "coarse_inv", "tail_op"],
    meta_fields=["config", "tail_start"],
)
@dataclasses.dataclass(frozen=True)
class SHierarchy:
    levels: Tuple[SLevel, ...]
    coarse_inv: jax.Array  # dense inverse of the coarsest operator
    config: AmgConfig
    # dense coarse tail (config.tail_max_n, docs/DESIGN.md §4): the whole
    # sub-cycle at level tail_start, materialized as ONE dense matrix — the
    # cycle recursion below tail_start becomes a single MXU matvec
    tail_op: Optional[jax.Array] = None
    tail_start: int = -1


# ---------------------------------------------------------------------------
# grid helpers (all static / trace-time)
# ---------------------------------------------------------------------------

def _coarse_dims(dims: Vec, d: int) -> Vec:
    out = list(dims)
    out[d] = (dims[d] + 1) // 2
    return tuple(out)


def _compact(v: jax.Array, dims: Vec, d: int) -> jax.Array:
    sl = tuple(slice(None, None, 2) if ax == d else slice(None)
               for ax in range(len(dims)))
    return v.reshape(dims)[sl].reshape(-1)


def _expand(vc: jax.Array, dims: Vec, d: int) -> jax.Array:
    sl = tuple(slice(None, None, 2) if ax == d else slice(None)
               for ax in range(len(dims)))
    out = jnp.zeros(dims, vc.dtype)
    out = out.at[sl].set(vc.reshape(_coarse_dims(dims, d)))
    return out.reshape(-1)


def _parity(dims: Vec) -> jax.Array:
    """(n,) int32 red-black coloring of the grid (computed at trace time)."""
    acc = None
    for ax in range(len(dims)):
        io = jax.lax.broadcasted_iota(jnp.int32, dims, ax)
        acc = io if acc is None else acc + io
    return (acc % 2).reshape(-1)


def _c_mask(dims: Vec, d: int) -> np.ndarray:
    """(n,) bool: coord_d even (host/static)."""
    m = np.zeros(dims, dtype=bool)
    sl = tuple(slice(None, None, 2) if ax == d else slice(None)
               for ax in range(len(dims)))
    m[sl] = True
    return m.ravel()


def _c_mask_traced(dims: Vec, d: int) -> jax.Array:
    """Traced C-plane mask (no n-sized constants in the program)."""
    io = jax.lax.broadcasted_iota(jnp.int32, dims, d)
    return (io % 2 == 0).reshape(-1)


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------

def _collapse_weights(A: DiaMatrix, d: int):
    """Operator-collapsed line weights: w∓ = -(Σ_{o_d=∓1} a)/(Σ_{o_d=0} a)."""
    neg = [k for k, o in enumerate(A.offsets) if o[d] == -1]
    zer = [k for k, o in enumerate(A.offsets) if o[d] == 0]
    pos = [k for k, o in enumerate(A.offsets) if o[d] == 1]

    def ssum(ks):
        if not ks:
            return jnp.zeros(A.n, A.dtype)
        acc = A.data[ks[0]]
        for k in ks[1:]:
            acc = acc + A.data[k]
        return acc

    denom = ssum(zer)
    denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    return -ssum(neg) / denom, -ssum(pos) / denom


def _build_transfer(A: DiaMatrix, d: int) -> DiaMatrix:
    """Embedded prolongation Pt on A's grid: identity at C planes (coord_d
    even), line interpolation from the two in-line C neighbors at F planes."""
    dims = A.dims
    cm = _c_mask_traced(dims, d)
    fm = ~cm
    w_m, w_p = _collapse_weights(A, d)
    e = tuple(1 if ax == d else 0 for ax in range(len(dims)))
    ne = tuple(-1 if ax == d else 0 for ax in range(len(dims)))
    bm_p = boundary_mask_traced(dims, e)
    bm_m = boundary_mask_traced(dims, ne)
    zero_off = tuple([0] * len(dims))
    data = jnp.stack([
        jnp.where(fm & bm_m, w_m, 0.0).astype(A.dtype),
        cm.astype(A.dtype),
        jnp.where(fm & bm_p, w_p, 0.0).astype(A.dtype),
    ])
    return DiaMatrix(data=data, offsets=(ne, zero_off, e), dims=dims)


def _build_transfer_full(A: DiaMatrix) -> DiaMatrix:
    """Embedded prolongation for FULL coarsening (C = all-even points):
    BoxMG-style staged operator-induced interpolation.

    Stage s defines the F-points that are odd in exactly s dimensions from
    already-defined neighbors (fewer odd dims), with weights from the
    stencil collapsed over the even dims:

        w_sigma = - (Σ_{o: o|T = sigma} a_o) / (Σ_{o: o|T = 0} a_o)

    for each odd-dim subset T and sigma in {-1,0,1}^T minus 0.  The total
    prolongator is the composition P_nd ∘ ... ∘ P_1; parity reasoning
    bounds its true support to inf-norm <= 1 offsets, so structurally-dead
    planes from the Minkowski composition are filtered exactly.
    """
    import itertools

    from raptor_tpu.structured.dia import dia_filter_offsets

    dims = A.dims
    nd = len(dims)
    odd = [
        (jax.lax.broadcasted_iota(jnp.int32, dims, d) % 2 == 1).reshape(-1)
        for d in range(nd)
    ]

    def embed(T, sigma):
        o = [0] * nd
        for d, v in zip(T, sigma):
            o[d] = v
        return tuple(o)

    stages = []
    for s_ in range(1, nd + 1):
        planes: dict = {}
        class_any = None
        for T in itertools.combinations(range(nd), s_):
            mask = None
            for d in range(nd):
                m = odd[d] if d in T else ~odd[d]
                mask = m if mask is None else mask & m
            class_any = mask if class_any is None else class_any | mask
            # collapsed couplings over the non-T dims
            denom = None
            for k, o in enumerate(A.offsets):
                if all(o[d] == 0 for d in T):
                    denom = A.data[k] if denom is None else denom + A.data[k]
            denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
            for sigma in itertools.product((-1, 0, 1), repeat=s_):
                if all(v == 0 for v in sigma):
                    continue
                num = None
                for k, o in enumerate(A.offsets):
                    if all(o[d] == v for d, v in zip(T, sigma)):
                        num = A.data[k] if num is None else num + A.data[k]
                if num is None:
                    continue
                w = jnp.where(mask, -num / denom, 0.0).astype(A.dtype)
                off = embed(T, sigma)
                planes[off] = planes.get(off, 0) + w
        # identity on everything not in this stage's classes
        zero = tuple([0] * nd)
        ident = jnp.where(class_any, 0.0, 1.0).astype(A.dtype)
        planes[zero] = planes.get(zero, 0) + ident
        offs = sorted(planes.keys())
        stages.append(DiaMatrix(
            data=jnp.stack([planes[o] for o in offs]),
            offsets=tuple(offs), dims=dims,
        ))

    Pt = stages[0]
    keep1 = lambda o: max(abs(v) for v in o) <= 1
    for Ps in stages[1:]:
        Pt = dia_filter_offsets(dia_mult(Ps, Pt, keep=keep1), keep1)
    return Pt


def _compact_dia_full(Ae: DiaMatrix) -> DiaMatrix:
    """Restrict an all-even-supported embedded operator to the full-coarse
    grid (compact every dimension)."""
    out = Ae
    for d in range(len(Ae.dims)):
        out = _compact_dia(out, d)
    return out


def _compact_full(v: jax.Array, dims: Vec) -> jax.Array:
    sl = tuple(slice(None, None, 2) for _ in dims)
    return v.reshape(dims)[sl].reshape(-1)


def _expand_full(vc: jax.Array, dims: Vec) -> jax.Array:
    sl = tuple(slice(None, None, 2) for _ in dims)
    cd = tuple((d + 1) // 2 for d in dims)
    out = jnp.zeros(dims, vc.dtype)
    return out.at[sl].set(vc.reshape(cd)).reshape(-1)


FULL_STEP = -2  # plan marker: coarsen every dimension at once


def _compact_dia(Ae: DiaMatrix, d: int) -> DiaMatrix:
    """Restrict an embedded C-row/C-col operator to the coarse grid."""
    dims = Ae.dims
    cd = _coarse_dims(dims, d)
    planes, offs = [], []
    for k, o in enumerate(Ae.offsets):
        if o[d] % 2 != 0:
            continue  # identically zero between C points
        oc = tuple(v // 2 if ax == d else v for ax, v in enumerate(o))
        plane = _compact(Ae.data[k], dims, d)
        # re-truncate for the coarse grid box
        plane = plane * boundary_mask_traced(cd, oc).astype(Ae.dtype)
        planes.append(plane)
        offs.append(oc)
    return DiaMatrix(data=jnp.stack(planes), offsets=tuple(offs), dims=cd)


def _estimate_lmax_dia(A: DiaMatrix, dinv, iters: int = 40, safety=1.1):
    i = jnp.arange(A.n, dtype=A.dtype)
    v = jnp.sin(i * 0.7511) + 0.01
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = dinv * dia_spmv(A, v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * dia_spmv(A, v)
    return safety * jnp.vdot(v, w) / jnp.vdot(v, v)


def _choose_dim(A: DiaMatrix, policy: str) -> int:
    """Coarsening dimension: largest extent (static) or strongest coupling
    (one tiny host sync at setup)."""
    dims = A.dims
    if policy == "size":
        return int(np.argmax(dims))
    # operator policy: per-dim coupling = sum |a_o| over offsets moving
    # only along that dim
    s = []
    for ax in range(len(dims)):
        ks = [k for k, o in enumerate(A.offsets)
              if o[ax] != 0 and all(o[j] == 0 for j in range(len(dims)) if j != ax)]
        s.append(float(sum(jnp.sum(jnp.abs(A.data[k])) for k in ks)) if ks else 0.0)
    s = [v * (1.0 if dims[ax] > 3 else 0.0) for ax, v in enumerate(s)]
    return int(np.argmax(s))


def plan_coarsening(
    A: DiaMatrix, config: AmgConfig, dim_policy: str = "operator",
    allow_full: bool | None = None,
) -> Tuple[int, ...]:
    """Static coarsening plan (sequence of dims), so the whole setup can run
    under ONE jit (BASELINE.json:5 "setup ... end-to-end under jit").

    'size' policy is fully static; 'operator' syncs the initial per-dim
    coupling strengths once, then evolves them with the standard
    semicoarsening model (coarsening dim d scales its coupling by 1/4 —
    h_d doubles)."""
    if allow_full is None:
        allow_full = config.full_coarsening
    dims = list(A.dims)
    nd = len(dims)
    if dim_policy == "operator":
        # stencil second moments: s_d = -(1/2) Σ_o mean(a_o) o_d^2 recovers
        # the continuum diffusion coefficient D_dd exactly for constant
        # coefficients (one host sync of n_off scalars).
        means = np.asarray(jnp.mean(A.data, axis=1))
        s = []
        for ax in range(nd):
            s.append(float(-0.5 * sum(
                means[k] * (o[ax] ** 2) for k, o in enumerate(A.offsets)
            )))
        s = [max(v, 0.0) for v in s]
        if max(s) <= 0:
            s = [float(d) for d in dims]
    else:
        s = [float(d) for d in dims]

    plan = []
    n = int(np.prod(dims))
    while (
        len(plan) + 1 < config.max_levels
        and n > config.coarse_size
        and max(dims) > 3
    ):
        live = [ax for ax in range(nd) if dims[ax] > 3]
        s_live = [s[ax] for ax in live]
        balanced = (
            allow_full
            and len(live) == nd
            and max(s_live) <= 4.0 * max(min(s_live), 1e-30)
        )
        if balanced:
            # full coarsening: all dims at once (BoxMG staged interpolation)
            plan.append(FULL_STEP)
            for ax in range(nd):
                dims[ax] = (dims[ax] + 1) // 2
                s[ax] /= 4.0
        else:
            cand = [s[ax] if dims[ax] > 3 else -1.0 for ax in range(nd)]
            d = int(np.argmax(cand))
            plan.append(d)
            dims[d] = (dims[d] + 1) // 2
            s[d] /= 4.0
        n = int(np.prod(dims))
    return tuple(plan)


@partial(jax.jit, static_argnames=("config", "plan", "prune"))
def _build_hierarchy_planned(
    A: DiaMatrix, config: AmgConfig, plan: Tuple[int, ...], prune: bool = False
) -> SHierarchy:
    """The whole setup as ONE jitted program: transfers, Galerkin RAP and
    smoother data for every level (the plan fixes all shapes/offsets at
    trace time).  ``prune`` enables numeric zero-diagonal dropping, which
    needs host syncs — off under jit."""
    levels = []
    for d in plan:
        if d == FULL_STEP:
            Pt = _build_transfer_full(A)
            Rt = dia_transpose(Pt)
            keep_even = lambda o: all(v % 2 == 0 for v in o)
            Ae = dia_mult(Rt, dia_mult(A, Pt), keep=keep_even)
            Ac = _compact_dia_full(Ae)
        else:
            Pt = _build_transfer(A, d)
            Rt = dia_transpose(Pt)
            Ae = dia_mult(Rt, dia_mult(A, Pt))
            Ac = _compact_dia(Ae, d)
        if prune:
            Ac = dia_prune(Ac, tol=1e-12)
        dinv = 1.0 / jnp.where(jnp.abs(A.diagonal()) > 0, A.diagonal(), 1.0)
        lmax = (_estimate_lmax_dia(A, dinv)
                if config.smoother in ("chebyshev", "cheb4") else None)
        levels.append(SLevel(A=A, Pt=Pt, Rt=Rt, dinv=dinv,
                             red=_parity(A.dims) == 0, cheb_lmax=lmax,
                             dims=A.dims, cdim=d))
        A = Ac

    dinv = 1.0 / jnp.where(jnp.abs(A.diagonal()) > 0, A.diagonal(), 1.0)
    lmax = (_estimate_lmax_dia(A, dinv)
                if config.smoother in ("chebyshev", "cheb4") else None)
    levels.append(SLevel(A=A, Pt=None, Rt=None, dinv=dinv,
                         red=_parity(A.dims) == 0, cheb_lmax=lmax,
                         dims=A.dims, cdim=-1))
    inv = _dia_dense_inverse(A)
    return SHierarchy(levels=tuple(levels), coarse_inv=inv, config=config)


def build_structured_hierarchy(
    A: DiaMatrix,
    config: AmgConfig = AmgConfig(smoother="mcgs"),
    dim_policy: str = "operator",
) -> SHierarchy:
    """Semicoarsening hierarchy: plan the (static) coarsening sequence, then
    run the numeric setup as a single jitted program."""
    plan = plan_coarsening(A, config, dim_policy)
    hier = _build_hierarchy_planned(A, config, plan)
    if config.operator_store_dtype != "same":
        hier = cast_hierarchy(hier, jnp.dtype(config.operator_store_dtype))
    if config.tail_max_n > 0:
        # cap below the config default: DIA rolls on tiny levels are already
        # cheap (measured 128^3 V-cycle: fold@2048 neutral, fold@4096 +0.5ms
        # — the 32 MiB matvec read outweighs the folded levels); the fold
        # still pays on the *distributed* replicated tail (program size)
        hier = materialize_tail(hier, min(config.tail_max_n, 2048))
    return hier


@partial(jax.jit, static_argnames=("cfg",))
def _slevel_dense(lev: SLevel, cfg: AmgConfig, Meff: jax.Array) -> jax.Array:
    """Dense matrix of ONE level's cycle body with the recursion replaced
    by the (already dense) coarse map ``Meff`` — vmapping just this level
    keeps each program small (compiling the whole nested tail cycle as one
    batched program took minutes; per-level bodies compile in seconds)."""
    n = lev.A.n
    eye = jnp.eye(n, dtype=lev.dinv.dtype)

    def step(c):
        # no x0_zero fold here: this is a setup-time vmapped build whose
        # result is identical either way; keeping the trace unchanged keeps
        # the persistent-compile-cache entries for the setup programs valid
        x = _smooth(lev, cfg, c, jnp.zeros_like(c), backward=False)
        r = c - dia_spmv(lev.A, x)
        rr = dia_spmv(lev.Rt, r)
        rc = (_compact_full(rr, lev.dims) if lev.cdim == FULL_STEP
              else _compact(rr, lev.dims, lev.cdim))
        ec = Meff @ rc
        e = (_expand_full(ec, lev.dims) if lev.cdim == FULL_STEP
             else _expand(ec, lev.dims, lev.cdim))
        x = x + dia_spmv(lev.Pt, e)
        return _smooth(lev, cfg, c, x, backward=True)

    return jax.vmap(step)(eye).T


@jax.jit
def _dense_op(A: DiaMatrix) -> jax.Array:
    """Dense matrix of a DIA operator (for the W-cycle coarse revisit)."""
    eye = jnp.eye(A.n, dtype=jnp.float32)
    return jax.vmap(lambda c: dia_spmv(A, c))(eye).T


def materialize_tail(hier: SHierarchy, max_n: int,
                     min_start: int = 1) -> SHierarchy:
    """Fold the coarse tail of the cycle into one dense operator
    (docs/DESIGN.md §4: 12+ coarse levels of 27-offset rolls are pure
    latency; the tail cycle is linear, so it IS a matrix).  Picks the first
    level >= min_start (never the fine level in single-device use) with
    n <= max_n; everything below it — smoothers, transfers, recursion,
    coarse solve — collapses into tail_op.  min_start=0 is for the
    distributed replicated tail, which is already coarse at level 0."""
    ts = next((i for i in range(min_start, len(hier.levels))
               if hier.levels[i].A.n <= max_n), None)
    if ts is None or ts >= len(hier.levels) - 1:
        return hier  # nothing to fold (coarsest is already one dense matvec)
    cfg = hier.config
    M = hier.coarse_inv.astype(jnp.float32)
    for k in range(len(hier.levels) - 2, ts - 1, -1):
        if cfg.cycle == "W" and k + 1 < len(hier.levels) - 1:
            # the coarse visit happens twice on an updated residual:
            # ec = M rc + M (rc - A' M rc)  ->  Meff = 2M - M A' M
            Ad = _dense_op(hier.levels[k + 1].A)
            Meff = 2.0 * M - M @ Ad @ M
        else:
            Meff = M
        M = _slevel_dense(hier.levels[k], cfg, Meff)
    tail_op = M
    if hier.levels[0].A.dtype == jnp.bfloat16:
        tail_op = tail_op.astype(jnp.bfloat16)  # same storage rule as A/Pt/Rt
    return dataclasses.replace(hier, tail_op=tail_op, tail_start=ts)


def cast_hierarchy(hier: SHierarchy, dtype) -> SHierarchy:
    """Store the level operators (A/Pt/Rt diagonals) in a narrower dtype —
    bfloat16 halves the dominant HBM traffic of the V-cycle (+39% measured
    at 128^3 with identical iteration counts; docs/DESIGN.md).  Vectors and
    reductions stay in the solve dtype: the mixed multiply promotes, so only
    storage precision drops — the same trick as bf16 weights in NN serving."""

    def cd(m):
        return None if m is None else dataclasses.replace(
            m, data=m.data.astype(dtype))

    levels = tuple(
        dataclasses.replace(lv, A=cd(lv.A), Pt=cd(lv.Pt), Rt=cd(lv.Rt))
        for lv in hier.levels
    )
    tail = None if hier.tail_op is None else hier.tail_op.astype(dtype)
    return SHierarchy(levels=levels, coarse_inv=hier.coarse_inv,
                      config=hier.config, tail_op=tail,
                      tail_start=hier.tail_start)


@partial(jax.jit, static_argnames=())
def _dia_dense_inverse(A: DiaMatrix) -> jax.Array:
    """Explicit inverse of the coarsest operator: the coarse solve becomes a
    single dense matvec (MXU) — triangular back-substitution is sequential
    and latency-dominated on TPU (docs/DESIGN.md §4).  Inversion cost is
    setup-only; accuracy is ample for a preconditioner component."""
    n = A.n
    dense = jnp.zeros((n, n), A.dtype)
    rows = jnp.arange(n)
    for k, off in enumerate(A.offsets):
        lin = _linear(off, A.dims)
        cols = jnp.clip(rows + lin, 0, n - 1)
        valid = boundary_mask_traced(A.dims, off)
        dense = dense.at[rows, cols].add(jnp.where(valid, A.data[k], 0.0))
    # regularize empty rows (possible on tiny padded boxes)
    diag_fix = jnp.where(jnp.abs(jnp.diagonal(dense)) > 0, 0.0, 1.0)
    dense = dense + jnp.diag(diag_fix)
    return jnp.linalg.inv(dense)


# ---------------------------------------------------------------------------
# cycle + solve
# ---------------------------------------------------------------------------

def _smooth(lev: SLevel, cfg: AmgConfig, b, x, backward: bool,
            x0_zero: bool = False):
    """``x0_zero`` (trace-time) asserts x == 0 on entry: the first residual
    is exactly ``b``, eliding one full A-SpMV of HBM traffic — XLA does NOT
    fold A@0 (verified on optimized HLO), and every cycle level's pre-smooth
    starts from zero.  Numerically identical (b - A@0 == b up to zero
    signs)."""
    sweeps = cfg.nu2 if backward else cfg.nu1
    if sweeps == 0:
        return x
    first = [x0_zero]  # consumed by the FIRST residual below

    def res(x):
        if first[0]:
            first[0] = False
            return b
        return b - dia_spmv(lev.A, x)

    if cfg.smoother == "jacobi":
        for _ in range(sweeps):
            x = x + cfg.omega * lev.dinv * res(x)
        return x
    if cfg.smoother == "mcgs":  # exact red-black on the grid
        order = (False, True) if backward else (True, False)
        for _ in range(sweeps):
            for red_turn in order:
                r = res(x)
                upd = lev.red if red_turn else ~lev.red
                x = x + jnp.where(upd, lev.dinv * r, 0)
        return x
    if cfg.smoother == "tsgs":
        # two-stage Gauss-Seidel (PAPERS.md:9): inner Jacobi series on the
        # strict triangle via one-sided rolled reads (dia_tri_spmv)
        from raptor_tpu.structured.dia import dia_tri_spmv

        for _ in range(sweeps):
            r = res(x)
            z = lev.dinv * r
            for _j in range(cfg.gs_inner):
                z = lev.dinv * (r - dia_tri_spmv(lev.A, z, upper=backward))
            x = x + z
        return x
    if cfg.smoother == "cheb4":
        r = res(x)
        d = (4.0 / 3.0) / lev.cheb_lmax * (lev.dinv * r)
        x = x + d
        for k in range(2, cfg.cheb_degree + 1):
            r = r - dia_spmv(lev.A, d)
            d = ((2 * k - 3) / (2 * k + 1)) * d + (
                (8 * k - 4) / (2 * k + 1) / lev.cheb_lmax
            ) * (lev.dinv * r)
            x = x + d
        return x
    if cfg.smoother == "chebyshev":
        lmax = lev.cheb_lmax
        lmin = lmax / 30.0
        dd = (lmax + lmin) / 2
        cc = (lmax - lmin) / 2
        p = jnp.zeros_like(x)
        alpha = jnp.zeros_like(dd)
        for i in range(cfg.cheb_degree):
            z = lev.dinv * res(x)
            if i == 0:
                p, alpha = z, 1.0 / dd
            else:
                beta = (cc * alpha / 2) ** 2
                alpha = 1.0 / (dd - beta / alpha)
                p = z + beta * p
            x = x + alpha * p
        return x
    raise ValueError(cfg.smoother)


def _slevel(hier: SHierarchy, cfg: AmgConfig, k: int, b):
    lev = hier.levels[k]
    if k == hier.tail_start and hier.tail_op is not None:
        # dense coarse tail: the materialized sub-cycle in one MXU matvec
        with jax.named_scope(f"L{k}.dense_tail"):
            return (hier.tail_op @ b).astype(b.dtype)
    if k == len(hier.levels) - 1:
        with jax.named_scope(f"L{k}.coarse_solve"):
            return hier.coarse_inv @ b
    with jax.named_scope(f"L{k}.presmooth"):
        x = _smooth(lev, cfg, b, jnp.zeros_like(b), backward=False,
                    x0_zero=True)
    with jax.named_scope(f"L{k}.restrict"):
        r = b - dia_spmv(lev.A, x) if cfg.nu1 else b
        rr = dia_spmv(lev.Rt, r)
        rc = (_compact_full(rr, lev.dims) if lev.cdim == FULL_STEP
              else _compact(rr, lev.dims, lev.cdim))
    ec = _slevel(hier, cfg, k + 1, rc)
    if cfg.cycle == "W" and k + 1 < len(hier.levels) - 1:
        Ac = hier.levels[k + 1].A
        ec = ec + _slevel(hier, cfg, k + 1, rc - dia_spmv(Ac, ec))
    with jax.named_scope(f"L{k}.prolong"):
        e = (_expand_full(ec, lev.dims) if lev.cdim == FULL_STEP
             else _expand(ec, lev.dims, lev.cdim))
        x = x + dia_spmv(lev.Pt, e)
    with jax.named_scope(f"L{k}.postsmooth"):
        x = _smooth(lev, cfg, b, x, backward=True)
    return x


def scycle(hier: SHierarchy, b, cfg: AmgConfig | None = None):
    """One structured V-/W-cycle (the preconditioner application)."""
    return _slevel(hier, cfg or hier.config, 0, b)


@partial(jax.jit, static_argnames=("krylov", "maxiter", "precondition"))
def structured_solve(
    hier: SHierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
    precondition: bool = True,
    M_hier: SHierarchy | None = None,
):
    """Jitted structured AMG-PCG solve (one program, no host round-trips).

    ``M_hier``: optional separate hierarchy for the preconditioner — pass a
    bf16-cast copy (``cast_hierarchy``) to halve the cycle's HBM traffic
    while the Krylov operator and residuals stay in ``hier``'s precision.
    """
    A = hier.levels[0].A
    Mh = hier if M_hier is None else M_hier

    def apply_A(x):
        return dia_spmv(A, x)

    if precondition:
        def apply_M(r):
            return scycle(Mh, r).astype(b.dtype)
    else:
        apply_M = lambda r: r

    solver = _krylov_dispatch(krylov)
    return solver(apply_A, b, apply_M, tol=tol, maxiter=maxiter)


# ---------------------------------------------------------------------------
# On-device mixed-precision refinement (df64 residuals)
# ---------------------------------------------------------------------------

def _df64_residual(A: DiaMatrix, xh, xl, bh, bl):
    """r = b - A x with compensated (double-float32) accumulation: exact to
    ~1e-14 relative — certifies 1e-8 without fp64 (utils/df64.py)."""
    from raptor_tpu.utils.df64 import df_add, two_prod

    rh, rl = bh, bl
    for k, o in enumerate(A.linear_offsets()):
        sh = xh if o == 0 else jnp.roll(xh, -o)
        sl = xl if o == 0 else jnp.roll(xl, -o)
        ph, pe = two_prod(A.data[k], sh)
        pe = pe + A.data[k] * sl
        rh, rl = df_add(rh, rl, -ph, -pe)
    return rh, rl


@partial(jax.jit, static_argnames=("maxiter", "outer"))
def structured_solve_refined(
    hier: SHierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 100,
    outer: int = 3,
    M_hier: SHierarchy | None = None,
):
    """Solve to a TRUE <=tol relative residual entirely on device:
    fp32 AMG-PCG inner solves inside an iterative-refinement loop whose
    residuals are computed in compensated double-float32 — one jitted
    program, zero host round-trips (BASELINE.json:5), no fp64 emulation.

    Returns ((x_hi, x_lo), true_relres, total_inner_iterations): the
    solution is a double-float32 pair — collapse with
    ``np.float64(x_hi) + np.float64(x_lo)`` (exact) when a single array is
    needed; collapsing to fp32 alone re-limits the residual to ~1e-7.
    """
    from raptor_tpu.utils.df64 import df_add, df_from

    A = hier.levels[0].A
    Mh = hier if M_hier is None else M_hier

    def apply_A(v):
        return dia_spmv(A, v)

    def apply_M(r):
        return scycle(Mh, r).astype(b.dtype)

    bh, bl = df_from(b)
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    xh = jnp.zeros_like(b)
    xl = jnp.zeros_like(b)

    # residual-gated outer loop (VERDICT r2 weak #5): stop as soon as a
    # round certifies tol instead of always running ``outer`` rounds
    def cond(s):
        xh, xl, rh, rl, relres, it, k = s
        return (k < outer) & (relres > tol)

    def body(s):
        xh, xl, rh, rl, relres, it, k = s
        # inner tolerance: enough progress that `outer` rounds certify tol,
        # floored at what fp32 recurrences can deliver
        inner_tol = jnp.clip(tol / jnp.maximum(relres, 1e-30), 1e-5, 0.9)
        e, info = pcg(apply_A, rh, apply_M, tol=inner_tol, maxiter=maxiter)
        xh, xl = df_add(xh, xl, e, jnp.zeros_like(e))
        rh, rl = _df64_residual(A, xh, xl, bh, bl)
        relres = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
        return xh, xl, rh, rl, relres, it + info.iterations, k + 1

    rh, rl = _df64_residual(A, xh, xl, bh, bl)
    relres0 = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
    xh, xl, rh, rl, true_relres, total_it, _ = jax.lax.while_loop(
        cond, body, (xh, xl, rh, rl, relres0, jnp.int32(0), jnp.int32(0)))
    return (xh, xl), true_relres, total_it
