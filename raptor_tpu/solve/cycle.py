"""Multigrid cycles (SURVEY.md §2b C16, §3b stack 3).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``par_multilevel`` cycle().

The level count is static after setup, so V-/W-cycles are unrolled over
levels at trace time — one jitted program, fully on device, no host
round-trips (BASELINE.json:5).  The coarsest level is a dense Cholesky
back-substitution precomputed at setup (SURVEY.md §7 hard part 5: tiny
coarse matrices are latency-bound, so direct-solve them).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from typing import TYPE_CHECKING

from raptor_tpu.config import AmgConfig
from raptor_tpu.ops.sparse_ops import spmv
from raptor_tpu.solve.smoothers import (
    chebyshev, chebyshev4, jacobi, multicolor_gs, triangular_apply,
    two_stage_gs)

if TYPE_CHECKING:  # avoid a circular import (hierarchy imports smoothers)
    from raptor_tpu.setup.hierarchy import Hierarchy, Level

__all__ = ["cycle", "make_preconditioner"]


def apply_op(lev: Level, x):
    """A @ x through the level's fast layout when present — BlockELL
    (BASELINE.json:5 blocked-sparse layouts sized for the MXU) or the
    banded dynamic-gather layout (general CSR) — else the scalar ELL path.
    All layouts share the level's vector ordering, so this is a drop-in."""
    if lev.Abell is not None:
        from raptor_tpu.core.bell import bell_spmv

        return bell_spmv(lev.Abell, x)
    if lev.Ahyb is not None:
        from raptor_tpu.core.hybrid import hybrid_spmv_ro

        return hybrid_spmv_ro(lev.Ahyb, x)
    if lev.Aband is not None:
        from raptor_tpu.core.hybrid import banded_spmv, banded_spmv_ro

        if lev.Aband.reordered:
            # RCM'd coarse level (banded_from_ell(reorder=True)): the layout
            # ordering differs from the level's vector ordering — two O(n)
            # takes bracket the kernel
            return banded_spmv(lev.Aband, x)
        return banded_spmv_ro(lev.Aband, x)
    return spmv(lev.A, x)


def _smooth_sp(lev: Level, cfg: AmgConfig, b, x, backward: bool, sp,
               x0_zero: bool = False):
    """Scalar smoothers expressed against an operator-apply closure ``sp``
    (mirrors parallel.dist._dist_smooth) — used when the level's operator
    runs through a fast layout instead of the scalar ELL.

    ``x0_zero`` (trace-time) asserts x == 0 on entry: the first residual is
    exactly ``b``, eliding one operator apply — XLA does not fold A@0
    (verified on optimized HLO), and every cycle's pre-smooth starts from
    zero, so this is one full SpMV of HBM traffic per level per cycle."""
    sweeps = cfg.nu2 if backward else cfg.nu1
    if sweeps == 0:
        return x
    first = [x0_zero]  # consumed by the FIRST residual below

    def res(x):
        if first[0]:
            first[0] = False
            return b
        return b - sp(x)

    if cfg.smoother == "jacobi":
        for _ in range(sweeps):
            x = x + cfg.omega * lev.dinv * res(x)
        return x
    if cfg.smoother == "mcgs":
        order = list(range(lev.ncolors))
        if backward:
            order.reverse()
        for _ in range(sweeps):
            for c in order:
                r = res(x)
                x = x + jnp.where(lev.color == c, lev.dinv * r, 0)
        return x
    if cfg.smoother == "tsgs":
        # two-stage GS: outer residual through the fast layout, inner
        # triangular Jacobi series on the scalar ELL (same matrix, same
        # ordering — apply_op's fallback path)
        for _ in range(sweeps):
            r = res(x)
            z = lev.dinv * r
            for _j in range(cfg.gs_inner):
                z = lev.dinv * (r - triangular_apply(lev.A, z, upper=backward))
            x = x + z
        return x
    if cfg.smoother == "chebyshev":
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
    if cfg.smoother == "cheb4":
        r = res(x)
        d = (4.0 / 3.0) / lev.cheb_lmax * (lev.dinv * r)
        x = x + d
        for k in range(2, cfg.cheb_degree + 1):
            r = r - sp(d)
            d = ((2 * k - 3) / (2 * k + 1)) * d + (
                (8 * k - 4) / (2 * k + 1) / lev.cheb_lmax
            ) * (lev.dinv * r)
            x = x + d
        return x
    raise ValueError(f"unknown smoother for banded layout: {cfg.smoother}")


def apply_transfer(band, E, v):
    """Transfer (P or R) application through the rectangular banded layout
    when the level carries one, else the gather ELL path.  The banded plan's
    padded column space can exceed E.n_cols_pad by one page tail."""
    if band is None:
        return spmv(E, v)
    from raptor_tpu.core.hybrid import rect_banded_spmv

    n_cols = band.meta[2]
    if v.shape[0] < n_cols:
        v = jnp.concatenate([v, jnp.zeros(n_cols - v.shape[0], v.dtype)])
    return rect_banded_spmv(band, v)


def _smooth(lev: Level, cfg: AmgConfig, b, x, backward: bool,
            x0_zero: bool = False):
    sweeps = cfg.nu2 if backward else cfg.nu1
    if sweeps == 0:
        return x
    if lev.Aband is not None or lev.Ahyb is not None:
        return _smooth_sp(lev, cfg, b, x, backward,
                          sp=lambda v: apply_op(lev, v), x0_zero=x0_zero)
    if cfg.smoother == "block_jacobi":
        if lev.Abell is None:  # level without block alignment: scalar Jacobi
            return jacobi(lev.A, lev.dinv, b, x, omega=cfg.omega,
                          sweeps=sweeps, x0_zero=x0_zero)
        from raptor_tpu.core.bell import block_jacobi

        return block_jacobi(lev.Abell, lev.binv, b, x, omega=cfg.omega,
                            sweeps=sweeps, x0_zero=x0_zero)
    if cfg.smoother == "block_cheb":
        if lev.Abell is None:  # fall back to scalar-diag 4th-kind Chebyshev
            return chebyshev4(lev.A, lev.dinv, b, x, lev.cheb_lmax,
                              degree=cfg.cheb_degree, x0_zero=x0_zero)
        from raptor_tpu.core.bell import block_chebyshev4

        return block_chebyshev4(lev.Abell, lev.binv, b, x, lev.cheb_lmax,
                                degree=cfg.cheb_degree, x0_zero=x0_zero)
    if cfg.smoother == "jacobi":
        return jacobi(lev.A, lev.dinv, b, x, omega=cfg.omega, sweeps=sweeps,
                      x0_zero=x0_zero)
    if cfg.smoother == "mcgs":
        return multicolor_gs(
            lev.A, lev.dinv, b, x, lev.color, ncolors=lev.ncolors,
            sweeps=sweeps, backward=backward, x0_zero=x0_zero,
        )
    if cfg.smoother == "tsgs":
        return two_stage_gs(lev.A, lev.dinv, b, x, sweeps=sweeps,
                            inner=cfg.gs_inner, backward=backward,
                            x0_zero=x0_zero)
    if cfg.smoother == "chebyshev":
        lmax = lev.cheb_lmax
        return chebyshev(
            lev.A, lev.dinv, b, x, lmax / 30.0, lmax, degree=cfg.cheb_degree,
            x0_zero=x0_zero,
        )
    if cfg.smoother == "cheb4":
        return chebyshev4(lev.A, lev.dinv, b, x, lev.cheb_lmax,
                          degree=cfg.cheb_degree, x0_zero=x0_zero)
    raise ValueError(f"unknown smoother: {cfg.smoother}")


def _coarse_solve(hier: Hierarchy, b):
    return hier.coarse_inv @ b


def _level(hier: Hierarchy, cfg: AmgConfig, k: int, b):
    """One cycle at level k with zero initial guess; returns x ~ A_k^{-1} b."""
    import jax

    lev = hier.levels[k]
    if k == getattr(hier, "tail_start", -1) and hier.tail_op is not None:
        # dense coarse tail: the materialized sub-cycle in one MXU matvec
        with jax.named_scope(f"L{k}.dense_tail"):
            return (hier.tail_op @ b).astype(b.dtype)
    if k == len(hier.levels) - 1:
        with jax.named_scope(f"L{k}.coarse_solve"):
            return _coarse_solve(hier, b)
    with jax.named_scope(f"L{k}.presmooth"):
        x = _smooth(lev, cfg, b, jnp.zeros_like(b), backward=False,
                    x0_zero=True)
    with jax.named_scope(f"L{k}.restrict"):
        r = b - apply_op(lev, x) if cfg.nu1 else b
        if lev.Tgeo is not None:
            from raptor_tpu.core.hybrid import geo_restrict

            rc = geo_restrict(lev.Tgeo, r)
        else:
            rc = apply_transfer(lev.Rband, lev.R, r)
    ec = _level(hier, cfg, k + 1, rc)
    if cfg.cycle == "W" and k + 1 < len(hier.levels) - 1:
        # second coarse visit on the updated coarse residual (gamma = 2)
        rc2 = rc - apply_op(hier.levels[k + 1], ec)
        ec = ec + _level(hier, cfg, k + 1, rc2)
    with jax.named_scope(f"L{k}.prolong"):
        if lev.Tgeo is not None:
            from raptor_tpu.core.hybrid import geo_prolong

            x = x + geo_prolong(lev.Tgeo, ec)
        else:
            x = x + apply_transfer(lev.Pband, lev.P, ec)
    with jax.named_scope(f"L{k}.postsmooth"):
        x = _smooth(lev, cfg, b, x, backward=True)
    return x


def cycle(hier: Hierarchy, b, cfg: AmgConfig | None = None):
    """One V- or W-cycle applied to b (zero initial guess) — the AMG
    preconditioner application M^{-1} b."""
    return _level(hier, cfg or hier.config, 0, b)


def make_preconditioner(hier: Hierarchy):
    """Closure form used by the Krylov wrappers."""
    cfg = hier.config

    def M(r):
        return _level(hier, cfg, 0, r)

    return M


@partial(jax.jit, static_argnames=("cfg",))
def _level_dense(lev: Level, cfg: AmgConfig, Meff):
    """Dense matrix of ONE level's cycle body with the recursion replaced
    by the (already dense) coarse map ``Meff``.  Composing the tail
    bottom-up from per-level bodies keeps each compiled program small
    (one nested batched cycle program took minutes to compile).  Callers
    strip banded layouts first — the Pallas gather kernel doesn't vmap,
    and the scalar ELL path applies the SAME matrix."""
    eye = jnp.eye(lev.A.n_rows_pad, dtype=lev.dinv.dtype)

    def step(c):
        # no x0_zero fold here: setup-time vmapped build, identical result;
        # an unchanged trace keeps the compile-cache entries for setup valid
        x = _smooth(lev, cfg, c, jnp.zeros_like(c), backward=False)
        r = c - apply_op(lev, x)
        rc = spmv(lev.R, r)
        ec = Meff @ rc
        x = x + spmv(lev.P, ec)
        return _smooth(lev, cfg, c, x, backward=True)

    return jax.vmap(step)(eye).T


@jax.jit
def _dense_ell(A) -> jax.Array:
    """Dense matrix of an ELL operator (for the W-cycle coarse revisit)."""
    eye = jnp.eye(A.n_rows_pad, dtype=jnp.float32)
    return jax.vmap(lambda c: spmv(A, c))(eye).T


def materialize_tail(hier: Hierarchy, max_n: int,
                     min_start: int = 1) -> "Hierarchy":
    """Fold the coarse tail of the cycle into one dense operator: every
    level below the first one (never the fine level) with padded size
    <= max_n — smoothers, transfers, recursion, coarse solve — collapses
    into tail_op, replacing dozens of latency-bound tiny SpMVs with one
    MXU matvec (the algebraic counterpart of
    structured.solver.materialize_tail; docs/DESIGN.md §4)."""
    import dataclasses

    ts = next((i for i in range(min_start, len(hier.levels))
               if hier.levels[i].A.n_rows_pad <= max_n), None)
    if ts is None or ts >= len(hier.levels) - 1:
        return hier  # nothing to fold (coarsest is already one dense matvec)
    cfg = hier.config
    M = hier.coarse_inv.astype(hier.levels[ts].dinv.dtype)
    for k in range(len(hier.levels) - 2, ts - 1, -1):
        if cfg.cycle == "W" and k + 1 < len(hier.levels) - 1:
            # ec = M rc + M (rc - A' M rc)  ->  Meff = 2M - M A' M
            Ad = _dense_ell(hier.levels[k + 1].A)
            Meff = 2.0 * M - M @ Ad @ M
        else:
            Meff = M
        lev = dataclasses.replace(hier.levels[k], Aband=None, Pband=None,
                                  Rband=None, Ahyb=None)
        M = _level_dense(lev, cfg, Meff)
    return dataclasses.replace(hier, tail_op=M, tail_start=ts)
