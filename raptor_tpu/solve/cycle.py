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

import jax.numpy as jnp

from typing import TYPE_CHECKING

from raptor_tpu.config import AmgConfig
from raptor_tpu.ops.sparse_ops import spmv
from raptor_tpu.solve.smoothers import chebyshev, chebyshev4, jacobi, multicolor_gs

if TYPE_CHECKING:  # avoid a circular import (hierarchy imports smoothers)
    from raptor_tpu.setup.hierarchy import Hierarchy, Level

__all__ = ["cycle", "make_preconditioner"]


def apply_op(lev: Level, x):
    """A @ x through the level's block layout when present (BASELINE.json:5
    blocked-sparse layouts sized for the MXU), else the scalar ELL path."""
    if lev.Abell is not None:
        from raptor_tpu.core.bell import bell_spmv

        return bell_spmv(lev.Abell, x)
    return spmv(lev.A, x)


def _smooth(lev: Level, cfg: AmgConfig, b, x, backward: bool):
    sweeps = cfg.nu2 if backward else cfg.nu1
    if sweeps == 0:
        return x
    if cfg.smoother == "block_jacobi":
        if lev.Abell is None:  # level without block alignment: scalar Jacobi
            return jacobi(lev.A, lev.dinv, b, x, omega=cfg.omega,
                          sweeps=sweeps)
        from raptor_tpu.core.bell import block_jacobi

        return block_jacobi(lev.Abell, lev.binv, b, x, omega=cfg.omega,
                            sweeps=sweeps)
    if cfg.smoother == "block_cheb":
        if lev.Abell is None:  # fall back to scalar-diag 4th-kind Chebyshev
            return chebyshev4(lev.A, lev.dinv, b, x, lev.cheb_lmax,
                              degree=cfg.cheb_degree)
        from raptor_tpu.core.bell import block_chebyshev4

        return block_chebyshev4(lev.Abell, lev.binv, b, x, lev.cheb_lmax,
                                degree=cfg.cheb_degree)
    if cfg.smoother == "jacobi":
        return jacobi(lev.A, lev.dinv, b, x, omega=cfg.omega, sweeps=sweeps)
    if cfg.smoother == "mcgs":
        return multicolor_gs(
            lev.A, lev.dinv, b, x, lev.color, ncolors=lev.ncolors,
            sweeps=sweeps, backward=backward,
        )
    if cfg.smoother == "chebyshev":
        lmax = lev.cheb_lmax
        return chebyshev(
            lev.A, lev.dinv, b, x, lmax / 30.0, lmax, degree=cfg.cheb_degree
        )
    if cfg.smoother == "cheb4":
        return chebyshev4(lev.A, lev.dinv, b, x, lev.cheb_lmax,
                          degree=cfg.cheb_degree)
    raise ValueError(f"unknown smoother: {cfg.smoother}")


def _coarse_solve(hier: Hierarchy, b):
    return hier.coarse_inv @ b


def _level(hier: Hierarchy, cfg: AmgConfig, k: int, b):
    """One cycle at level k with zero initial guess; returns x ~ A_k^{-1} b."""
    import jax

    lev = hier.levels[k]
    if k == len(hier.levels) - 1:
        with jax.named_scope(f"L{k}.coarse_solve"):
            return _coarse_solve(hier, b)
    with jax.named_scope(f"L{k}.presmooth"):
        x = _smooth(lev, cfg, b, jnp.zeros_like(b), backward=False)
    with jax.named_scope(f"L{k}.restrict"):
        r = b - apply_op(lev, x)
        rc = spmv(lev.R, r)
    ec = _level(hier, cfg, k + 1, rc)
    if cfg.cycle == "W" and k + 1 < len(hier.levels) - 1:
        # second coarse visit on the updated coarse residual (gamma = 2)
        rc2 = rc - apply_op(hier.levels[k + 1], ec)
        ec = ec + _level(hier, cfg, k + 1, rc2)
    with jax.named_scope(f"L{k}.prolong"):
        x = x + spmv(lev.P, ec)
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
