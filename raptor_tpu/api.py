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
from raptor_tpu.core.ell import EllMatrix, pad_vector
from raptor_tpu.ops.sparse_ops import spmv
from raptor_tpu.setup.hierarchy import Hierarchy, build_hierarchy, hierarchy_stats
from raptor_tpu.solve.cycle import cycle
from raptor_tpu.solve.krylov import bicgstab, pcg

__all__ = ["setup", "solve", "solve_hier", "AmgConfig", "SolveConfig", "PRESETS"]

_DTYPES = {"float32": jnp.float32, "float64": jnp.float64}


def setup(A, config: AmgConfig = AmgConfig(), dtype=jnp.float32) -> Hierarchy:
    """Build the AMG hierarchy (host-driven level loop, on-device level work)."""
    if config.splitting in ("aggregation",) or config.interp == "smoothed":
        from raptor_tpu.setup.aggregation import build_sa_hierarchy

        return build_sa_hierarchy(A, config, dtype=dtype)
    return build_hierarchy(A, config, dtype=dtype)


@partial(jax.jit, static_argnames=("maxiter", "outer"))
def solve_hier_refined(
    hier: Hierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 100,
    outer: int = 3,
    b_lo: jax.Array | None = None,
):
    """Solve to a TRUE <=tol relative residual entirely on device: fp32
    AMG-PCG inner solves inside compensated-double-float32 iterative
    refinement (utils/df64.py) — one jitted program, no host round-trips,
    no fp64 (the algebraic-engine counterpart of
    structured_solve_refined).  Returns ((x_hi, x_lo), true_relres, iters).
    """
    from raptor_tpu.utils.df64 import df_add, df_from, two_prod

    A = hier.levels[0].A

    def apply_A(v):
        return spmv(A, v)

    def apply_M(r):
        return cycle(hier, r)

    def residual(xh, xl, bh, bl):
        rh, rl = bh, bl
        for k in range(A.K):
            gh = jnp.take(xh, A.cols[k], axis=0)
            gl = jnp.take(xl, A.cols[k], axis=0)
            ph, pe = two_prod(A.data[k], gh)
            pe = pe + A.data[k] * gl
            rh, rl = df_add(rh, rl, -ph, -pe)
        return rh, rl

    bh, bl = (b, b_lo) if b_lo is not None else df_from(b)
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    xh = jnp.zeros_like(b)
    xl = jnp.zeros_like(b)
    total_it = jnp.int32(0)
    for _ in range(outer):
        rh, rl = residual(xh, xl, bh, bl)
        relres = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
        inner_tol = jnp.clip(tol / jnp.maximum(relres, 1e-30), 1e-5, 0.9)
        e, info = pcg(apply_A, rh, apply_M, tol=inner_tol, maxiter=maxiter)
        total_it = total_it + info.iterations
        xh, xl = df_add(xh, xl, e, jnp.zeros_like(e))
    rh, rl = residual(xh, xl, bh, bl)
    true_relres = jnp.sqrt(jnp.vdot(rh, rh)) / bnorm
    return (xh, xl), true_relres, total_it


@partial(jax.jit, static_argnames=("krylov", "maxiter", "precondition"))
def solve_hier(
    hier: Hierarchy,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
    precondition: bool = True,
    x0: jax.Array | None = None,
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

    if not solve_config.refine:
        bd = pad_vector(b.astype(dtype), A0.n_rows_pad)
        x, info = solve_hier(
            hier, bd, tol=solve_config.tol, maxiter=solve_config.maxiter,
            krylov=config_krylov(solve_config),
        )
        return _finish(x, info, n, hier)

    if solve_config.refine_device and solve_config.krylov == "cg":
        # fully on-device refinement with compensated-fp32 residuals;
        # b enters as an exact df64 pair so fp64 inputs are certified
        # against the UNROUNDED right-hand side
        b_hi = b.astype(np.float32)
        b_lo = (b - b_hi.astype(np.float64)).astype(np.float32)
        bd = pad_vector(b_hi, A0.n_rows_pad)
        bdl = pad_vector(b_lo, A0.n_rows_pad)
        (xh, xl), relres, iters = solve_hier_refined(
            hier, bd, tol=solve_config.tol, maxiter=solve_config.maxiter,
            b_lo=bdl,
        )
        x64 = (np.asarray(xh[:n], np.float64)
               + np.asarray(xl[:n], np.float64))
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
    return x64, out_info


def config_krylov(sc: SolveConfig) -> str:
    return sc.krylov


def _finish(x, info, n, hier):
    out_info = {
        "iterations": int(info.iterations),
        "relres": float(info.relres),
        "status": int(info.status),
        "res_hist": np.asarray(info.res_hist),
        "stats": hierarchy_stats(hier),
    }
    return np.asarray(x[:n]), out_info
