"""Krylov solvers: preconditioned CG and BiCGStab (SURVEY.md §2b C17).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``krylov/par_cg.cpp`` / ``par_bicgstab.cpp``.

Both run as a single ``lax.while_loop`` with on-device convergence checks —
"no host round-trips per iteration" (BASELINE.json:5).  Per-iteration
residual norms accumulate into a fixed-length on-device buffer returned
after the loop (SURVEY.md §5.5: observability without host syncs).
Breakdown guards (p^T Ap <= 0, rho ~ 0) set status codes in the returned
info pytree (SURVEY.md §5.3: solver-level failure detection).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["KrylovInfo", "pcg", "bicgstab"]

STATUS_CONVERGED = 0
STATUS_MAXITER = 1
STATUS_BREAKDOWN = 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["iterations", "status", "relres", "res_hist"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class KrylovInfo:
    iterations: jax.Array  # int32
    status: jax.Array  # int32, STATUS_*
    relres: jax.Array  # final relative residual
    res_hist: jax.Array  # (maxiter+1,) relative residual per iteration (nan-padded)


def _identity(r):
    return r


def pcg(
    apply_A: Callable,
    b: jax.Array,
    apply_M: Callable = _identity,
    tol: float = 1e-8,
    maxiter: int = 200,
    x0: jax.Array | None = None,
    dot_fn: Callable = jnp.vdot,
):
    """Preconditioned conjugate gradients. Returns (x, KrylovInfo).

    Convergence test: ||r||_2 <= tol * ||b||_2, evaluated on device.
    ``dot_fn`` is the inner product — the distributed path passes a
    psum-reducing dot (the only global sync per iteration, SURVEY.md §3b).
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_A(x) if x0 is not None else b
    z = apply_M(r)
    p = z
    rz = dot_fn(r, z)
    bnorm2 = dot_fn(b, b)
    bnorm2 = jnp.where(bnorm2 > 0, bnorm2, 1.0)
    tol2 = (tol * tol) * bnorm2
    hist = jnp.full(maxiter + 1, jnp.nan, b.dtype)
    hist = hist.at[0].set(jnp.sqrt(dot_fn(r, r) / bnorm2))

    def cond(s):
        x, r, z, p, rz, it, status, hist = s
        return (status < 0) & (it < maxiter)

    def body(s):
        x, r, z, p, rz, it, status, hist = s
        Ap = apply_A(p)
        pAp = dot_fn(p, Ap)
        breakdown = pAp <= 0
        alpha = jnp.where(breakdown, 0.0, rz / jnp.where(pAp != 0, pAp, 1.0))
        x = x + alpha * p
        r = r - alpha * Ap
        rr = dot_fn(r, r)
        it = it + 1
        hist = hist.at[it].set(jnp.sqrt(rr / bnorm2))
        converged = rr <= tol2
        status = jnp.where(
            breakdown, STATUS_BREAKDOWN, jnp.where(converged, STATUS_CONVERGED, -1)
        ).astype(jnp.int32)
        z = apply_M(r)
        rz_new = dot_fn(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return x, r, z, p, rz_new, it, status, hist

    init = (x, r, z, p, rz, jnp.int32(0), jnp.int32(-1), hist)
    x, r, z, p, rz, it, status, hist = jax.lax.while_loop(cond, body, init)
    status = jnp.where(status < 0, STATUS_MAXITER, status)
    info = KrylovInfo(
        iterations=it,
        status=status,
        relres=jnp.sqrt(dot_fn(r, r) / bnorm2),
        res_hist=hist,
    )
    return x, info


def bicgstab(
    apply_A: Callable,
    b: jax.Array,
    apply_M: Callable = _identity,
    tol: float = 1e-8,
    maxiter: int = 200,
    x0: jax.Array | None = None,
    dot_fn: Callable = jnp.vdot,
):
    """Preconditioned BiCGStab (right preconditioning). Returns (x, KrylovInfo)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_A(x) if x0 is not None else b
    rhat = r
    rho = dot_fn(rhat, r)
    p = r
    bnorm2 = dot_fn(b, b)
    bnorm2 = jnp.where(bnorm2 > 0, bnorm2, 1.0)
    tol2 = (tol * tol) * bnorm2
    eps = jnp.asarray(1e-30, b.dtype)
    hist = jnp.full(maxiter + 1, jnp.nan, b.dtype)
    hist = hist.at[0].set(jnp.sqrt(dot_fn(r, r) / bnorm2))

    def cond(s):
        *_, status, it, hist = s
        return (status < 0) & (it < maxiter)

    def body(s):
        x, r, p, rho, status, it, hist = s
        ph = apply_M(p)
        v = apply_A(ph)
        rhv = dot_fn(rhat, v)
        bd1 = jnp.abs(rhv) < eps
        alpha = rho / jnp.where(rhv != 0, rhv, 1.0)
        sres = r - alpha * v
        sh = apply_M(sres)
        t = apply_A(sh)
        tt = dot_fn(t, t)
        omega = dot_fn(t, sres) / jnp.where(tt != 0, tt, 1.0)
        x = x + alpha * ph + omega * sh
        r = sres - omega * t
        rr = dot_fn(r, r)
        it = it + 1
        hist = hist.at[it].set(jnp.sqrt(rr / bnorm2))
        rho_new = dot_fn(rhat, r)
        bd2 = jnp.abs(rho_new) < eps
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
            alpha / jnp.where(omega != 0, omega, 1.0)
        )
        p = r + beta * (p - omega * v)
        converged = rr <= tol2
        status = jnp.where(
            converged,
            STATUS_CONVERGED,
            jnp.where(bd1 | bd2, STATUS_BREAKDOWN, -1),
        ).astype(jnp.int32)
        return x, r, p, rho_new, status, it, hist

    init = (x, r, p, rho, jnp.int32(-1), jnp.int32(0), hist)
    x, r, p, rho, status, it, hist = jax.lax.while_loop(cond, body, init)
    status = jnp.where(status < 0, STATUS_MAXITER, status)
    info = KrylovInfo(
        iterations=it,
        status=status,
        relres=jnp.sqrt(dot_fn(r, r) / bnorm2),
        res_hist=hist,
    )
    return x, info
