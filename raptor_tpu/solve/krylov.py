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

__all__ = ["KrylovInfo", "pcg", "bicgstab", "gmres", "krylov_dispatch"]


def krylov_dispatch(name: str, restart: int | None = None) -> Callable:
    """Solver lookup shared by every engine (algebraic, structured,
    distributed): 'cg' | 'bicgstab' | 'gmres' | 'fgmres'.  ``restart``
    overrides the GMRES restart length (ignored by cg/bicgstab)."""
    table = {"cg": pcg, "bicgstab": bicgstab, "gmres": gmres,
             "fgmres": partial(gmres, flexible=True)}
    if name not in table:
        raise ValueError(f"unknown krylov: {name!r} (one of {sorted(table)})")
    fn = table[name]
    if restart is not None and name in ("gmres", "fgmres"):
        fn = partial(fn, restart=restart)
    return fn

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


def gmres(
    apply_A: Callable,
    b: jax.Array,
    apply_M: Callable = _identity,
    tol: float = 1e-8,
    maxiter: int = 200,
    restart: int = 30,
    x0: jax.Array | None = None,
    dot_fn: Callable = jnp.vdot,
    flexible: bool = False,
):
    """Restarted GMRES(m) with right preconditioning. Returns (x, KrylovInfo).

    Capability: the nonsymmetric Krylov companion to CG/BiCGStab (the AMG
    libraries this framework reproduces pair their multigrid with a GMRES
    outer solve for convection-dominated / nonsymmetric operators).

    TPU-first design choices:
      * Orthogonalization is CGS2 (classical Gram-Schmidt, reapplied): two
        masked (m+1, n) matvecs per Arnoldi step instead of MGS's sequential
        dot chain — they lower to MXU ``dot_general`` on device and, in the
        distributed case, to ONE fused collective per pass (``dot_fn`` is
        vmapped over basis rows, so a psum-dot reduces all m+1 coefficients
        in a single psum).  CGS2 matches MGS stability for Arnoldi.
      * Givens rotations, the triangular solve, and the convergence test all
        run on device — the nested ``while_loop``s make the whole solve one
        program with no host round-trips per iteration (BASELINE.json:5).
      * ``restart`` is static, so V/Z/R have fixed shapes under jit.

    Right preconditioning keeps the monitored quantity equal to the TRUE
    residual norm ||b - A x|| (unlike left preconditioning).  With
    ``flexible=True`` this is FGMRES: the preconditioned directions
    Z[j] = M(V[j]) are stored and the solution update uses Z, which tolerates
    a nonlinear / iteration-varying preconditioner at (m, n) extra memory.
    """
    n = b.shape[0]
    m = int(min(restart, maxiter))
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm2 = dot_fn(b, b)
    bnorm2 = jnp.where(bnorm2 > 0, bnorm2, 1.0)
    tol_r = tol * jnp.sqrt(bnorm2)
    eps = jnp.asarray(1e-30, b.dtype)
    hist0 = jnp.full(maxiter + 1, jnp.nan, b.dtype)

    def mdot(V, w):
        # all basis coefficients in one shot; vmap turns a psum-dot into a
        # single batched psum under shard_map
        return jax.vmap(lambda v: dot_fn(v, w))(V)

    def outer_cond(s):
        x, it, status, hist = s
        return (status < 0) & (it < maxiter)

    def outer_body(s):
        x, it, status, hist = s
        r = b - apply_A(x)
        beta = jnp.sqrt(dot_fn(r, r))
        hist = hist.at[it].set(beta / jnp.sqrt(bnorm2))
        V = jnp.zeros((m + 1, n), b.dtype)
        V = V.at[0].set(r / jnp.where(beta > 0, beta, 1.0))
        Z = jnp.zeros((m if flexible else 1, n), b.dtype)
        R = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros(m, b.dtype)
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
        done0 = beta <= tol_r

        def inner_cond(c):
            V, Z, R, cs, sn, g, j, done, hist = c
            return (~done) & (j < m) & (it + j < maxiter)

        def inner_body(c):
            V, Z, R, cs, sn, g, j, done, hist = c
            zj = apply_M(V[j])
            if flexible:
                Z = Z.at[j].set(zj)
            w = apply_A(zj)
            mask = (jnp.arange(m + 1) <= j).astype(b.dtype)
            h = mdot(V, w) * mask
            w = w - h @ V
            h2 = mdot(V, w) * mask  # CGS2: one reorthogonalization pass
            w = w - h2 @ V
            h = h + h2
            hj1 = jnp.sqrt(dot_fn(w, w))
            V = V.at[j + 1].set(w / jnp.where(hj1 > eps, hj1, 1.0))
            h = h.at[j + 1].set(hj1)

            # apply the stored rotations to the new column (masked fori: only
            # i < j are live; the rest are identity because cs=1 is not set —
            # guard explicitly with where)
            def rot_body(i, hh):
                live = i < j
                hi, hi1 = hh[i], hh[i + 1]
                ni = cs[i] * hi + sn[i] * hi1
                ni1 = -sn[i] * hi + cs[i] * hi1
                hh = hh.at[i].set(jnp.where(live, ni, hi))
                return hh.at[i + 1].set(jnp.where(live, ni1, hi1))

            h = jax.lax.fori_loop(0, m, rot_body, h)
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c_new = jnp.where(denom > eps, h[j] / jnp.where(denom > 0, denom, 1.0), 1.0)
            s_new = jnp.where(denom > eps, h[j + 1] / jnp.where(denom > 0, denom, 1.0), 0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            R = R.at[:, j].set(h)
            res = jnp.abs(s_new * g[j])  # |g[j+1]| after the rotation
            g = g.at[j + 1].set(-s_new * g[j])
            g = g.at[j].set(c_new * g[j])
            hist = hist.at[it + j + 1].set(res / jnp.sqrt(bnorm2))
            done = res <= tol_r
            return V, Z, R, cs, sn, g, j + 1, done, hist

        init = (V, Z, R, cs, sn, g, jnp.int32(0), done0, hist)
        V, Z, R, cs, sn, g, j, done, hist = jax.lax.while_loop(
            inner_cond, inner_body, init)

        # y = R[:m,:m]^{-1} g[:m] restricted to the j steps taken: unused
        # columns are zero — put 1 on their diagonal and 0 in g so the
        # triangular solve returns y_i = 0 there
        idx = jnp.arange(m)
        Rm = R[:m, :m] + jnp.diag(jnp.where(idx >= j, 1.0, 0.0).astype(b.dtype))
        gm = jnp.where(idx < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        if flexible:
            x = x + y @ Z
        else:
            x = x + apply_M(y @ V[:m])
        it = it + j
        status = jnp.where(done, STATUS_CONVERGED,
                           jnp.where(j == 0, STATUS_BREAKDOWN, -1)
                           ).astype(jnp.int32)
        return x, it, status, hist

    init = (x, jnp.int32(0), jnp.int32(-1), hist0)
    x, it, status, hist = jax.lax.while_loop(outer_cond, outer_body, init)
    status = jnp.where(status < 0, STATUS_MAXITER, status)
    r = b - apply_A(x)
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
