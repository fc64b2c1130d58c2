"""GMRES / FGMRES unit tests (solve/krylov.py).

The restarted-GMRES capability is the nonsymmetric Krylov companion to
CG/BiCGStab (SURVEY.md §2b C17); convergence is checked against NumPy
dense solves and scipy.sparse oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raptor_tpu.solve.krylov import (
    STATUS_CONVERGED,
    STATUS_MAXITER,
    bicgstab,
    gmres,
    krylov_dispatch,
    pcg,
)


def _random_nonsym(n, seed=0, dtype=np.float64):
    """Diagonally dominant nonsymmetric matrix (well-posed, not normal)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) * 0.3
    A += np.diag(np.abs(A).sum(1) + 1.0)
    return A.astype(dtype)


def test_gmres_spd_matches_dense_solve():
    n = 64
    rng = np.random.default_rng(1)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    A = (Q * (1.0 + np.arange(n))) @ Q.T  # SPD, cond ~ n
    b = rng.standard_normal(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    x, info = jax.jit(lambda b: gmres(apply_A, b, tol=1e-10, maxiter=200))(
        jnp.asarray(b))
    assert int(info.status) == STATUS_CONVERGED
    x_ref = np.linalg.solve(A, b)
    assert np.linalg.norm(np.asarray(x) - x_ref) <= 1e-8 * np.linalg.norm(x_ref)


def test_gmres_nonsymmetric_converges():
    n = 96
    A = _random_nonsym(n, seed=2)
    b = np.random.default_rng(3).standard_normal(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    x, info = gmres(apply_A, jnp.asarray(b), tol=1e-10, maxiter=150)
    assert int(info.status) == STATUS_CONVERGED
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b)
    # true-residual property of right preconditioning: the monitored relres
    # equals the externally computed one
    assert np.isclose(float(info.relres),
                      np.linalg.norm(r) / np.linalg.norm(b),
                      rtol=1e-6, atol=1e-12)


def test_gmres_restart_smaller_than_needed():
    """restart=8 on a problem needing ~40 Krylov dims still converges."""
    n = 80
    A = _random_nonsym(n, seed=4)
    b = np.ones(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    x, info = gmres(apply_A, jnp.asarray(b), tol=1e-9, maxiter=400, restart=8)
    assert int(info.status) == STATUS_CONVERGED
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_gmres_right_preconditioned():
    """Diagonal (Jacobi) right preconditioner: fewer iterations, and the
    returned residual is the TRUE residual (right preconditioning)."""
    n = 120
    rng = np.random.default_rng(5)
    d = 10.0 ** rng.uniform(-2, 2, n)  # badly scaled diagonal
    # row-scaled nonsymmetric perturbation keeps every row diagonally
    # dominant (A = D (I + 0.3 N/sqrt(n)) is well-posed; raw D + N is not)
    A = np.diag(d) @ (np.eye(n)
                      + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n))
    b = rng.standard_normal(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    dinv = jnp.asarray(1.0 / d)
    x0, info0 = gmres(apply_A, jnp.asarray(b), tol=1e-9, maxiter=300)
    x1, info1 = gmres(apply_A, jnp.asarray(b), apply_M=lambda r: dinv * r,
                      tol=1e-9, maxiter=300)
    assert int(info1.status) == STATUS_CONVERGED
    assert int(info1.iterations) < int(info0.iterations)
    r = b - A @ np.asarray(x1)
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_fgmres_variable_preconditioner():
    """FGMRES tolerates an iteration-varying preconditioner (a few CG steps
    on the symmetric part) — plain GMRES's right-precond update assumes a
    fixed linear M, FGMRES stores Z and does not."""
    n = 64
    A = _random_nonsym(n, seed=6)
    As = 0.5 * (A + A.T)
    b = np.random.default_rng(7).standard_normal(n)
    apply_A = lambda v: jnp.asarray(A) @ v

    def apply_M(r):  # 3 CG steps: a genuinely nonlinear map of r
        x, _ = pcg(lambda v: jnp.asarray(As) @ v, r, tol=0.0, maxiter=3)
        return x

    x, info = gmres(apply_A, jnp.asarray(b), apply_M=apply_M, tol=1e-9,
                    maxiter=200, flexible=True)
    assert int(info.status) == STATUS_CONVERGED
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_gmres_maxiter_status():
    n = 64
    A = _random_nonsym(n, seed=8)
    b = np.ones(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    x, info = gmres(apply_A, jnp.asarray(b), tol=1e-14, maxiter=3)
    assert int(info.status) == STATUS_MAXITER
    assert int(info.iterations) == 3
    # partial restart still improves x: residual below the initial one
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) < np.linalg.norm(b)


def test_gmres_res_hist_monotone_within_restart():
    n = 48
    A = _random_nonsym(n, seed=9)
    b = np.ones(n)
    apply_A = lambda v: jnp.asarray(A) @ v
    _, info = gmres(apply_A, jnp.asarray(b), tol=1e-10, maxiter=100,
                    restart=100)
    h = np.asarray(info.res_hist)
    h = h[~np.isnan(h)]
    # GMRES minimizes the residual over a growing subspace: monotone
    # non-increasing within a single (non-restarted) cycle
    assert np.all(np.diff(h) <= 1e-12)


def test_krylov_dispatch():
    assert krylov_dispatch("cg") is pcg
    assert krylov_dispatch("bicgstab") is bicgstab
    assert krylov_dispatch("gmres") is gmres
    assert krylov_dispatch("fgmres").func is gmres
    with pytest.raises(ValueError):
        krylov_dispatch("minres")


def test_gmres_matches_scipy_iterations_ballpark():
    """Same problem, same restart: iteration counts within a small margin of
    scipy's reference GMRES (algorithmic parity check)."""
    import scipy.sparse.linalg as spla

    from raptor_tpu.gallery import convection_diffusion_2d, default_rhs

    A = convection_diffusion_2d(24, epsilon=1e-2)
    b = default_rhs(A.shape[0])
    count = {"n": 0}
    spla.gmres(A, b, rtol=1e-8, restart=30, maxiter=20,
               callback=lambda *_: count.__setitem__("n", count["n"] + 1),
               callback_type="pr_norm")
    Ad = jnp.asarray(A.toarray())
    x, info = gmres(lambda v: Ad @ v, jnp.asarray(b), tol=1e-8, maxiter=600,
                    restart=30)
    assert int(info.status) == STATUS_CONVERGED
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-7 * np.linalg.norm(b)
    assert int(info.iterations) <= count["n"] + 5


def test_gmres_restart_knob_through_api():
    """SolveConfig.gmres_restart threads to the solver: a tiny restart on a
    hard problem takes more total iterations than the default."""
    from raptor_tpu.api import solve
    from raptor_tpu.config import AmgConfig, SolveConfig
    from raptor_tpu.gallery import convection_diffusion_2d, default_rhs

    A = convection_diffusion_2d(24, epsilon=1e-2)
    b = default_rhs(A.shape[0])
    cfg = AmgConfig(splitting="pmis", smoother="jacobi")
    x1, i1 = solve(A, b, cfg, SolveConfig(dtype="float64", krylov="gmres"))
    x2, i2 = solve(A, b, cfg, SolveConfig(dtype="float64", krylov="gmres",
                                          gmres_restart=3))
    for x, info in ((x1, i1), (x2, i2)):
        assert info["relres"] <= 1e-8
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
    assert i2["iterations"] >= i1["iterations"]
