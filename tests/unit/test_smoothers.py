"""Two-stage Gauss-Seidel smoother (PAPERS.md:9 — Yamazaki et al., two-stage
GS for Krylov solvers on GPU clusters; SURVEY.md §2b C15).

The triangular solve of a GS sweep is replaced by a truncated Neumann series
of inner Jacobi iterations (masked SpMVs) — fully parallel, coloring-free.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from raptor_tpu import AmgConfig, SolveConfig, solve
from raptor_tpu.core import ell_from_csr
from raptor_tpu.gallery import default_rhs, poisson_2d, poisson_3d
from raptor_tpu.solve.smoothers import jacobi, triangular_apply, two_stage_gs


def _poisson_ell(n=16, dtype=np.float64):
    A = poisson_2d(n)
    return A, ell_from_csr(A, dtype=dtype)


def test_triangular_apply_matches_scipy():
    A, E = _poisson_ell()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(E.n_cols_pad)
    n = A.shape[0]
    L = sp.tril(A, k=-1).tocsr()
    U = sp.triu(A, k=1).tocsr()
    yl = np.asarray(triangular_apply(E, jnp.asarray(x), upper=False))[:n]
    yu = np.asarray(triangular_apply(E, jnp.asarray(x), upper=True))[:n]
    assert np.allclose(yl, L @ x[:n], atol=1e-12)
    assert np.allclose(yu, U @ x[:n], atol=1e-12)


def test_triangular_apply_col_bound():
    """col_bound masks columns >= bound out of the triangle (the distributed
    hybrid variant's halo exclusion)."""
    A, E = _poisson_ell()
    n = A.shape[0]
    bound = n // 2
    x = np.arange(E.n_cols_pad, dtype=np.float64)
    y = np.asarray(
        triangular_apply(E, jnp.asarray(x), upper=True, col_bound=bound))[:n]
    Ub = sp.triu(A, k=1).tolil()
    Ub[:, bound:] = 0
    assert np.allclose(y, Ub.tocsr() @ x[:n], atol=1e-12)


def test_tsgs_large_inner_matches_exact_gs():
    """With enough inner iterations the two-stage sweep converges to the
    exact GS update x + (D+L)^{-1} r (the Neumann series converges because
    D^{-1}L is strictly triangular => nilpotent-dominated for this size)."""
    A, E = _poisson_ell(8)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(E.n_rows_pad)
    x0 = rng.standard_normal(E.n_rows_pad)
    dinv = 1.0 / np.asarray(E.diagonal())
    x = np.asarray(two_stage_gs(E, jnp.asarray(dinv), jnp.asarray(b),
                                jnp.asarray(x0), sweeps=1, inner=200))[:n]
    r = b[:n] - A @ x0[:n]
    z = spla.spsolve_triangular(
        (sp.tril(A, k=-1) + sp.diags(A.diagonal())).tocsr(), r, lower=True)
    assert np.allclose(x, x0[:n] + z, atol=1e-10)


def test_tsgs_inner_zero_is_jacobi():
    """inner=0 degenerates to one unweighted Jacobi sweep."""
    A, E = _poisson_ell(8)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(E.n_rows_pad))
    x0 = jnp.asarray(rng.standard_normal(E.n_rows_pad))
    dinv = 1.0 / E.diagonal()
    xt = np.asarray(two_stage_gs(E, dinv, b, x0, sweeps=1, inner=0))
    xj = np.asarray(jacobi(E, dinv, b, x0, omega=1.0, sweeps=1))
    assert np.allclose(xt, xj, atol=1e-12)


def test_tsgs_smooths_better_than_jacobi():
    """Error-reduction check: one tsgs sweep (inner=2) contracts a random
    error at least as much as one weighted-Jacobi sweep on 2D Poisson."""
    A, E = _poisson_ell(24)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    e = rng.standard_normal(E.n_rows_pad)
    e[n:] = 0.0
    b = jnp.zeros(E.n_rows_pad)  # exact solution 0: error == iterate
    dinv = 1.0 / E.diagonal()
    x = jnp.asarray(e)
    nrm = lambda v: np.linalg.norm(np.asarray(v)[:n])
    et = two_stage_gs(E, dinv, b, x, sweeps=1, inner=2)
    ej = jacobi(E, dinv, b, x, omega=2.0 / 3.0, sweeps=1)
    assert nrm(et) < nrm(ej) < nrm(x)


def test_tsgs_pcg_convergence_and_symmetry():
    """AMG-PCG with tsgs smoothing converges to 1e-8 within a fence at most
    the Jacobi count (CG requires a symmetric preconditioner: forward-pre /
    backward-post two-stage sweeps — divergence or a big iteration blowup
    here is the symptom of a broken pair)."""
    A = poisson_3d(12)
    b = default_rhs(A.shape[0])
    fp64 = SolveConfig(dtype="float64")
    _, info_j = solve(A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
                      fp64)
    x, info_t = solve(A, b, AmgConfig(splitting="pmis", smoother="tsgs"),
                      fp64)
    assert info_t["relres"] <= 1e-8
    assert info_t["iterations"] <= info_j["iterations"], (
        info_t["iterations"], info_j["iterations"])
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_dia_tri_spmv_matches_scipy():
    """Structured-engine triangular apply: one-sided rolled reads equal the
    scipy strict triangles of the assembled operator."""
    import jax.numpy as jnp2

    from raptor_tpu.structured import dia_from_stencil, dia_to_scipy
    from raptor_tpu.structured.dia import dia_tri_spmv

    st = np.zeros((3, 3))
    st[1, 1] = 4.0
    st[0, 1] = st[2, 1] = st[1, 0] = st[1, 2] = -1.0
    A = dia_from_stencil(st, (12, 12), dtype=jnp2.float64)
    a_sp = dia_to_scipy(A)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(A.n)
    yl = np.asarray(dia_tri_spmv(A, jnp2.asarray(x), upper=False))
    yu = np.asarray(dia_tri_spmv(A, jnp2.asarray(x), upper=True))
    assert np.allclose(yl, sp.tril(a_sp, k=-1) @ x, atol=1e-12)
    assert np.allclose(yu, sp.triu(a_sp, k=1) @ x, atol=1e-12)


def test_structured_tsgs_solve():
    """Structured engine end-to-end with tsgs smoothing: converges to 1e-8
    in at most the Jacobi iteration count."""
    import jax.numpy as jnp2

    from raptor_tpu.gallery import default_rhs as rhs
    from raptor_tpu.structured import (
        build_structured_hierarchy, dia_from_stencil, structured_solve)

    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for s in (0, 2):
            i[d] = s
            st[tuple(i)] = -1.0
        i[d] = 1
    A = dia_from_stencil(st, (16, 16, 16), dtype=jnp2.float64)
    b = jnp2.asarray(rhs(A.n, dtype=np.float64))
    iters = {}
    for sm in ("jacobi", "tsgs"):
        cfg = AmgConfig(smoother=sm, coarse_size=64)
        hier = build_structured_hierarchy(A, cfg, dim_policy="size")
        x, info = structured_solve(hier, b, tol=1e-8)
        assert float(info.relres) <= 1e-8
        iters[sm] = int(info.iterations)
    assert iters["tsgs"] <= iters["jacobi"], iters


def test_tsgs_preconditioner_is_symmetric():
    """M = cycle(e_i) columns form a symmetric matrix for the fwd/bwd
    two-stage pair on symmetric A (required for CG theory)."""
    import jax

    from raptor_tpu.api import setup
    from raptor_tpu.core import pad_vector
    from raptor_tpu.solve.cycle import cycle

    A = poisson_2d(8)
    cfg = AmgConfig(splitting="pmis", smoother="tsgs", coarse_size=16,
                    tail_max_n=0)
    hier = setup(A, cfg, dtype=np.float64)
    npad = hier.levels[0].A.n_rows_pad
    eye = np.eye(npad)
    M = np.stack([np.asarray(jax.jit(cycle)(hier, jnp.asarray(c)))
                  for c in eye], axis=1)
    assert np.allclose(M, M.T, atol=1e-10)
