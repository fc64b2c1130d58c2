import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.core import ell_from_csr, ell_to_csr
from raptor_tpu.gallery import poisson_2d, poisson_3d, anisotropic_2d
from raptor_tpu.setup import (
    strength_mask,
    strong_transpose_counts,
    pmis_splitting,
    make_perm,
    direct_interpolation,
    tighten_coarse_space,
    C_PT,
    F_PT,
)
from tests.oracle import amg_oracle as oracle


def strength_to_csr(E, sm):
    sm = np.asarray(sm)
    cols = np.asarray(E.cols)
    rows = np.broadcast_to(np.arange(E.n_rows_pad), sm.shape)
    n = E.shape[0]
    return sp.coo_matrix(
        (np.ones(int(sm.sum())), (rows[sm], cols[sm])),
        shape=(E.n_rows_pad, E.n_rows_pad),
    ).tocsr()[:n, :n]


@pytest.mark.parametrize("gen,theta", [
    (lambda: poisson_2d(13), 0.25),
    (lambda: poisson_3d(7), 0.25),
    (lambda: anisotropic_2d(11, epsilon=1e-2, theta=0.4), 0.35),
])
def test_strength_matches_oracle(gen, theta):
    A = gen()
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, theta, "classical")
    S_dev = strength_to_csr(E, sm)
    S_or = oracle.classical_strength(A, theta)
    assert (S_dev != S_or).nnz == 0


def test_lambda_counts():
    A = anisotropic_2d(9, epsilon=1e-2, theta=0.7)
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, 0.25, "classical")
    lam = np.asarray(strong_transpose_counts(E, sm))
    S = oracle.classical_strength(A, 0.25)
    lam_or = np.asarray(S.T.tocsr().sum(axis=1)).ravel()
    assert (lam[: A.shape[0]] == lam_or).all()


@pytest.mark.parametrize("gen", [
    lambda: poisson_2d(12),
    lambda: poisson_3d(6),
    lambda: anisotropic_2d(10, epsilon=1e-3, theta=0.5),
])
def test_pmis_matches_oracle(gen):
    A = gen()
    n = A.shape[0]
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, 0.25, "classical")
    cf = np.asarray(pmis_splitting(E, sm, make_perm(n, E.n_rows_pad, 0)))
    S = oracle.classical_strength(A, 0.25)
    cf_or = oracle.pmis_splitting(S, seed=0)
    assert (cf[:n] == cf_or).all()
    # padding rows are F
    assert (cf[n:] == F_PT).all()


def test_pmis_properties():
    A = poisson_3d(8)
    n = A.shape[0]
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, 0.25, "classical")
    cf = np.asarray(pmis_splitting(E, sm, make_perm(n, E.n_rows_pad, 3)))
    S = strength_to_csr(E, sm)
    G = ((S + S.T) > 0).tocsr()
    for i in range(n):
        nbrs = G.indices[G.indptr[i]: G.indptr[i + 1]]
        if cf[i] == C_PT:
            assert not (cf[nbrs] == C_PT).any()
        else:
            assert (cf[nbrs] == C_PT).any() or nbrs.size == 0


def test_direct_interp_matches_oracle():
    A = poisson_2d(12)
    n = A.shape[0]
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, 0.25, "classical")
    cf = pmis_splitting(E, sm, make_perm(n, E.n_rows_pad, 0))
    P_wide, nc = direct_interpolation(E, sm, cf)
    P = tighten_coarse_space(P_wide, int(nc))
    S = oracle.classical_strength(A, 0.25)
    cf_or = oracle.pmis_splitting(S, seed=0)
    P_or = oracle.direct_interpolation(A, S, cf_or)
    assert int(nc) == P_or.shape[1]
    assert np.allclose(ell_to_csr(P).toarray(), P_or.toarray(), atol=1e-12)


def test_smoother_convergence_factor():
    """Weighted Jacobi on 2D Poisson damps high frequencies; convergence
    factor of the iteration on random error must be < 1 and the smoothed
    error must be smoother (Rayleigh quotient drops)."""
    import jax.numpy as jnp
    from raptor_tpu.solve import jacobi

    A = poisson_2d(16)
    E = ell_from_csr(A, dtype=np.float64)
    rng = np.random.default_rng(0)
    e = rng.standard_normal(E.n_rows_pad)
    e[A.shape[0]:] = 0
    dinv = 1.0 / E.diagonal()
    b = jnp.zeros(E.n_rows_pad, jnp.float64)
    e1 = jacobi(E, dinv, b, jnp.asarray(e), omega=2.0 / 3.0, sweeps=3)
    # error norm decreases, and Rayleigh quotient (roughness) drops sharply
    x0, x1 = e[: A.shape[0]], np.asarray(e1)[: A.shape[0]]
    rq = lambda v: (v @ (A @ v)) / (v @ v)
    assert np.linalg.norm(x1) < np.linalg.norm(x0)
    assert rq(x1) < 0.5 * rq(x0)


def test_classical_interp_matches_oracle():
    from raptor_tpu.setup import classical_interpolation

    for gen, theta in [(lambda: poisson_2d(12), 0.25),
                       (lambda: anisotropic_2d(9, epsilon=1e-2, theta=0.6), 0.35)]:
        A = gen()
        n = A.shape[0]
        E = ell_from_csr(A, dtype=np.float64)
        sm = strength_mask(E, theta, "classical")
        cf = pmis_splitting(E, sm, make_perm(n, E.n_rows_pad, 0))
        P_wide, nc = classical_interpolation(E, sm, cf)
        P = tighten_coarse_space(P_wide, int(nc))
        S = oracle.classical_strength(A, theta)
        cf_or = oracle.pmis_splitting(S, seed=0)
        P_or = oracle.classical_interpolation(A, S, cf_or)
        assert int(nc) == P_or.shape[1]
        assert np.allclose(ell_to_csr(P).toarray(), P_or.toarray(), atol=1e-12)


def test_classical_interp_converges_better():
    """Modified classical interp should not be weaker than direct on 2D
    Poisson with PMIS."""
    from raptor_tpu import solve, AmgConfig, SolveConfig

    A = poisson_2d(32)
    from raptor_tpu.gallery import default_rhs
    b = default_rhs(A.shape[0])
    _, i_dir = solve(A, b, AmgConfig(splitting="pmis", interp="direct"),
                     SolveConfig(dtype="float64"))
    _, i_cla = solve(A, b, AmgConfig(splitting="pmis", interp="classical"),
                     SolveConfig(dtype="float64"))
    assert i_cla["relres"] <= 1e-8
    assert i_cla["iterations"] <= i_dir["iterations"] + 1


def test_native_pmis_matches_numpy():
    """native/host_kernels.cpp::pmis_splitting is bit-identical to the
    numpy synchronous rounds (same edge list, same tie-free int weights)."""
    import scipy.sparse as sp

    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.gallery import poisson_3d
    from raptor_tpu.setup import host_setup as hs
    from raptor_tpu.setup.splitting import make_perm_np
    from raptor_tpu.utils import native

    if native.load() is None:
        pytest.skip("no compiler for the native library")
    rng = np.random.default_rng(0)
    A = poisson_3d(16)
    p = rng.permutation(A.shape[0])
    P = sp.identity(A.shape[0], format="csr")[p]
    A = (P @ A @ P.T).tocsr()
    E = ell_from_csr(A, dtype=np.float64, device=False)
    data, cols, nnz = (np.asarray(E.data), np.asarray(E.cols),
                       np.asarray(E.row_nnz))
    for seed in (0, 1, 7):
        smask = hs.np_strength_mask(data, cols, nnz, 0.25, "classical")
        perm = make_perm_np(A.shape[0], E.n_rows_pad, seed)
        orig = native.pmis_splitting_native
        try:
            native.pmis_splitting_native = lambda *a, **k: None
            cf_np = hs.np_pmis_splitting(cols, smask, perm, E.n_rows_pad)
        finally:
            native.pmis_splitting_native = orig
        cf_c = hs.np_pmis_splitting(cols, smask, perm, E.n_rows_pad)
        assert np.array_equal(cf_np, cf_c)
