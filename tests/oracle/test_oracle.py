"""Sanity-check the oracle itself: it is the convergence spec, so it must be
demonstrably correct before anything is validated against it."""

import numpy as np
import scipy.sparse as sp

from raptor_tpu.gallery import poisson_2d, poisson_3d, default_rhs
from tests.oracle import amg_oracle as oracle


def test_strength_poisson():
    A = poisson_2d(5)
    S = oracle.classical_strength(A, 0.25)
    # 5-pt Poisson: every off-diagonal is equally strong
    off = A - sp.diags(A.diagonal())
    off.eliminate_zeros()
    assert (S != (abs(off) > 0)).nnz == 0


def test_rs_splitting_1d():
    # 1D 3-pt Laplacian: RS must produce alternating C/F (standard result)
    n = 17
    A = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n)).tocsr()
    S = oracle.classical_strength(A, 0.25)
    cf = oracle.rs_splitting(S)
    # every F has a C neighbor; no two adjacent C... pattern is alternating
    c = np.nonzero(cf == oracle.C_PT)[0]
    assert len(c) in (8, 9)
    f = np.nonzero(cf == oracle.F_PT)[0]
    for i in f:
        assert (i > 0 and cf[i - 1] == oracle.C_PT) or (
            i < n - 1 and cf[i + 1] == oracle.C_PT
        )


def test_pmis_properties():
    A = poisson_2d(12)
    S = oracle.classical_strength(A, 0.25)
    cf = oracle.pmis_splitting(S)
    G = ((S + S.T) > 0).tocsr()
    n = A.shape[0]
    for i in range(n):
        nbrs = G.indices[G.indptr[i]: G.indptr[i + 1]]
        if cf[i] == oracle.C_PT:
            assert not (cf[nbrs] == oracle.C_PT).any()  # independence
        else:
            assert (cf[nbrs] == oracle.C_PT).any()  # coverage


def test_interp_rowsums():
    A = poisson_2d(10)
    S = oracle.classical_strength(A, 0.25)
    cf = oracle.rs_splitting(S)
    P = oracle.direct_interpolation(A, S, cf)
    # zero row-sum stencil rows interpolate constants: row sums ~ 1
    # (boundary rows of truncated Poisson have nonzero row sums -> not exact)
    interior = np.asarray(abs(A).sum(axis=1)).ravel() == 8.0
    rs = np.asarray(P.sum(axis=1)).ravel()
    f_int = interior & (cf == oracle.F_PT)
    assert np.allclose(rs[f_int], 1.0, atol=1e-12)


def test_oracle_config1_converges():
    """Acceptance config 1 (BASELINE.json:7): 2D 5-pt Poisson 64x64,
    classical RS-AMG V(1,1), weighted Jacobi, CG outer -> 1e-8."""
    A = poisson_2d(64)
    b = default_rhs(A.shape[0])
    x, iters, hist = oracle.amg_pcg(A, b, tol=1e-8, splitting="rs")
    assert hist[-1] < 1e-8
    assert iters <= 20, f"oracle config-1 iterations {iters}"
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-7


def test_oracle_poisson3d_converges():
    A = poisson_3d(16)
    b = default_rhs(A.shape[0])
    x, iters, hist = oracle.amg_pcg(A, b, tol=1e-8, splitting="pmis")
    assert hist[-1] < 1e-8
    assert iters <= 30, f"oracle 3d pmis iterations {iters}"
