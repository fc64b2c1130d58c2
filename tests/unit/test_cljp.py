"""CLJP splitting property tests (the H2 signature randomization perturbs
the serial trajectory, so we verify invariants rather than oracle equality;
see raptor_tpu/setup/cljp.py docstring)."""

import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.core import ell_from_csr
from raptor_tpu.gallery import anisotropic_2d, poisson_2d, poisson_3d, default_rhs
from raptor_tpu.setup import strength_mask, make_perm, C_PT, F_PT
from raptor_tpu.setup.cljp import cljp_splitting
from tests.unit.test_setup import strength_to_csr


@pytest.mark.parametrize("gen,theta", [
    (lambda: poisson_2d(12), 0.25),
    (lambda: poisson_3d(6), 0.25),
    (lambda: anisotropic_2d(10, epsilon=1e-2, theta=0.5), 0.35),
])
def test_cljp_invariants(gen, theta):
    A = gen()
    n = A.shape[0]
    E = ell_from_csr(A, dtype=np.float64)
    sm = strength_mask(E, theta, "classical")
    cf = np.asarray(cljp_splitting(E, sm, make_perm(n, E.n_rows_pad, 0)))
    assert set(np.unique(cf)) <= {C_PT, F_PT}
    assert (cf[n:] == F_PT).all()  # padding rows are F

    S = strength_to_csr(E, sm)
    St = S.T.tocsr()
    n_c = int((cf[:n] == C_PT).sum())
    assert 0 < n_c < n
    # every F point with strong influences has at least one C influence
    # (direct interpolation well-defined)
    for i in range(n):
        if cf[i] != F_PT:
            continue
        deps = S.indices[S.indptr[i]: S.indptr[i + 1]]
        if deps.size:
            assert (cf[deps] == C_PT).any(), f"F point {i} has no C influence"


@pytest.mark.slow
def test_cljp_hierarchy_converges():
    from raptor_tpu import solve, AmgConfig, SolveConfig

    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, AmgConfig(splitting="cljp", smoother="jacobi"),
                    SolveConfig(dtype="float64"))
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 15, info["iterations"]
    # CLJP selects denser C sets than PMIS (expected; why PMIS exists)
    assert info["stats"]["operator_complexity"] <= 4.0
