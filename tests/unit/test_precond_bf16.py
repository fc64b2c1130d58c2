"""bf16 preconditioner hierarchy for the algebraic engine
(setup/hierarchy.cast_hierarchy_algebraic + solve_hier_refined M_hier)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from raptor_tpu.api import setup, solve
from raptor_tpu.config import AmgConfig, SolveConfig
from raptor_tpu.gallery import default_rhs, poisson_3d
from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic


def _shuffled_poisson(n=16, seed=0):
    A = poisson_3d(n)
    perm = np.random.default_rng(seed).permutation(A.shape[0])
    P = sp.identity(A.shape[0], format="csr")[perm]
    return (P @ A @ P.T).tocsr()


def test_cast_dtypes():
    A = _shuffled_poisson()
    hier = setup(A, AmgConfig(splitting="pmis", smoother="cheb4",
                              fine_layout="banded"), dtype=np.float32)
    hM = cast_hierarchy_algebraic(hier, jnp.bfloat16)
    for lev, levM in zip(hier.levels, hM.levels):
        assert levM.A.data.dtype == jnp.bfloat16
        assert lev.A.data.dtype == jnp.float32  # original untouched
        assert levM.A.cols.dtype == lev.A.cols.dtype  # indices unchanged
        # smoother scaling stays full precision
        assert levM.dinv.dtype == lev.dinv.dtype
        if lev.Aband is not None:
            assert levM.Aband.vals.dtype == jnp.bfloat16
            assert levM.Aband.pidx.dtype == lev.Aband.pidx.dtype
        if lev.P is not None:
            assert levM.P.data.dtype == jnp.bfloat16
    assert hM.coarse_inv.dtype == jnp.bfloat16
    if hier.tail_op is not None:
        assert hM.tail_op.dtype == jnp.bfloat16


def test_refined_solve_bf16_precond_certifies():
    """The bf16 M only preconditions — the df64 refinement still certifies
    the TRUE 1e-8 residual, at a comparable iteration count."""
    A = _shuffled_poisson()
    b = default_rhs(A.shape[0])
    cfg32 = AmgConfig(splitting="pmis", smoother="cheb4",
                      fine_layout="banded")
    x0, i0 = solve(A, b, cfg32, SolveConfig(dtype="float32", refine=True))
    cfg16 = AmgConfig(splitting="pmis", smoother="cheb4",
                      fine_layout="banded",
                      operator_store_dtype="bfloat16")
    x1, i1 = solve(A, b, cfg16, SolveConfig(dtype="float32", refine=True))
    for x, info in ((x0, i0), (x1, i1)):
        assert info["relres"] <= 1e-8
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
    # a half-precision preconditioner costs at most a few extra iterations
    assert i1["iterations"] <= i0["iterations"] + 4, (i0, i1)


def test_refined_solve_bf16_precond_ell_layout():
    """Same knob on the plain gather-ELL layout (no banded fast path)."""
    A = _shuffled_poisson(12)
    b = default_rhs(A.shape[0])
    cfg = AmgConfig(splitting="pmis", smoother="jacobi",
                    operator_store_dtype="bfloat16")
    x, info = solve(A, b, cfg, SolveConfig(dtype="float32", refine=True))
    assert info["relres"] <= 1e-8
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
