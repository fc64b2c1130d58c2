"""Structured DIA engine end-to-end: the TPU fast path must match the
algebraic oracle's convergence class on the acceptance problems."""

import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import (
    default_rhs,
    diffusion_stencil_2d,
    stencil_grid,
)
from raptor_tpu.structured import (
    build_structured_hierarchy,
    dia_from_stencil,
    structured_solve,
)
from tests.unit.test_dia import stencil_7pt


def run(st, dims, smoother="mcgs", policy="operator", maxiter=150, tol=1e-8):
    A = dia_from_stencil(st, dims, dtype=np.float64)
    cfg = AmgConfig(smoother=smoother, coarse_size=32, max_levels=40)
    hier = build_structured_hierarchy(A, cfg, dim_policy=policy)
    b = default_rhs(A.n, dtype=np.float64)
    x, info = structured_solve(hier, b, tol=tol, maxiter=maxiter)
    ref = stencil_grid(st, dims)
    xn = np.asarray(x)
    true_rel = np.linalg.norm(ref @ xn - b) / np.linalg.norm(b)
    return int(info.iterations), float(info.relres), true_rel, hier


ST5 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float)


def test_poisson_2d_structured():
    iters, rel, true_rel, hier = run(ST5, (64, 64))
    assert rel <= 1e-8 and true_rel <= 1e-7
    assert iters <= 10  # oracle classical AMG: 8
    # operators stay compact: 9-point on all coarse levels
    assert max(l.A.n_off for l in hier.levels) <= 9


@pytest.mark.slow
def test_poisson_3d_structured():
    iters, rel, true_rel, hier = run(stencil_7pt(), (16, 16, 16))
    assert rel <= 1e-8 and true_rel <= 1e-7
    assert iters <= 14  # oracle PMIS AMG: 15
    assert max(l.A.n_off for l in hier.levels) <= 27


def test_anisotropic_structured():
    """Rotated anisotropic diffusion (config 3 problem class): the operator
    dim policy must pick the strong direction and converge."""
    st = diffusion_stencil_2d(1e-3, 0.0)  # axis-aligned: clean semicoarsening
    iters, rel, true_rel, _ = run(st, (64, 64), policy="operator")
    assert rel <= 1e-8 and true_rel <= 1e-7
    assert iters <= 12

    st = diffusion_stencil_2d(1e-3, np.pi / 6)  # rotated: harder
    iters, rel, true_rel, _ = run(st, (64, 64), policy="operator", maxiter=250)
    assert rel <= 1e-8 and true_rel <= 1e-7


def test_structured_nonsquare_dims():
    iters, rel, true_rel, _ = run(ST5, (48, 24))
    assert rel <= 1e-8 and true_rel <= 1e-7


def test_structured_jacobi_and_cheb():
    for sm in ("jacobi", "chebyshev"):
        iters, rel, true_rel, _ = run(ST5, (32, 32), smoother=sm)
        assert rel <= 1e-8 and true_rel <= 1e-7, sm


def test_bf16_preconditioner():
    """bf16-cast preconditioner hierarchy: the Krylov operator and residual
    stay fp32, the V-cycle runs on bf16-stored operators — iteration count
    must match fp32-M and the TRUE residual must certify (the scheme used
    by bench.py; docs/DESIGN.md)."""
    import jax.numpy as jnp
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        cast_hierarchy,
        dia_from_stencil,
        structured_solve,
    )

    A = dia_from_stencil(ST5, (32, 32), dtype=np.float32)
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=32,
                    max_levels=30)
    hier = build_structured_hierarchy(A, cfg)
    hM = cast_hierarchy(hier, jnp.bfloat16)
    assert hM.levels[0].A.data.dtype == jnp.bfloat16
    b = default_rhs(A.n, dtype=np.float32)
    x32, i32 = structured_solve(hier, jnp.asarray(b), tol=1e-6, maxiter=60)
    xbf, ibf = structured_solve(hier, jnp.asarray(b), tol=1e-6, maxiter=60,
                                M_hier=hM)
    assert float(ibf.relres) <= 1e-6
    assert abs(int(ibf.iterations) - int(i32.iterations)) <= 1
    ref = stencil_grid(ST5, (32, 32))
    tr = np.linalg.norm(ref @ np.asarray(xbf, np.float64) - b) / np.linalg.norm(b)
    assert tr <= 5e-6


def test_structured_wcycle():
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        dia_from_stencil,
        structured_solve,
    )

    A = dia_from_stencil(ST5, (32, 32), dtype=np.float64)
    it_v = it_w = None
    for cyc in ("V", "W"):
        cfg = AmgConfig(smoother="jacobi", cycle=cyc, coarse_size=32,
                        max_levels=30)
        hier = build_structured_hierarchy(A, cfg)
        b = default_rhs(A.n, dtype=np.float64)
        x, info = structured_solve(hier, jnp.asarray(b), tol=1e-8,
                                   maxiter=100)
        assert float(info.relres) <= 1e-8
        if cyc == "V":
            it_v = int(info.iterations)
        else:
            it_w = int(info.iterations)
    assert it_w <= it_v


def test_full_coarsening_2d():
    """Opt-in BoxMG-style full coarsening: fewer levels, same convergence
    class (2D keeps the CI compile cheap; 3D is exercised by bench)."""
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        dia_from_stencil,
        plan_coarsening,
        structured_solve,
    )

    A = dia_from_stencil(ST5, (64, 64), dtype=np.float64)
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=32,
                    max_levels=30, full_coarsening=True)
    plan = plan_coarsening(A, cfg, "operator")
    assert -2 in plan  # full steps taken on the isotropic problem
    hier = build_structured_hierarchy(A, cfg, "operator")
    assert len(hier.levels) <= 5  # semicoarsening needs 8
    b = default_rhs(A.n, dtype=np.float64)
    x, info = structured_solve(hier, jnp.asarray(b), tol=1e-8, maxiter=100)
    assert float(info.relres) <= 1e-8
    assert int(info.iterations) <= 9
    ref = stencil_grid(ST5, (64, 64))
    tr = np.linalg.norm(ref @ np.asarray(x) - b) / np.linalg.norm(b)
    assert tr <= 1e-7


def test_full_coarsening_skipped_for_anisotropy():
    from raptor_tpu.structured import dia_from_stencil, plan_coarsening

    A = dia_from_stencil(diffusion_stencil_2d(1e-3, 0.0), (64, 64),
                         dtype=np.float64)
    cfg = AmgConfig(full_coarsening=True)
    plan = plan_coarsening(A, cfg, "operator")
    assert plan[0] == 0 and -2 not in plan[:3]  # semicoarsens the strong dim
