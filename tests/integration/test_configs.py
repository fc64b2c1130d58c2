"""End-to-end acceptance configs (BASELINE.json:7-10) on CPU devices.

Each test asserts: (a) residual <= 1e-8, (b) iteration count within a fixed
regression fence (calibrated at first green vs. the oracle, SURVEY.md §4.2),
(c) operator complexity in a sane range, (d) true residual agrees.
"""

import numpy as np
import pytest

from raptor_tpu import solve, AmgConfig, SolveConfig
from raptor_tpu.gallery import (
    poisson_2d,
    poisson_3d,
    anisotropic_2d,
    default_rhs,
)

FP64 = SolveConfig(dtype="float64")


def check(A, info, x, b, max_iters, max_opc=2.6, tol=1e-8):
    assert info["relres"] <= tol
    assert info["iterations"] <= max_iters, info
    assert info["stats"]["operator_complexity"] <= max_opc, info["stats"]
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 10 * tol


def test_config1_rs_jacobi_cg():
    """2D 5-pt Poisson 64x64, classical RS-AMG V(1,1), weighted Jacobi, CG
    (BASELINE.json:7).  Oracle reaches 1e-8 in 8 iterations."""
    A = poisson_2d(64)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, AmgConfig(splitting="rs", smoother="jacobi"), FP64)
    check(A, info, x, b, max_iters=10)


def test_config1_matches_oracle_iterations():
    from tests.oracle import amg_oracle as oracle

    A = poisson_2d(64)
    b = default_rhs(A.shape[0])
    _, it_oracle, _ = oracle.amg_pcg(A, b, tol=1e-8, splitting="rs")
    _, info = solve(A, b, AmgConfig(splitting="rs", smoother="jacobi"), FP64)
    assert abs(info["iterations"] - it_oracle) <= 1


def test_config2_pmis_mcgs_pcg():
    """3D 7-pt Poisson, PMIS + red-black GS, AMG-PCG (BASELINE.json:8).
    CI size 16^3; the full 32^3 runs in bench."""
    A = poisson_3d(16)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, AmgConfig(splitting="pmis", smoother="mcgs"), FP64)
    check(A, info, x, b, max_iters=15)


def test_config3_anisotropic():
    """2D rotated anisotropic diffusion (BASELINE.json:9)."""
    A = anisotropic_2d(32, epsilon=1e-3, theta=np.pi / 6)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", theta=0.35, smoother="jacobi"), FP64
    )
    check(A, info, x, b, max_iters=35, max_opc=2.0)


def test_fp32_with_refinement():
    """Mixed precision: fp32 inner AMG-PCG + fp64 refinement reaches 1e-8
    (the TPU path; fp32 alone cannot certify 1e-8)."""
    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis"),
        SolveConfig(dtype="float32", refine=True, refine_steps=4),
    )
    assert info["relres"] <= 1e-8
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_bicgstab():
    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis"),
        SolveConfig(dtype="float64", krylov="bicgstab"),
    )
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 12


def test_gmres_convection_diffusion():
    """Nonsymmetric upwind convection-diffusion with AMG-preconditioned
    restarted GMRES — the Krylov pairing solver libraries in this domain use
    when CG's symmetry assumption fails."""
    from raptor_tpu.gallery import convection_diffusion_2d

    A = convection_diffusion_2d(32, epsilon=1e-2, velocity=(1.0, 2.0))
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
        SolveConfig(dtype="float64", krylov="gmres"),
    )
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 30, info  # calibrated: 24 at first green
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_fgmres_convection_diffusion():
    from raptor_tpu.gallery import convection_diffusion_2d

    A = convection_diffusion_2d(32, epsilon=1e-2)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
        SolveConfig(dtype="float64", krylov="fgmres"),
    )
    assert info["relres"] <= 1e-8
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_gmres_refined_fp32():
    """GMRES as the inner solver of the on-device df64 refinement: the
    mixed-precision path certifies 1e-8 on a nonsymmetric operator."""
    from raptor_tpu.gallery import convection_diffusion_2d

    A = convection_diffusion_2d(32, epsilon=1e-2)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
        SolveConfig(dtype="float32", krylov="gmres", refine=True),
    )
    assert info["relres"] <= 1e-8
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_stationary_cycles():
    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="rs"),
        SolveConfig(dtype="float64", krylov="none", maxiter=60),
    )
    assert info["relres"] <= 1e-8


def test_wcycle():
    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    _, info_v = solve(A, b, AmgConfig(splitting="pmis", cycle="V"), FP64)
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", cycle="W"), FP64
    )
    assert info["relres"] <= 1e-8
    # W-cycle must not be weaker than V (regression fence: V=17, W=13)
    assert info["iterations"] <= info_v["iterations"]


def test_config3_aggressive_coarsening():
    """BASELINE.json:9 names aggressive coarsening explicitly: distance-2
    PMIS + multipass interpolation; converges with a much leaner hierarchy."""
    A = anisotropic_2d(32, epsilon=1e-3, theta=np.pi / 6)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b,
        AmgConfig(splitting="pmis", theta=0.35, aggressive=True,
                  smoother="jacobi"),
        SolveConfig(dtype="float64", maxiter=300),
    )
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 50
    # the point of aggressive coarsening: very low operator complexity
    assert info["stats"]["operator_complexity"] <= 1.4


def test_structured_gmres_convection_diffusion():
    """The structured (DIA) engine on a NONSYMMETRIC grid stencil: upwind
    convection-diffusion rides the semicoarsening hierarchy + GMRES to a
    true 1e-8 residual (the operator-collapsed interpolation never assumed
    symmetry; only the Krylov pairing changes)."""
    import jax.numpy as jnp

    from raptor_tpu.gallery import convection_diffusion_2d
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        dia_from_scipy,
        structured_solve,
    )

    A = convection_diffusion_2d(64, epsilon=1e-2)
    D = dia_from_scipy(A, dims=(64, 64), dtype=jnp.float64)
    hier = build_structured_hierarchy(D, AmgConfig(smoother="jacobi"))
    b = jnp.asarray(default_rhs(A.shape[0]))
    x, info = structured_solve(hier, b, tol=1e-8, maxiter=200,
                               krylov="gmres")
    assert float(info.relres) <= 1e-8
    assert int(info.iterations) <= 20  # calibrated: 14 at first green
    r = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
    assert r <= 1e-7


def test_multi_rhs_vmap():
    """Multiple right-hand sides via jax.vmap over the jitted solver: the
    batched lax.while_loop runs each system to ITS own convergence (maxiter
    padding only on device time, not on the reported iteration counts)."""
    import jax
    import jax.numpy as jnp

    from raptor_tpu.api import setup, solve_hier
    from raptor_tpu.core.ell import pad_vector

    A = poisson_2d(32)
    hier = setup(A, AmgConfig(splitting="pmis", smoother="jacobi"),
                 dtype=np.float64)
    npad = hier.levels[0].A.n_rows_pad
    B = np.stack([pad_vector(default_rhs(A.shape[0], seed=s), npad)
                  for s in range(4)])
    xs, infos = jax.vmap(
        lambda b: solve_hier(hier, b, tol=1e-8, maxiter=100))(jnp.asarray(B))
    for i in range(4):
        assert float(infos.relres[i]) <= 1e-8
        x = np.asarray(xs[i])[: A.shape[0]]
        b = np.asarray(B[i])[: A.shape[0]]
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
    # per-rhs iteration counts differ: each converged on its own test
    assert len({int(infos.iterations[i]) for i in range(4)}) >= 2
