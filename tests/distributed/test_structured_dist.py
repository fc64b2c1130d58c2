"""Plane-sharded structured multigrid on 8 virtual CPU devices: results must
match the single-device structured path to fp tolerance (config 5 class)."""

import jax
import numpy as np
import pytest

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import default_rhs, stencil_grid
from raptor_tpu.structured import (
    build_structured_hierarchy,
    dia_from_stencil,
    structured_solve,
)
from raptor_tpu.structured.dist import (
    distribute_structured,
    plan_coarsening_dist,
    sdist_solve,
)
from tests.unit.test_dia import stencil_7pt

NDEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason="needs 8 (virtual) devices"
)


def mesh():
    return jax.make_mesh((NDEV,), ("x",), devices=jax.devices()[:NDEV])


@pytest.mark.slow
def test_sdist_matches_single_device():
    st = stencil_7pt()
    dims = (16, 16, 16)
    A = dia_from_stencil(st, dims, dtype=np.float64)
    cfg = AmgConfig(smoother="mcgs", coarse_size=32, max_levels=30)
    b = default_rhs(A.n, dtype=np.float64)

    # single-device reference built with the SAME (dist-constrained) plan
    from raptor_tpu.structured.solver import _build_hierarchy_planned

    plan, _ = plan_coarsening_dist(A, cfg, NDEV, "size", tail_size=256)
    hier = _build_hierarchy_planned(A, cfg, plan)
    x_ref, info_ref = structured_solve(hier, b, tol=1e-8, maxiter=100)

    dh = distribute_structured(A, cfg, NDEV, dim_policy="size", tail_size=256)
    assert len(dh.levels) >= 2
    x, info = sdist_solve(dh, b, mesh(), tol=1e-8, maxiter=100)
    assert float(info.relres) <= 1e-8
    ref = stencil_grid(st, dims)
    xn = np.asarray(x)
    assert np.linalg.norm(ref @ xn - b) / np.linalg.norm(b) <= 1e-7
    # same plan => identical iteration behavior up to fp reduction order
    assert int(info.iterations) == int(info_ref.iterations)
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)


def test_sdist_plan_keeps_shards_balanced():
    st = stencil_7pt()
    A = dia_from_stencil(st, (32, 16, 16), dtype=np.float64)
    cfg = AmgConfig(smoother="mcgs", coarse_size=32, max_levels=30)
    plan, t = plan_coarsening_dist(A, cfg, NDEV, "size", tail_size=256)
    dims = [32, 16, 16]
    for k, d in enumerate(plan):
        if k < t and d == 0:
            assert (dims[0] // NDEV) % 2 == 0
        dims[d] = (dims[d] + 1) // 2
    assert t >= 1


def test_sdist_2d():
    st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float)
    A = dia_from_stencil(st, (32, 64), dtype=np.float64)
    cfg = AmgConfig(smoother="jacobi", coarse_size=32, max_levels=30)
    b = default_rhs(A.n, dtype=np.float64)
    dh = distribute_structured(A, cfg, NDEV, dim_policy="size", tail_size=256)
    x, info = sdist_solve(dh, b, mesh(), tol=1e-8, maxiter=150)
    ref = stencil_grid(st, (32, 64))
    xn = np.asarray(x)
    assert float(info.relres) <= 1e-8
    assert np.linalg.norm(ref @ xn - b) / np.linalg.norm(b) <= 1e-7


@pytest.mark.slow
def test_sdist_cheb4():
    st = stencil_7pt()
    A = dia_from_stencil(st, (16, 16, 16), dtype=np.float64)
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=32,
                    max_levels=30)
    from raptor_tpu.structured.dist_setup import sdist_build_hierarchy

    dh = sdist_build_hierarchy(A, cfg, mesh(), dim_policy="size",
                               tail_size=256)
    b = default_rhs(A.n, dtype=np.float64)
    x, info = sdist_solve(dh, b, mesh(), tol=1e-8, maxiter=100)
    assert float(info.relres) <= 1e-8
    ref = stencil_grid(st, (16, 16, 16))
    xn = np.asarray(x)
    assert np.linalg.norm(ref @ xn - b) / np.linalg.norm(b) <= 1e-7


@pytest.mark.parametrize("smoother,cycle", [("chebyshev", "V"),
                                            ("mcgs", "W")])
@pytest.mark.slow
def test_sdist_feature_matrix_matches_single(smoother, cycle):
    """chebyshev + W-cycle sharded == unsharded (VERDICT r1 weak #5).
    Small box: the W-cycle's doubled visits make the sharded program size
    exponential in depth — 16^3 cost 349s of XLA:CPU compile, (32,8,8)
    still 357s; (32,8,4) with tail_size=200 keeps two sharded levels
    ((32,8,4) and (16,8,4): x stays mesh-divisible with even planes per
    shard through one x-coarsening, and (16,4,4)=256 > 200 stops the
    sharded count) at half the program."""
    st = stencil_7pt()
    dims = (32, 8, 4)  # two sharded levels above the tail
    A = dia_from_stencil(st, dims, dtype=np.float64)
    cfg = AmgConfig(smoother=smoother, cycle=cycle, coarse_size=32,
                    max_levels=30)
    b = default_rhs(A.n, dtype=np.float64)

    from raptor_tpu.structured.solver import _build_hierarchy_planned

    plan, _ = plan_coarsening_dist(A, cfg, NDEV, "size", tail_size=200)
    hier = _build_hierarchy_planned(A, cfg, plan)
    x_ref, info_ref = structured_solve(hier, b, tol=1e-8, maxiter=100)

    dh = distribute_structured(A, cfg, NDEV, dim_policy="size", tail_size=200)
    assert len(dh.levels) >= 2
    x, info = sdist_solve(dh, b, mesh(), tol=1e-8, maxiter=100)
    assert int(info.iterations) == int(info_ref.iterations)
    assert float(info.relres) <= 1e-8
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)


@pytest.mark.slow
def test_sdist_pallas_kernel_route_matches_single():
    """Force the Pallas route (interpret mode) inside the sharded solve on
    the CPU mesh: the kernel-path distributed solve must match the
    roll-path single-device solve (VERDICT r3: sharded solves must route
    through the Pallas kernels)."""
    from raptor_tpu.ops.pallas import dia_kernel as dk
    from raptor_tpu.structured import dia as dia_mod

    st = stencil_7pt()
    dims = (32, 16, 16)  # 1024-element shards: >= the kernel's minimum tile
    A = dia_from_stencil(st, dims, dtype=np.float32)
    cfg = AmgConfig(smoother="jacobi", coarse_size=64, max_levels=30)
    b = default_rhs(A.n, dtype=np.float32)

    from raptor_tpu.structured.solver import _build_hierarchy_planned
    plan, _ = plan_coarsening_dist(A, cfg, NDEV, "size", tail_size=256)
    hier = _build_hierarchy_planned(A, cfg, plan)
    x_ref, info_ref = structured_solve(hier, b, tol=1e-3, maxiter=8)

    dh = distribute_structured(A, cfg, NDEV, dim_policy="size", tail_size=256)
    calls = []
    real = dk.dia_spmv_pallas_v2_halo

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    old = (dia_mod.USE_PALLAS, dia_mod.PALLAS_MIN_N, dia_mod.PALLAS_INTERPRET)
    dk.dia_spmv_pallas_v2_halo = spy
    try:
        dia_mod.USE_PALLAS = True
        dia_mod.PALLAS_MIN_N = 1024  # sharded fine level takes the kernel
        dia_mod.PALLAS_INTERPRET = True
        x, info = sdist_solve(dh, b, mesh(), tol=1e-3, maxiter=8)
    finally:
        dk.dia_spmv_pallas_v2_halo = real
        dia_mod.USE_PALLAS, dia_mod.PALLAS_MIN_N, dia_mod.PALLAS_INTERPRET = old
    assert calls, "sharded solve never traced the Pallas halo kernel"
    assert int(info.iterations) == int(info_ref.iterations)
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)


def test_sdist_gmres_matches_single_device():
    """krylov='gmres' through the structured distributed solver: the CGS2
    coefficient reductions ride the injected psum dot, so iterations and the
    solution match the single-device structured gmres."""
    st = stencil_7pt()
    dims = (16, 16, 16)
    A = dia_from_stencil(st, dims, dtype=np.float64)
    cfg = AmgConfig(smoother="jacobi", coarse_size=32, max_levels=30)
    b = default_rhs(A.n, dtype=np.float64)

    from raptor_tpu.structured.solver import _build_hierarchy_planned

    plan, _ = plan_coarsening_dist(A, cfg, NDEV, "size", tail_size=256)
    hier = _build_hierarchy_planned(A, cfg, plan)
    x_ref, info_ref = structured_solve(hier, b, tol=1e-8, maxiter=100,
                                       krylov="gmres")

    dh = distribute_structured(A, cfg, NDEV, dim_policy="size", tail_size=256)
    x, info = sdist_solve(dh, b, mesh(), tol=1e-8, maxiter=100,
                          krylov="gmres")
    assert float(info.relres) <= 1e-8
    assert int(info.iterations) == int(info_ref.iterations)
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)
