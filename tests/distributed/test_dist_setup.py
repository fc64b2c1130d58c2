"""Weak-scaling distributed structured setup (BASELINE.json:11): the whole
hierarchy build under one shard_map must reproduce the single-device build
to machine precision, level by level."""

import jax
import numpy as np
import pytest

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import default_rhs, stencil_grid
from raptor_tpu.structured import dia_from_stencil
from raptor_tpu.structured.dist import distribute_structured, sdist_solve
from raptor_tpu.structured.dist_setup import sdist_build_hierarchy
from tests.unit.test_dia import stencil_7pt

NDEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason="needs 8 (virtual) devices"
)


@pytest.mark.slow
def test_dist_setup_matches_single_device():
    st = stencil_7pt()
    dims = (16, 16, 16)
    A = dia_from_stencil(st, dims, dtype=np.float64)
    cfg = AmgConfig(smoother="mcgs", coarse_size=32, max_levels=30)
    mesh = jax.make_mesh((NDEV,), ("x",), devices=jax.devices()[:NDEV])

    dh = sdist_build_hierarchy(A, cfg, mesh, dim_policy="size", tail_size=256)
    dh_ref = distribute_structured(A, cfg, NDEV, dim_policy="size",
                                   tail_size=256)
    assert len(dh.levels) == len(dh_ref.levels)
    assert len(dh.tail.levels) == len(dh_ref.tail.levels)
    for k, (a, b) in enumerate(zip(dh.levels, dh_ref.levels)):
        assert a.A.offsets == b.A.offsets
        assert np.allclose(np.asarray(a.A.data), np.asarray(b.A.data),
                           atol=1e-13), k
        assert np.allclose(np.asarray(a.Pt.data), np.asarray(b.Pt.data),
                           atol=1e-13), k
    for k, (a, b) in enumerate(zip(dh.tail.levels, dh_ref.tail.levels)):
        assert np.allclose(np.asarray(a.A.data), np.asarray(b.A.data),
                           atol=1e-12), k

    # the dist-built hierarchy solves
    b = default_rhs(A.n, dtype=np.float64)
    x, info = sdist_solve(dh, b, mesh, tol=1e-8, maxiter=100)
    ref = stencil_grid(st, dims)
    xn = np.asarray(x)
    assert float(info.relres) <= 1e-8
    assert np.linalg.norm(ref @ xn - b) / np.linalg.norm(b) <= 1e-7


def test_dist_setup_2d_anisotropic():
    from raptor_tpu.gallery import diffusion_stencil_2d

    st = diffusion_stencil_2d(1e-2, 0.3)
    A = dia_from_stencil(st, (16, 32), dtype=np.float64)
    cfg = AmgConfig(smoother="jacobi", coarse_size=32, max_levels=30)
    mesh = jax.make_mesh((NDEV,), ("x",), devices=jax.devices()[:NDEV])
    dh = sdist_build_hierarchy(A, cfg, mesh, dim_policy="operator",
                               tail_size=128)
    b = default_rhs(A.n, dtype=np.float64)
    x, info = sdist_solve(dh, b, mesh, tol=1e-8, maxiter=200)
    assert float(info.relres) <= 1e-8
