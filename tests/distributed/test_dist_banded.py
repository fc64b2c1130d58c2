"""Distributed banded SpMV (VERDICT r2 missing #3: Pallas kernels on the
*algebraic* sharded solve path): the paged-gather banded layout sharded by
whole kernel tiles, with a kh*tile ppermute halo replacing the single-device
zero pad.  Must equal the single-device banded SpMV exactly, including the
wrap-around halos at the global edges (annihilated by zero ELL slots), and
the end-to-end sharded solve must match the single-device banded solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu import AmgConfig, setup
from raptor_tpu.api import solve_hier
from raptor_tpu.core.ell import pad_vector
from raptor_tpu.core.hybrid import banded_from_csr
from raptor_tpu.gallery import default_rhs, poisson_3d
from raptor_tpu.parallel import (
    dist_solve,
    distribute_hierarchy,
    make_solve_mesh,
)
from raptor_tpu.parallel.dist import (
    _band_spec,
    _shardable_band,
    dist_banded_spmv,
)

NDEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason="needs 8 (virtual) devices"
)


@pytest.fixture(autouse=True)
def _drop_programs():
    """This module's tests each compile large sharded solve programs;
    XLA:CPU aborts once a process accumulates too many executables
    (tests/conftest.py bounds this per-module — not enough here)."""
    yield
    jax.clear_caches()


def _shuffled_poisson(nx: int, seed: int = 0):
    import scipy.sparse as sp

    A = poisson_3d(nx)
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    Pm = sp.coo_matrix(
        (np.ones(len(p)), (np.arange(len(p)), p)), shape=A.shape
    ).tocsr()
    return (Pm @ A @ Pm.T).tocsr()


def _dist_apply(B, x, interpret=None):
    from jax.sharding import PartitionSpec as P

    mesh = make_solve_mesh(NDEV)
    # check_vma only for the ref path: the Pallas HLO *interpreter* cannot
    # yet propagate vma through its internal block slicing (jax suggests
    # check_vma=False as the workaround); the compiled TPU kernel path
    # declares its out vma properly (banded_kernel._banded_call)
    return jax.jit(
        jax.shard_map(
            lambda B, x: dist_banded_spmv(B, x, interpret=interpret),
            mesh=mesh, in_specs=(_band_spec(B), P("x")), out_specs=P("x"),
            check_vma=not interpret,
        )
    )(B, x)


@pytest.mark.parametrize("interpret", [None, True])
def test_dist_banded_spmv_matches_single(interpret):
    """Sharded banded SpMV == single-device banded SpMV, both via the ref
    path (interpret=None on CPU) and via the interpreted Pallas kernel
    inside shard_map (interpret=True) — the compiled-kernel code path."""
    from raptor_tpu.ops.pallas.banded_kernel import banded_spmv_ref

    A = _shuffled_poisson(20)  # n=8000 -> n_pad=8192 = 8 tiles
    B = banded_from_csr(A, dtype=np.float64)
    assert B is not None
    assert _shardable_band(B, NDEV) is B  # T=8, one tile per shard
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(B.n_pad))

    y_ref = np.asarray(banded_spmv_ref(B.plan(), x))
    y = np.asarray(_dist_apply(B, x, interpret=interpret))
    assert np.allclose(y, y_ref, rtol=1e-13, atol=1e-13)


def test_unshardable_band_filtered():
    """A tile grid that doesn't split evenly over the mesh must stay on the
    gather path (no wrong-shape shard_map crash)."""
    A = _shuffled_poisson(17)  # n=4913 -> n_pad=5120 = 5 tiles (5 % 8 != 0)
    B = banded_from_csr(A, dtype=np.float64)
    assert B is not None
    assert _shardable_band(B, NDEV) is None


@pytest.mark.slow
@pytest.mark.parametrize("interpret", [None, True])
def test_dist_rect_banded_transfer_matches_single(interpret):
    """Sharded rect-banded transfer apply == the single-device rect plan
    (P and R of a banded hierarchy, both directions of the proportional
    window), via ref path and via the interpreted Pallas kernel."""
    from jax.sharding import PartitionSpec as Spec

    from raptor_tpu.ops.pallas.banded_kernel import banded_spmv_rect_ref
    from raptor_tpu.parallel.dist import (
        _rect_spec,
        _shardable_rect,
        dist_rect_banded_spmv,
    )

    A = _shuffled_poisson(20)
    cfg = AmgConfig(splitting="pmis", interp="direct", smoother="jacobi",
                    fine_layout="banded", pad_multiple=8 * 1024,
                    coarse_size=64)
    hier = setup(A, cfg, dtype=np.float64)
    lev = hier.levels[0]
    assert lev.Pband is not None and lev.Rband is not None
    nf, nc = lev.A.n_rows_pad, hier.levels[1].A.n_rows_pad
    Rb = _shardable_rect(lev.Rband, NDEV, nc, nf)
    Pb = _shardable_rect(lev.Pband, NDEV, nf, nc)
    assert Rb is not None and Pb is not None

    mesh = make_solve_mesh(NDEV)
    rng = np.random.default_rng(3)
    for B, m in ((Rb, nf), (Pb, nc)):
        x = jnp.asarray(rng.standard_normal(m))
        y_ref = np.asarray(banded_spmv_rect_ref(B.plan(), x))
        y = np.asarray(jax.jit(jax.shard_map(
            lambda B, x: dist_rect_banded_spmv(B, x, interpret=interpret),
            mesh=mesh, in_specs=(_rect_spec(B), Spec("x")),
            out_specs=Spec("x"), check_vma=not interpret,
        ))(B, x))
        assert np.allclose(y, y_ref, rtol=1e-13, atol=1e-13)


@pytest.mark.slow
def test_dist_banded_solve_with_banded_transfers():
    """End-to-end sharded solve with operator AND transfers on the banded
    kernels matches the single-device solve."""
    A = _shuffled_poisson(20)
    n = A.shape[0]
    b = default_rhs(n)
    cfg = AmgConfig(splitting="pmis", interp="direct", smoother="jacobi",
                    fine_layout="banded", pad_multiple=8 * 1024,
                    coarse_size=64)
    hier = setup(A, cfg, dtype=np.float64)
    bd = pad_vector(b, hier.levels[0].A.n_rows_pad)
    x_ref, info_ref = solve_hier(hier, bd, tol=1e-8, maxiter=100,
                                 krylov="cg")

    dh = distribute_hierarchy(hier, NDEV)
    assert dh.levels[0].Aband is not None
    if len(dh.levels) > 1:
        assert dh.levels[0].Rband is not None
    mesh = make_solve_mesh(NDEV)
    x, info = dist_solve(dh, bd, mesh, tol=1e-8, maxiter=100)
    assert int(info.iterations) == int(info_ref.iterations)
    assert float(info.relres) <= 1e-8
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)


@pytest.mark.slow
def test_dist_banded_solve_matches_single_device():
    """End-to-end: fine_layout='banded' hierarchy distributed over the mesh
    routes level-0 applies through dist_banded_spmv and still reproduces the
    single-device solve (iterations and solution)."""
    A = _shuffled_poisson(20)
    n = A.shape[0]
    b = default_rhs(n)
    cfg = AmgConfig(splitting="pmis", interp="direct", smoother="jacobi",
                    fine_layout="banded", pad_multiple=8 * NDEV,
                    coarse_size=64)
    hier = setup(A, cfg, dtype=np.float64)
    assert hier.levels[0].Aband is not None
    n_pad = hier.levels[0].A.n_rows_pad
    # both sides solve the same rhs in the hierarchy's RCM ordering
    # (api.solve handles the user-facing permutation; this compares
    # like-for-like sharded vs single-device)
    bd = pad_vector(b, n_pad)
    x_ref, info_ref = solve_hier(hier, bd, tol=1e-8, maxiter=100,
                                 krylov="cg")

    dh = distribute_hierarchy(hier, NDEV)
    assert dh.levels[0].Aband is not None  # the banded route is live
    mesh = make_solve_mesh(NDEV)
    x, info = dist_solve(dh, bd, mesh, tol=1e-8, maxiter=100)
    assert int(info.iterations) == int(info_ref.iterations)
    assert float(info.relres) <= 1e-8
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)
