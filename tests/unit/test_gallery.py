import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from raptor_tpu.gallery import (
    poisson_2d,
    poisson_3d,
    laplacian_27pt,
    anisotropic_2d,
    diffusion_stencil_2d,
    elasticity_3d,
)


def is_symmetric(a, tol=1e-12):
    d = a - a.T
    return abs(d).max() <= tol if d.nnz else True


def smallest_eig(a):
    return spla.eigsh(a, k=1, which="SA", return_eigenvectors=False)[0]


def test_poisson_2d():
    a = poisson_2d(8)
    assert a.shape == (64, 64)
    assert is_symmetric(a)
    assert np.allclose(a.diagonal(), 4.0)
    assert smallest_eig(a.asfptype()) > 0


def test_poisson_3d():
    a = poisson_3d(5)
    assert a.shape == (125, 125)
    assert is_symmetric(a)
    assert np.allclose(a.diagonal(), 6.0)
    assert smallest_eig(a.asfptype()) > 0


def test_laplacian_27pt():
    a = laplacian_27pt(5)
    assert is_symmetric(a, 1e-10)
    # interior rows of an FE Laplacian have zero row-sum
    rs = np.asarray(a.sum(axis=1)).ravel().reshape(5, 5, 5)
    assert np.allclose(rs[2, 2, 2], 0.0, atol=1e-10)
    assert smallest_eig(a) > 0


def test_anisotropic_stencil_limits():
    # eps=1, any angle -> isotropic FE Laplacian stencil
    st = diffusion_stencil_2d(1.0, 0.3)
    ref = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]]) / 3.0
    assert np.allclose(st, ref, atol=1e-12)
    a = anisotropic_2d(9, epsilon=1e-3, theta=np.pi / 6)
    assert is_symmetric(a, 1e-10)
    assert smallest_eig(a) > 0


def test_elasticity_3d():
    A, B, coords = elasticity_3d(4)
    n_free = 3 * 4 * 4  # x=0 face clamped
    assert A.shape == (3 * n_free, 3 * n_free)
    assert B.shape == (3 * n_free, 6)
    assert is_symmetric(A, 1e-6)
    assert smallest_eig(A) > 0
    # FEM rows annihilate rigid body modes except where they couple to the
    # eliminated (clamped x=0) nodes — i.e. everywhere with x >= 2.
    r = A @ B
    interior = coords[:, 0] > 1.5
    idx = np.repeat(interior, 3)
    assert np.abs(r[idx]).max() < 1e-6 * abs(A).max()
