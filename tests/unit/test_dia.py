import numpy as np
import pytest

from raptor_tpu.gallery import (
    diffusion_stencil_2d,
    poisson_2d,
    stencil_grid,
)
from raptor_tpu.structured import (
    DiaMatrix,
    dia_add,
    dia_from_scipy,
    dia_from_stencil,
    dia_mult,
    dia_spmv,
    dia_to_scipy,
    dia_transpose,
)


def stencil_7pt():
    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for s in (0, 2):
            i[d] = s
            st[tuple(i)] = -1.0
        i[d] = 1
    return st


CASES = [
    (np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float), (9, 7)),
    (diffusion_stencil_2d(1e-2, 0.6), (8, 11)),
    (stencil_7pt(), (5, 4, 6)),
]


@pytest.mark.parametrize("st,dims", CASES)
def test_from_stencil_roundtrip(st, dims):
    D = dia_from_stencil(st, dims, dtype=np.float64)
    ref = stencil_grid(st, dims)
    assert np.allclose(dia_to_scipy(D).toarray(), ref.toarray())


@pytest.mark.parametrize("st,dims", CASES)
def test_spmv(st, dims):
    D = dia_from_stencil(st, dims, dtype=np.float64)
    ref = stencil_grid(st, dims)
    x = np.random.default_rng(0).standard_normal(D.n)
    assert np.allclose(np.asarray(dia_spmv(D, x)), ref @ x)


@pytest.mark.parametrize("st,dims", CASES)
def test_transpose_mult_add(st, dims):
    D = dia_from_stencil(st, dims, dtype=np.float64)
    ref = stencil_grid(st, dims)
    T = dia_transpose(D)
    assert np.allclose(dia_to_scipy(T).toarray(), ref.T.toarray())
    M = dia_mult(D, T)
    assert np.allclose(dia_to_scipy(M).toarray(), (ref @ ref.T).toarray(),
                       atol=1e-10)
    S = dia_add(D, T, 2.0, -0.5)
    assert np.allclose(dia_to_scipy(S).toarray(),
                       (2 * ref - 0.5 * ref.T).toarray(), atol=1e-12)


def test_from_scipy_general():
    # a general grid matrix with variable coefficients
    ref = poisson_2d(7).astype(np.float64)
    rng = np.random.default_rng(3)
    ref.data = ref.data * (1 + 0.1 * rng.standard_normal(ref.nnz))
    D = dia_from_scipy(ref, (7, 7), dtype=np.float64)
    assert np.allclose(dia_to_scipy(D).toarray(), ref.toarray())
