import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.core import ell_from_csr, ell_to_csr
from raptor_tpu.gallery import poisson_2d, anisotropic_2d


def random_csr(n, m, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(n, m, density=density, random_state=np.random.RandomState(seed),
                  format="csr", dtype=np.float64)
    a.data = rng.standard_normal(a.nnz)
    return a


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape", [(17, 17), (33, 12), (8, 40), (1, 1)])
def test_roundtrip_random(seed, shape):
    n, m = shape
    a = random_csr(n, m, 0.3, seed)
    E = ell_from_csr(a, dtype=np.float64, identity_pad_rows=(n == m))
    back = ell_to_csr(E)
    assert np.allclose(back.toarray(), a.toarray())


def test_roundtrip_gallery():
    for a in [poisson_2d(9), anisotropic_2d(7)]:
        E = ell_from_csr(a, dtype=np.float64)
        assert np.allclose(ell_to_csr(E).toarray(), a.toarray())


def test_diagonal_and_mask():
    a = poisson_2d(6, 5)  # n=30 -> pads to 32
    E = ell_from_csr(a, dtype=np.float64)
    d = np.asarray(E.diagonal())
    assert np.allclose(d[:30], a.diagonal())
    assert np.allclose(d[30:], 1.0)  # identity padding rows
    assert int(E.row_nnz.sum()) == a.nnz + (E.n_rows_pad - 30)


def test_padding_cols_valid():
    a = random_csr(10, 10, 0.2, 3)
    E = ell_from_csr(a, dtype=np.float64)
    cols = np.asarray(E.cols)
    assert cols.min() >= 0 and cols.max() < E.n_cols_pad
