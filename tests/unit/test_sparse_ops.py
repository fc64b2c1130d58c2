import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.core import ell_from_csr, ell_to_csr, pad_vector
from raptor_tpu.ops import spmv, spmv_t, ell_transpose, spgemm, ell_add, rap
from raptor_tpu.gallery import poisson_2d, poisson_3d, anisotropic_2d

from tests.unit.test_ell import random_csr


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(19, 19), (33, 14), (6, 50)])
def test_spmv_random(seed, shape):
    n, m = shape
    a = random_csr(n, m, 0.3, seed)
    E = ell_from_csr(a, dtype=np.float64, identity_pad_rows=False)
    rng = np.random.default_rng(seed + 99)
    x = rng.standard_normal(m)
    y = np.asarray(spmv(E, pad_vector(x, E.n_cols_pad)))
    assert np.allclose(y[:n], a @ x)
    assert np.allclose(y[n:], 0.0)


def test_spmv_gallery():
    a = poisson_3d(5)
    E = ell_from_csr(a, dtype=np.float64)
    x = np.linspace(-1, 1, a.shape[0])
    y = np.asarray(spmv(E, pad_vector(x, E.n_cols_pad)))
    assert np.allclose(y[: a.shape[0]], a @ x)


@pytest.mark.parametrize("seed", [0, 1])
def test_spmv_t(seed):
    a = random_csr(23, 11, 0.3, seed)
    E = ell_from_csr(a, dtype=np.float64, identity_pad_rows=False)
    y = np.random.default_rng(seed).standard_normal(23)
    x = np.asarray(spmv_t(E, pad_vector(y, E.n_rows_pad)))
    assert np.allclose(x[:11], a.T @ y)


@pytest.mark.parametrize("shape", [(20, 20), (31, 9), (7, 45)])
def test_transpose(shape):
    n, m = shape
    a = random_csr(n, m, 0.25, 7)
    E = ell_from_csr(a, dtype=np.float64, identity_pad_rows=False)
    T = ell_transpose(E)
    assert T.shape == (m, n)
    assert np.allclose(ell_to_csr(T).toarray(), a.T.toarray())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spgemm_random(seed):
    A = random_csr(20, 15, 0.3, seed)
    B = random_csr(15, 25, 0.3, seed + 10)
    Ea = ell_from_csr(A, dtype=np.float64, identity_pad_rows=False)
    Eb = ell_from_csr(B, dtype=np.float64, identity_pad_rows=False)
    C = spgemm(Ea, Eb)
    ref = (A @ B).toarray()
    assert np.allclose(ell_to_csr(C).toarray(), ref, atol=1e-12)


def test_spgemm_gallery_square():
    a = anisotropic_2d(8)
    E = ell_from_csr(a, dtype=np.float64)
    C = spgemm(E, E)
    ref = (a @ a).toarray()
    got = ell_to_csr(C).toarray()
    assert np.allclose(got, ref, atol=1e-10)


def test_rap_vs_scipy():
    a = poisson_2d(10)
    # crude "interpolation": random tall sparse P
    P = random_csr(100, 30, 0.15, 5)
    Ea = ell_from_csr(a, dtype=np.float64)
    Ep = ell_from_csr(P, dtype=np.float64, identity_pad_rows=False,
                      n_cols_pad=32)
    R = ell_transpose(Ep)
    Ac = rap(R, Ea, Ep)
    ref = (P.T @ a @ P).toarray()
    assert np.allclose(ell_to_csr(Ac).toarray(), ref, atol=1e-10)


def test_ell_add():
    A = random_csr(18, 18, 0.3, 1)
    B = random_csr(18, 18, 0.3, 2)
    Ea = ell_from_csr(A, dtype=np.float64, identity_pad_rows=False)
    Eb = ell_from_csr(B, dtype=np.float64, identity_pad_rows=False)
    C = ell_add(Ea, Eb, alpha=2.0, beta=-0.5)
    ref = (2.0 * A - 0.5 * B).toarray()
    assert np.allclose(ell_to_csr(C).toarray(), ref, atol=1e-12)


def test_ell_filter():
    from raptor_tpu.ops import ell_filter

    a = anisotropic_2d(12, epsilon=1e-3, theta=0.4)
    E = ell_from_csr(a, dtype=np.float64)
    F = ell_filter(E, 0.05)
    fa = ell_to_csr(F)
    # row sums preserved (dropped entries lumped into the diagonal)
    assert np.allclose(np.asarray(fa.sum(axis=1)), np.asarray(a.sum(axis=1)),
                       atol=1e-12)
    assert fa.nnz < a.nnz
    # entries above the symmetric threshold tol*sqrt(d_i d_j) untouched
    d = abs(a - fa).toarray()
    np.fill_diagonal(d, 0)
    dg = np.abs(a.diagonal())
    thr = 0.05 * np.sqrt(np.outer(dg, dg))
    assert (d <= thr * (1 + 1e-12) + 1e-15).all()
    # the filtered operator stays symmetric (a row-max criterion did not:
    # PCG diverged on the 128^3 ext+i hierarchy it produced)
    assert abs(fa - fa.T).max() < 1e-12


def test_filtered_hierarchy_converges():
    from raptor_tpu import solve, AmgConfig, SolveConfig
    from raptor_tpu.gallery import default_rhs

    A = anisotropic_2d(24, epsilon=1e-3, theta=0.5)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, AmgConfig(splitting="pmis", theta=0.35,
                                    filter_tol=0.02),
                    SolveConfig(dtype="float64", maxiter=300))
    assert info["relres"] <= 1e-8


def test_spgemm_chunked_matches_unchunked(monkeypatch):
    """The HBM-fenced row-chunked expand+merge (raptor_tpu/ops/sparse_ops.py
    `_row_chunk_plan`) is bit-identical to the single-shot path, including a
    chunk-boundary-straddling tail and the width measurement."""
    import raptor_tpu.ops.sparse_ops as so

    a = poisson_2d(20)  # n=400: forces several 128-row chunks under the fence
    P = random_csr(400, 120, 0.05, 3)
    Ea = ell_from_csr(a, dtype=np.float64)
    Ep = ell_from_csr(P, dtype=np.float64, identity_pad_rows=False)
    w_ref = int(so._spgemm_width(Ea, Ep))
    C_ref = so.spgemm_fixed(Ea, Ep, w_ref)
    monkeypatch.setattr(so, "_EXPAND_ELEM_BUDGET", 1 << 14)
    so._spgemm_width.clear_cache()
    so._spgemm_fixed_full.clear_cache()
    assert so._row_chunk_plan(Ea.K * Ep.K, Ea.n_rows_pad) is not None
    try:
        w = int(so._spgemm_width(Ea, Ep))
        assert w == w_ref
        C = so.spgemm_fixed(Ea, Ep, w)
        assert np.array_equal(np.asarray(C.cols), np.asarray(C_ref.cols))
        assert np.array_equal(np.asarray(C.data), np.asarray(C_ref.data))
        assert np.array_equal(np.asarray(C.row_nnz), np.asarray(C_ref.row_nnz))
        assert np.allclose(ell_to_csr(C).toarray(), (a @ P).toarray())
    finally:
        so._spgemm_width.clear_cache()
        so._spgemm_fixed_full.clear_cache()
