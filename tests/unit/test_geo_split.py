"""Geo-split coarsening (round 5): grid detection, structured-grade
convergence through the general machinery, host/device level equality.

Capability reference (SURVEY.md §0 / BASELINE.json:5): the general-CSR
engine must match reference convergence factors on 3D Poisson; geo-split
is the mechanism that closes the PMIS-vs-structured iteration gap
(measured 16 -> 9 PCG iterations at 128^3, scripts/exp_alg_quality.py)."""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.api import _detect_grid, setup, solve
from raptor_tpu.config import AmgConfig, SolveConfig
from raptor_tpu.gallery import anisotropic_2d, poisson_2d, poisson_3d


def _coo(A):
    return sp.csr_matrix(A).tocoo()


def test_detect_grid_3d():
    A = poisson_3d(12, 10, 8)
    # extents in STRIDE order (stencil_grid: last dim fastest): [8, 10, 12]
    assert _detect_grid(_coo(A), A.shape[0]) == [8, 10, 12]


def test_detect_grid_2d():
    A = poisson_2d(24)
    assert _detect_grid(_coo(A), A.shape[0]) == [24, 24, 1]


def test_detect_grid_rejects_shuffled():
    A = sp.csr_matrix(poisson_3d(12))
    rng = np.random.default_rng(0)
    p = rng.permutation(A.shape[0])
    assert _detect_grid(_coo(A[p][:, p]), A.shape[0]) is None


def test_geo_bails_on_anisotropy():
    """config 3's regime: the grid IS detected (9-pt FE pattern), but the
    weak-dim guard (empty interp rows on the semicoarsened dim) must
    abandon geo and fall back to strength-driven PMIS — verified by the
    coarse sizes NOT halving (PMIS ratio) with geo enabled."""
    A = anisotropic_2d(32, epsilon=1e-3, theta=0.4)
    assert _detect_grid(_coo(A), A.shape[0]) is not None
    cfg = _cfg()
    h = setup(A, cfg)
    assert h.levels[1].n != A.shape[0] // 2, [lv.n for lv in h.levels]


def _cfg(**kw):
    return AmgConfig(splitting="pmis", interp="extended",
                     fine_layout="banded", smoother="cheb4", cheb_degree=3,
                     **kw)


def test_geo_quality_3d():
    """Structured-grade convergence through the general CSR API: the
    48^3 PMIS+ext+i build took 13-14 iterations here; geo-split must stay
    at single digits (oracle fence, recalibrate only with cause)."""
    A = poisson_3d(32)
    b = np.ones(A.shape[0])
    cfg = _cfg()
    h = setup(A, cfg)
    # alternating semicoarsening halves one dim per level
    assert [lv.n for lv in h.levels][:4] == [32768, 16384, 8192, 4096]
    # every big level rides the DIA-plane layout (27-pt cap)
    assert all(lv.A.K <= 32 for lv in h.levels)
    x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True), hier=h)
    a64 = sp.csr_matrix(A).astype(np.float64)
    true = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
    assert true <= 1e-8
    assert info["iterations"] <= 10, info


@pytest.mark.slow
def test_geo_device_matches_host():
    """threshold=0 (all levels through the fused device programs) and
    threshold=inf (all host numpy) build the same geo hierarchy."""
    from raptor_tpu.core.ell import ell_to_csr

    A = poisson_3d(16)
    hh = setup(A, _cfg(host_setup_threshold=1 << 60))
    hd = setup(A, _cfg(host_setup_threshold=0))
    assert [lv.n for lv in hh.levels] == [lv.n for lv in hd.levels]
    for a, d in zip(hh.levels, hd.levels):
        np.testing.assert_allclose(
            abs(ell_to_csr(a.A) - ell_to_csr(d.A)).max(), 0, atol=1e-5)
        if a.P is not None and d.P is not None:
            np.testing.assert_allclose(
                abs(ell_to_csr(a.P) - ell_to_csr(d.P)).max(), 0, atol=1e-6)


def test_geo_off_falls_back_to_pmis():
    A = poisson_3d(16)
    cfg = _cfg(geo_split=False)
    h = setup(A, cfg)
    # PMIS coarsening ratio differs from exact halving
    assert [lv.n for lv in h.levels][1] != 2048 * 2
    b = np.ones(A.shape[0])
    x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True), hier=h)
    assert info["relres"] <= 1e-8


def test_geo_transfer_matches_ell():
    """GeoTransfer (static-reshape P/R apply) must reproduce the ELL
    spmv(P)/spmv(R) exactly — including padding and grid boundaries — on
    every geo level of a non-cubic build (odd/even extent parities)."""
    from raptor_tpu.core.hybrid import geo_prolong, geo_restrict
    from raptor_tpu.ops.sparse_ops import spmv

    A = poisson_3d(12, 10, 8)
    h = setup(A, _cfg())
    rng = np.random.default_rng(5)
    checked = 0
    for lv in h.levels:
        if lv.Tgeo is None or lv.P is None:
            continue
        xf = np.zeros(lv.A.n_rows_pad, np.float32)
        xf[: lv.n] = rng.standard_normal(lv.n)
        xc = np.zeros(lv.P.n_cols_pad, np.float32)
        nc = lv.P.shape[1]
        xc[:nc] = rng.standard_normal(nc)
        got_p = np.asarray(geo_prolong(lv.Tgeo, jnp.asarray(xc)))
        ref_p = np.asarray(spmv(lv.P, jnp.asarray(xc)))
        np.testing.assert_allclose(got_p[: lv.n], ref_p[: lv.n],
                                   rtol=0, atol=1e-6)
        got_r = np.asarray(geo_restrict(lv.Tgeo, jnp.asarray(xf)))
        ref_r = np.asarray(spmv(lv.R, jnp.asarray(xf)))
        np.testing.assert_allclose(got_r[:nc], ref_r[:nc],
                                   rtol=0, atol=1e-6)
        checked += 1
    assert checked >= 3, checked


import jax.numpy as jnp  # noqa: E402  (used by the transfer test)
