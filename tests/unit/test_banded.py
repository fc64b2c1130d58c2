"""Banded dynamic-gather SpMV (BASELINE.json:5 general-CSR capability):
RCM + paged vreg gathers must reproduce the exact SpMV on shuffled
(non-grid) matrices.  Measured on TPU: 20.6x over the pure-gather ELL path
at 48^3 shuffled Poisson (scripts/bench_hybrid_spmv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.core.hybrid import banded_from_csr, banded_spmv
from raptor_tpu.gallery import poisson_3d


def _shuffled_poisson(nx: int, seed: int = 0):
    import scipy.sparse as sp

    A = poisson_3d(nx)
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    P = sp.coo_matrix(
        (np.ones(len(p)), (np.arange(len(p)), p)), shape=A.shape
    ).tocsr()
    return (P @ A @ P.T).tocsr()


@pytest.mark.parametrize("nx,reorder", [(12, True), (12, False), (9, True)])
def test_banded_matches_scipy(nx, reorder):
    A = _shuffled_poisson(nx)
    n = A.shape[0]
    B = banded_from_csr(A, dtype=np.float64, reorder=reorder)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(B.n_pad)
    x[n:] = 0
    y = np.asarray(banded_spmv(B, jnp.asarray(x)))
    y_ref = A @ x[:n]
    assert np.allclose(y[:n], y_ref, rtol=1e-12, atol=1e-12)


def test_banded_kernel_interpret_matches_ref():
    """The Pallas kernel (interpret mode) computes exactly what the plain
    jnp reference computes, on the same plan."""
    from raptor_tpu.ops.pallas.banded_kernel import (
        banded_spmv_pallas,
        banded_spmv_ref,
    )

    A = _shuffled_poisson(10)
    B = banded_from_csr(A, dtype=np.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(B.n_pad).astype(np.float32))
    y_ref = np.asarray(banded_spmv_ref(B.plan(), x))
    y_k = np.asarray(banded_spmv_pallas(B.plan(), x, interpret=True))
    assert np.allclose(y_k, y_ref, rtol=1e-6, atol=1e-6)


def test_banded_rcm_shrinks_band():
    """RCM must actually reduce the window size (the speedup mechanism)."""
    A = _shuffled_poisson(12)
    B_r = banded_from_csr(A, reorder=True)
    B_n = banded_from_csr(A, reorder=False)
    assert B_r.meta[5] <= B_n.meta[5] / 2, (B_r.meta, B_n.meta)  # Wp


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-mode check needs a real TPU")
def test_banded_compiled_tpu():
    A = _shuffled_poisson(16)
    n = A.shape[0]
    B = banded_from_csr(A, dtype=np.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(B.n_pad).astype(np.float32)
    x[n:] = 0
    y = np.asarray(banded_spmv(B, jnp.asarray(x)))
    y_ref = A @ x[:n].astype(np.float64)
    assert np.allclose(y[:n], y_ref, rtol=1e-5, atol=1e-5 * np.abs(y_ref).max())


@pytest.mark.slow
def test_banded_solve_path():
    """fine_layout='banded': the full solve() runs with the banded layout
    on large levels, converges to 1e-8, and returns the solution in the
    caller's ordering (perm plumbing round-trips)."""
    from raptor_tpu import AmgConfig, SolveConfig
    from raptor_tpu.api import setup, solve
    from raptor_tpu.gallery import default_rhs

    A = _shuffled_poisson(21)  # 9261 >= BANDED_MIN_N
    n = A.shape[0]
    b = default_rhs(n)
    cfg = AmgConfig(splitting="pmis", smoother="cheb4",
                    fine_layout="banded")
    hier = setup(A, cfg, dtype=np.float64)
    assert hier.perm is not None
    assert hier.levels[0].Aband is not None
    x, info = solve(A, b, cfg, SolveConfig(dtype="float64", maxiter=100),
                    hier=hier)
    assert info["relres"] <= 1e-8
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_banded_layout_iteration_parity():
    """fine_layout='banded' RCM-permutes the matrix, but id-keyed PMIS
    weights (setup.splitting.make_perm_ids) must make the C/F sets — and
    hence the Krylov iteration count — identical to the unpermuted build
    (VERDICT r3 item 4)."""
    import scipy.sparse as sp

    from raptor_tpu.api import solve
    from raptor_tpu.config import AmgConfig, SolveConfig
    from raptor_tpu.gallery.stencils import poisson_3d

    A = poisson_3d(16)
    rng = np.random.default_rng(0)
    p = rng.permutation(A.shape[0])
    As = sp.csr_matrix(A)[p][:, p].tocsr()
    b = np.ones(As.shape[0])

    _, i_ell = solve(As, b, AmgConfig(splitting="pmis"),
                     SolveConfig(tol=1e-8))
    _, i_band = solve(As, b, AmgConfig(splitting="pmis",
                                       fine_layout="banded"),
                      SolveConfig(tol=1e-8))
    assert i_ell["stats"]["sizes"] == i_band["stats"]["sizes"]
    assert i_ell["iterations"] == i_band["iterations"]
    assert i_band["relres"] <= 1e-8


def test_banded_from_ell_reorder_fallback():
    """`banded_from_ell(reorder=True)` (core/hybrid.py): when the given
    ordering exceeds the plan caps, the RCM retry returns a `reordered`
    layout whose permuting apply (`banded_spmv`) still computes the exact
    SpMV in the CALLER's ordering — the 128^3 alg-engine L1 path."""
    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.core.hybrid import banded_from_ell

    # 40^3: shuffled natural bandwidth ~n >> 24k caps; RCM ~O(n^(2/3)) fits
    A = _shuffled_poisson(40)
    n = A.shape[0]
    E = ell_from_csr(A, dtype=np.float64, row_pad_multiple=1024)
    assert banded_from_ell(E) is None, "natural order must exceed the caps"
    B = banded_from_ell(E, reorder=True)
    assert B is not None and B.reordered
    rng = np.random.default_rng(2)
    x = rng.standard_normal(E.n_rows_pad)
    y = np.asarray(banded_spmv(B, jnp.asarray(x)))
    assert np.allclose(y[:n], A @ x[:n], rtol=1e-12, atol=1e-12)


def test_cycle_applies_reordered_banded_level():
    """apply_op (solve/cycle.py) routes a `reordered` banded level through
    the permuting apply — same result as the scalar ELL operator."""
    import dataclasses

    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.core.hybrid import banded_from_ell
    from raptor_tpu.setup.hierarchy import Level
    from raptor_tpu.solve.cycle import apply_op

    A = _shuffled_poisson(40)
    E = ell_from_csr(A, dtype=np.float64, row_pad_multiple=1024)
    B = banded_from_ell(E, reorder=True)
    assert B is not None and B.reordered
    d = A.diagonal()
    dinv = jnp.asarray(np.concatenate(
        [1.0 / d, np.ones(E.n_rows_pad - A.shape[0])]))
    lev = Level(A=E, dinv=dinv, P=None, R=None, color=None, cheb_lmax=None,
                n=A.shape[0], ncolors=1, Aband=B)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(E.n_rows_pad))
    from raptor_tpu.ops.sparse_ops import spmv

    assert np.allclose(np.asarray(apply_op(lev, x)),
                       np.asarray(spmv(E, x)), rtol=1e-12, atol=1e-12)


def _ell_np(data, cols, nnz, shape, n_cols_pad=None):
    from raptor_tpu.core.ell import EllMatrix

    return EllMatrix(data=data, cols=cols.astype(np.int32),
                     row_nnz=nnz.astype(np.int32), shape=shape,
                     n_rows_pad=data.shape[1],
                     n_cols_pad=n_cols_pad or data.shape[1])


def test_banded_split_far_remainder():
    """banded_plan_split (ops/pallas/banded_kernel): a band with sparse
    long-range outliers past the window cap splits into a kernel plan plus
    a compacted FarBlock, and the apply is exact — the 128^3 natural-order
    coarse-operator case (distance-2 plane couplings)."""
    from raptor_tpu.core.hybrid import banded_from_ell, banded_spmv_ro

    rng = np.random.default_rng(4)
    n = 65536
    K = 5
    rows = np.arange(n)
    cols = np.stack([np.clip(rows + d, 0, n - 1) for d in (-2000, -1, 0, 1)]
                    + [np.clip(rows + 30000, 0, n - 1)])
    data = rng.standard_normal((K, n))
    # outlier slot only on ~1% of rows (else: not splittable, K_far guard);
    # keep outliers away from the clip boundary so every one of them is
    # genuinely outside the window cap
    far_rows = (rng.random(n) < 0.01) & (rows < 30000)
    nnz = np.where(far_rows, K, K - 1).astype(np.int32)
    # slot order is front-packed by nnz: move the outlier into slot K-1 and
    # zero it where absent
    data[K - 1, ~far_rows] = 0.0
    E = _ell_np(data, cols, nnz, (n, n))
    B = banded_from_ell(E, reorder=False)
    assert B is not None and B.far is not None, "expected a split plan"
    K_far, m = B.far.meta
    assert K_far == 1 and m == int(far_rows.sum())
    x = rng.standard_normal(n)
    y = np.asarray(banded_spmv_ro(B, jnp.asarray(x)))
    import scipy.sparse as sp

    mask = np.arange(K)[:, None] < nnz[None, :]
    A = sp.coo_matrix((data[mask], (np.broadcast_to(rows, (K, n))[mask],
                                    cols[mask])), shape=(n, n)).tocsr()
    assert np.allclose(y, A @ x, rtol=1e-12, atol=1e-10)


def test_rect_banded_split_far_remainder():
    """banded_plan_rect_split: a transfer operator whose distance-2
    couplings put the window past the npage cap still attaches, with the
    outliers in the FarBlock — the 128^3 L0 restriction case (round 4:
    143 ms as gather-ELL, the dominant V-cycle cost)."""
    from raptor_tpu.core.hybrid import rect_banded_from_ell
    from raptor_tpu.solve.cycle import apply_transfer

    rng = np.random.default_rng(5)
    n, nc = 65536, 65536
    K = 3
    rows = np.arange(n)
    cols = np.stack([np.clip(rows - 300, 0, nc - 1),
                     np.clip(rows + 300, 0, nc - 1),
                     np.clip(rows + 52000, 0, nc - 1)])
    data = rng.standard_normal((K, n))
    far_rows = rng.random(n) < 0.02
    nnz = np.where(far_rows, K, K - 1).astype(np.int32)
    data[K - 1, ~far_rows] = 0.0
    E = _ell_np(data, cols, nnz, (n, nc), n_cols_pad=nc)
    R = rect_banded_from_ell(E, nc)
    assert R is not None and R.far is not None, "expected a split plan"
    x = rng.standard_normal(nc)
    y = np.asarray(apply_transfer(R, None, jnp.asarray(x)))
    import scipy.sparse as sp

    mask = np.arange(K)[:, None] < nnz[None, :]
    A = sp.coo_matrix((data[mask], (np.broadcast_to(rows, (K, n))[mask],
                                    cols[mask])), shape=(n, nc)).tocsr()
    assert np.allclose(y[:n], A @ x, rtol=1e-12, atol=1e-10)
