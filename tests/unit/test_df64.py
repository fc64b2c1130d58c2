"""Compensated double-float32 arithmetic: must certify residuals to ~1e-14
relative against numpy fp64 (the on-device replacement for fp64 refinement;
raptor_tpu/utils/df64.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.utils.df64 import df_add, df_from, two_prod, two_sum


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-6, jnp.float32)
    s, e = jax.jit(two_sum)(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, np.asarray(exact))  # error-free


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    p, e = jax.jit(two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)  # fp32 products are exact in fp64


def test_df64_residual_precision():
    from raptor_tpu.structured import dia_from_stencil
    from raptor_tpu.structured.solver import _df64_residual

    st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float)
    from raptor_tpu.gallery import stencil_grid

    dims = (32, 32)
    A = dia_from_stencil(st, dims, dtype=np.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A.n).astype(np.float32)
    b = rng.standard_normal(A.n).astype(np.float32)
    rh, rl = jax.jit(_df64_residual)(
        A, jnp.asarray(x), jnp.zeros(A.n, jnp.float32),
        jnp.asarray(b), jnp.zeros(A.n, jnp.float32),
    )
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    ref = b.astype(np.float64) - stencil_grid(st, dims).astype(
        np.float64) @ x.astype(np.float64)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
    assert err < 1e-12, err


@pytest.mark.slow
def test_structured_solve_refined_certifies_1e8():
    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import default_rhs, stencil_grid
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        dia_from_stencil,
        structured_solve_refined,
    )

    st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float)
    dims = (64, 64)
    A = dia_from_stencil(st, dims, dtype=np.float32)
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=64,
                    max_levels=30)
    hier = build_structured_hierarchy(A, cfg)
    b = jnp.asarray(default_rhs(A.n, dtype=np.float32))
    (xh, xl), relres, iters = structured_solve_refined(hier, b, tol=1e-8)
    assert float(relres) <= 1e-8
    # verify against honest fp64: collapse the df64 pair exactly
    x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    ref = stencil_grid(st, dims)
    tr = np.linalg.norm(ref @ x64 - np.asarray(b, np.float64)) \
        / np.linalg.norm(np.asarray(b, np.float64))
    assert tr <= 2e-8, tr  # the df64 certification is honest
    assert int(iters) <= 40


def test_algebraic_device_refinement():
    """solve() with refine=True + refine_device runs the whole refinement on
    device and certifies the true fp64 residual."""
    from raptor_tpu import solve, AmgConfig, SolveConfig
    from raptor_tpu.gallery import poisson_2d, default_rhs

    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
        SolveConfig(dtype="float32", refine=True, refine_device=True),
    )
    tr = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert info["relres"] <= 1e-8
    assert tr <= 2e-8, tr


def test_df64_exact_inside_fused_chain_with_gathers():
    """Regression (round 3): a deep fused two_prod/df_add chain with
    gathers, compiled as ONE jit, must keep df64 accuracy.  XLA:CPU's
    backend used to contract ``x - a*b`` into fma (unrounded product) and
    rewrite ``(const + b) - const -> b`` across the EFT seams, silently
    degrading the compensated residual to plain fp32 (errors at
    ~ulp(a*b) ~ 1e-5 here); utils/df64._fence pins the seams.  Healthy
    df64 accumulates ~1e-11 over K=27 terms of magnitude ~100; threshold
    1e-10 is ~1e5 below the broken behavior."""
    import jax
    import jax.numpy as jnp

    from raptor_tpu.utils.df64 import df_add, two_prod

    rng = np.random.default_rng(0)
    N, K = 512, 27
    d64 = rng.standard_normal((K, N)) * 1e5
    x64 = rng.standard_normal(N) * 1e-3
    b64 = rng.standard_normal(N)
    d = jnp.asarray(d64.astype(np.float32))
    lo = jnp.asarray((d64 - np.asarray(d, np.float64)).astype(np.float32))
    xh = jnp.asarray(x64.astype(np.float32))
    xl = jnp.asarray((x64 - np.asarray(xh, np.float64)).astype(np.float32))
    bh = jnp.asarray(b64.astype(np.float32))
    bl = jnp.asarray((b64 - np.asarray(bh, np.float64)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, N, (K, N)).astype(np.int32))

    @jax.jit
    def resid(d, lo, cols, xh, xl, rh, rl):
        for k in range(K):
            gh = jnp.take(xh, cols[k], axis=0)
            gl = jnp.take(xl, cols[k], axis=0)
            ph, pe = two_prod(d[k], gh)
            pe = pe + d[k] * gl + lo[k] * gh
            rh, rl = df_add(rh, rl, -ph, -pe)
        return rh, rl

    rh, rl = resid(d, lo, cols, xh, xl, bh, bl)
    xx = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    ref = b64.copy()
    for k in range(K):
        ref -= d64[k] * xx[np.asarray(cols[k])]
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    assert np.abs(got - ref).max() < 1e-10, np.abs(got - ref).max()


def _pi_shuffled_poisson(nx: int, seed: int = 0):
    """pi-scaled shuffled Poisson: entries are NOT fp32-representable, so
    attach_residual_lo produces a nonzero a0_lo (the cross-term path)."""
    import scipy.sparse as sp

    from raptor_tpu.gallery import poisson_3d

    A = sp.csr_matrix(poisson_3d(nx)) * np.pi
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    return A[p][:, p].tocsr()


def test_banded_df64_residual_kernel_vs_fp64():
    """The fused banded df64 residual kernel (ops/pallas/banded_kernel,
    interpret mode) == fp64 oracle to df64 resolution, INCLUDING the
    a0_lo cross term (certification against the unrounded operator)."""
    from raptor_tpu.api import setup
    from raptor_tpu.config import AmgConfig
    from raptor_tpu.core.hybrid import banded_df64_residual
    from raptor_tpu.ops.pallas.banded_kernel import banded_df64_residual_ref

    A = _pi_shuffled_poisson(16)
    n = A.shape[0]
    cfg = AmgConfig(splitting="pmis", smoother="cheb4", fine_layout="banded")
    hier = setup(A, cfg, dtype=np.float32)
    band = hier.levels[0].Aband
    assert band is not None
    assert hier.a0_lo_band is not None  # pi-scaled data is fp32-inexact
    n_pad = band.n_pad
    perm = np.asarray(hier.perm)[:n]
    Ar64 = A[perm][:, perm].astype(np.float64)

    rng = np.random.default_rng(1)

    def pad(a):
        out = np.zeros(n_pad, np.float32)
        out[:n] = a
        return out

    xh = pad(rng.standard_normal(n).astype(np.float32))
    b64 = rng.standard_normal(n)
    bh = pad(b64.astype(np.float32))
    bl = pad((b64 - bh[:n].astype(np.float64)).astype(np.float32))
    v = pad((rng.standard_normal(n) * 1e-6).astype(np.float32))

    args = (jnp.asarray(xh), jnp.asarray(bh), jnp.asarray(bl),
            jnp.asarray(v))
    rh, rl = banded_df64_residual(band, hier.a0_lo_band, *args,
                                  interpret=True)
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    ref = (b64 - v[:n].astype(np.float64)
           - Ar64 @ xh[:n].astype(np.float64))
    scale = np.abs(Ar64 @ xh[:n].astype(np.float64)).max()
    assert np.abs(got[:n] - ref).max() / scale < 1e-12
    if n_pad > n:
        assert np.abs(got[n:]).max() == 0.0  # identity pad rows stay zero

    # the plain-jnp reference path (CPU solves) agrees with the kernel
    rh2, rl2 = banded_df64_residual_ref(band.plan(), hier.a0_lo_band, *args)
    got2 = np.asarray(rh2, np.float64) + np.asarray(rl2, np.float64)
    assert np.abs(got2[:n] - ref).max() / scale < 1e-12


def test_banded_refined_solve_certifies_true_residual():
    """End-to-end: fine_layout='banded' + on-device refinement routes the
    fused df64 residual (solve_hier_refined.use_band_resid) and still
    certifies the TRUE fp64 residual on an fp32-inexact operator."""
    from raptor_tpu import AmgConfig, SolveConfig, solve

    A = _pi_shuffled_poisson(16, seed=3)
    b = np.arange(A.shape[0], dtype=np.float64) % 7 + 1
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="cheb4",
                        fine_layout="banded"),
        SolveConfig(dtype="float32", refine=True, refine_device=True),
    )
    tr = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert info["relres"] <= 1e-8
    assert tr <= 2e-8, tr


def test_bicgstab_device_refinement():
    """solve() with refine_device + krylov='bicgstab' runs the whole
    refinement on device (BiCGStab inner solves) and certifies the true
    fp64 residual — previously only the CG inner was on-device."""
    from raptor_tpu import solve, AmgConfig, SolveConfig
    from raptor_tpu.gallery import poisson_2d, default_rhs

    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    x, info = solve(
        A, b, AmgConfig(splitting="pmis", smoother="jacobi"),
        SolveConfig(dtype="float32", refine=True, refine_device=True,
                    krylov="bicgstab"),
    )
    tr = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert info["relres"] <= 1e-8
    assert tr <= 2e-8, tr
