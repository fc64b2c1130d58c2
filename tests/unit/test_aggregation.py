import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu import AmgConfig, SolveConfig, solve
from raptor_tpu.core import ell_from_csr, ell_to_csr
from raptor_tpu.gallery import poisson_2d, elasticity_3d, default_rhs
from raptor_tpu.setup.aggregation import (
    aggregate,
    build_sa_hierarchy,
    nodal_condense,
    sa_strength_mask,
    tentative_prolongator,
)

SA_CFG = AmgConfig(splitting="aggregation", interp="smoothed",
                   smoother="chebyshev", theta=0.16)


def test_nodal_condense():
    A, B, _ = elasticity_3d(3)
    E = ell_from_csr(A, dtype=np.float64, row_pad_multiple=24)
    C = nodal_condense(E, 3)
    n_nodes = A.shape[0] // 3
    got = ell_to_csr(C)[:n_nodes, :n_nodes].toarray()
    ref = np.zeros((n_nodes, n_nodes))
    Ad = abs(A.toarray())
    for u in range(n_nodes):
        for v in range(n_nodes):
            ref[u, v] = Ad[3*u:3*u+3, 3*v:3*v+3].sum()
    assert np.allclose(got, ref, atol=1e-10)


def test_aggregate_covers_all():
    A = poisson_2d(16)
    E = ell_from_csr(A, dtype=np.float64)
    sm = sa_strength_mask(E, 0.25)
    agg, n_agg = aggregate(E, sm, seed=0)
    agg = np.asarray(agg)
    n = A.shape[0]
    assert (agg[:n] >= 0).all() and agg[:n].max() == n_agg - 1
    assert (agg[n:] == -1).all()
    # aggregates are connected-ish and not too large/small on average
    assert n / 12 <= n_agg <= n / 3


def test_tentative_prolongator_reproduces_candidates():
    """P_tent @ Bc == B exactly (the defining SA identity)."""
    import jax.numpy as jnp
    from raptor_tpu.ops import spmv

    A, B, _ = elasticity_3d(3)
    E = ell_from_csr(A, dtype=np.float64, row_pad_multiple=24)
    C = nodal_condense(E, 3)
    sm = sa_strength_mask(C, 0.16)
    agg, n_agg = aggregate(C, sm, seed=0)
    n = A.shape[0]
    Bd = jnp.zeros((E.n_rows_pad, 6), jnp.float64).at[:n].set(jnp.asarray(B))
    P, Bc, ncoarse = tentative_prolongator(agg, n_agg, Bd, 3, n)
    for j in range(6):
        bj = np.zeros(P.n_cols_pad)
        bj[:ncoarse] = np.asarray(Bc)[:, j]
        got = np.asarray(spmv(P, jnp.asarray(bj)))
        assert np.allclose(got[:n], B[:, j], atol=1e-8), f"candidate {j}"


def test_config4_elasticity_sa():
    """Acceptance config 4 (BASELINE.json:10): 3D linear elasticity 27-pt
    3x3 blocks, smoothed aggregation, Chebyshev (CI size 6^3 nodes)."""
    A, B, _ = elasticity_3d(6)
    b = default_rhs(A.shape[0])
    hier = build_sa_hierarchy(A, AmgConfig(**{**SA_CFG.__dict__,
                                              "num_candidates": 6}),
                              dtype=np.float64, B=B)
    x, info = solve(A, b, SA_CFG, SolveConfig(dtype="float64", maxiter=100),
                    hier=hier)
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 40, info["iterations"]
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_sa_poisson():
    A = poisson_2d(32)
    b = default_rhs(A.shape[0])
    cfg = AmgConfig(splitting="aggregation", interp="smoothed",
                    smoother="chebyshev", num_candidates=1)
    x, info = solve(A, b, cfg, SolveConfig(dtype="float64"))
    assert info["relres"] <= 1e-8
    assert info["iterations"] <= 15


def test_config4_block_path():
    """config4 preset runs through the BlockELL layout (BASELINE.json:5,10):
    bell layout == scalar operator exactly, block-diag-preconditioned
    Chebyshev converges to 1e-8."""
    import jax.numpy as jnp

    from raptor_tpu.config import PRESETS
    from raptor_tpu.core.bell import bell_spmv
    from raptor_tpu.ops import spmv

    A, B, _ = elasticity_3d(5)
    cfg = PRESETS["config4"]
    assert cfg.smoother == "block_cheb"
    hier = build_sa_hierarchy(A, cfg, dtype=np.float64, B=B)
    lev0 = hier.levels[0]
    assert lev0.Abell is not None and lev0.Abell.bs == 3
    assert lev0.binv is not None

    x = np.random.default_rng(0).standard_normal(lev0.A.n_rows_pad)
    y_b = np.asarray(bell_spmv(lev0.Abell, jnp.asarray(x)))
    y_s = np.asarray(spmv(lev0.A, jnp.asarray(x)))
    assert np.allclose(y_b, y_s, rtol=1e-12, atol=1e-12)

    b = default_rhs(A.shape[0])
    x, info = solve(A, b, cfg,
                    SolveConfig(dtype="float64", tol=1e-9, maxiter=100),
                    hier=hier)
    assert info["relres"] <= 1e-9
    assert info["iterations"] <= 40, info["iterations"]
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_sa_host_matches_device():
    """The host-NumPy SA setup (setup/host_aggregation.py, dispatched below
    host_setup_threshold) mirrors the device pipeline: identical level
    sizes and equal-quality convergence on both a block (elasticity) and a
    scalar (Poisson) problem."""
    import dataclasses

    for A, B, cfg in (
        (*elasticity_3d(4)[:2],
         AmgConfig(splitting="aggregation", interp="smoothed",
                   smoother="block_cheb", num_candidates=6, theta=0.08,
                   coarse_size=16)),
        (poisson_2d(24), None,
         AmgConfig(splitting="aggregation", interp="smoothed",
                   smoother="chebyshev", num_candidates=1)),
    ):
        hh = build_sa_hierarchy(A, cfg, B=B)  # n <= threshold -> host
        hd = build_sa_hierarchy(
            A, dataclasses.replace(cfg, host_setup_threshold=0), B=B)
        assert [lv.n for lv in hh.levels] == [lv.n for lv in hd.levels]
        b = default_rhs(A.shape[0])
        it = []
        for h in (hh, hd):
            x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True),
                            hier=h)
            assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
            it.append(info["iterations"])
        assert abs(it[0] - it[1]) <= 3, it


def test_refined_solve_certifies_true_residual_fp32_operator():
    """Hierarchy.a0_lo: FE-assembled operators (stiffness entries ~1e5 are
    not fp32-representable) used to certify 1e-9 on-device while the TRUE
    fp64 residual stalled at ~kappa*6e-8; the compensated residual's
    a0_lo * x_hi cross term certifies against the unrounded operator."""
    from raptor_tpu.api import setup as amg_setup
    from raptor_tpu.config import PRESETS

    A, B, _ = elasticity_3d(5)
    cfg = PRESETS["config4"]
    hier = amg_setup(A, cfg, B=B)
    assert hier.a0_lo is not None  # elasticity data is not fp32-exact
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True), hier=hier)
    true = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true <= 1.5e-8, true
    # the certified value IS the true value (both vs the fp64 operator)
    assert abs(info["relres"] - true) <= 0.1 * true, (info["relres"], true)


@pytest.mark.slow
def test_aggregate_size_distribution_at_scale():
    """Fence on aggregate quality at n >= 20k nodes (VERDICT r3 item 9):
    size capping keeps the largest aggregate bounded, and the straggler
    pass keeps rank-deficient singletons (vs nc=6 candidates) rare."""
    from raptor_tpu.setup.aggregation import (
        AGG_SIZE_CAP, aggregate, nodal_condense, sa_strength_mask)
    from raptor_tpu.core.ell import ell_from_csr

    A, B, _ = elasticity_3d(28)  # 21952 nodes, 65856 dofs
    E = ell_from_csr(A, dtype=np.float32, row_pad_multiple=24)
    C = nodal_condense(E, 3)
    smask = sa_strength_mask(C, 0.08)
    agg, n_agg = aggregate(C, smask, seed=0)
    agg = np.asarray(agg)
    nn = A.shape[0] // 3
    sizes = np.bincount(agg[:nn][agg[:nn] >= 0], minlength=n_agg)
    assert sizes.max() <= 2 * AGG_SIZE_CAP, sizes.max()
    # vs nc=6 candidates an aggregate needs >= 2 nodes to be full rank
    small = (sizes < 2).sum()
    assert small / n_agg < 0.02, (small, n_agg)
    assert 8 <= sizes.mean() <= AGG_SIZE_CAP, sizes.mean()


def test_sa_lumped_filter_preserves_row_action():
    """Filtered SA (config.sa_filter): the lumped-filtered operator used
    for prolongator smoothing keeps A's action on constants exactly
    (dropped off-node entries move to the diagonal), and host/device
    filters agree."""
    import jax.numpy as jnp

    from raptor_tpu.setup.aggregation import _lumped_filter
    from raptor_tpu.setup.host_aggregation import _np_lumped_filter

    A, B, _ = elasticity_3d(4)
    E = ell_from_csr(A, dtype=np.float32, row_pad_multiple=24)
    for bs in (1, 3):
        Af = _lumped_filter(E, 0.1, bs)
        # row action on the constant vector is preserved bitwise-ish
        one = jnp.ones(E.n_rows_pad, jnp.float32)
        from raptor_tpu.ops.sparse_ops import spmv

        ya = np.asarray(spmv(E, one))
        yf = np.asarray(spmv(Af, one))
        np.testing.assert_allclose(yf, ya, rtol=2e-6, atol=2e-6 * np.abs(ya).max())
        # host mirror produces the same filtered operator
        import scipy.sparse as sp

        A32 = sp.csr_matrix(A).astype(np.float32)
        n_pad = E.n_rows_pad
        n = A.shape[0]
        Ap = sp.block_diag(
            [A32, sp.identity(n_pad - n, dtype=np.float32, format="csr")],
            format="csr") if n_pad > n else A32
        Af_np = _np_lumped_filter(Ap, 0.1, bs, np.float32)
        Af_dev = ell_to_csr(Af)
        d = (Af_dev - Af_np).tocoo()
        assert np.abs(d.data).max(initial=0.0) <= 1e-5 * np.abs(Ap.data).max()
        # something was actually dropped at this tolerance
        assert Af_np.nnz < Ap.nnz


def test_sa_filter_converges_and_shrinks_complexity():
    """sa_filter cuts the Galerkin coarse-operator fill on elasticity
    while still converging to 1e-8."""
    import dataclasses

    A, B = elasticity_3d(10)[:2]  # n=3000: small sizes show no fill delta
    cfg0 = AmgConfig(splitting="aggregation", interp="smoothed",
                     smoother="block_cheb", num_candidates=6, theta=0.08,
                     coarse_size=16)
    cfgf = dataclasses.replace(cfg0, sa_filter=0.1)
    from raptor_tpu.setup.aggregation import build_sa_hierarchy

    h0 = build_sa_hierarchy(A, cfg0, B=B)
    hf = build_sa_hierarchy(A, cfgf, B=B)
    nnz = lambda h: sum(float(np.asarray(lv.A.row_nnz).sum())
                        for lv in h.levels[1:])
    assert nnz(hf) < nnz(h0)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, cfgf, SolveConfig(tol=1e-8, refine=True), hier=hf)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7
