"""Aux subsystems (SURVEY.md §5): checkpointing, failure detection,
profiling hooks, observability."""

import os

import jax.numpy as jnp
import numpy as np

from raptor_tpu import AmgConfig, SolveConfig, setup, solve
from raptor_tpu.api import solve_hier
from raptor_tpu.core import pad_vector
from raptor_tpu.gallery import poisson_2d, default_rhs
from raptor_tpu.solve.krylov import STATUS_BREAKDOWN, STATUS_CONVERGED, pcg
from raptor_tpu.utils.checkpoint import load_pytree, save_pytree


def test_hierarchy_checkpoint_roundtrip(tmp_path):
    A = poisson_2d(16)
    hier = setup(A, AmgConfig(splitting="pmis"), dtype=jnp.float64)
    path = os.path.join(tmp_path, "hier")
    save_pytree(path, hier)
    hier2 = load_pytree(path)
    assert hier2.config == hier.config
    assert len(hier2.levels) == len(hier.levels)
    for a, b in zip(hier.levels, hier2.levels):
        assert np.array_equal(np.asarray(a.A.data), np.asarray(b.A.data))
        assert a.n == b.n

    # the restored hierarchy solves
    b = default_rhs(A.shape[0])
    bd = pad_vector(b, hier2.levels[0].A.n_rows_pad)
    x, info = solve_hier(hier2, bd, tol=1e-8, maxiter=100)
    assert float(info.relres) <= 1e-8


def test_solver_state_checkpoint(tmp_path):
    """Solver state (x, r, iter) checkpoints between jit calls: a warm
    restart from the checkpoint continues convergence."""
    A = poisson_2d(16)
    b = default_rhs(A.shape[0])
    hier = setup(A, AmgConfig(splitting="pmis"), dtype=jnp.float64)
    bd = pad_vector(b, hier.levels[0].A.n_rows_pad)
    x1, info1 = solve_hier(hier, bd, tol=1e-4, maxiter=100)
    path = os.path.join(tmp_path, "state")
    save_pytree(path, {"x": x1})
    state = load_pytree(path)
    x2, info2 = solve_hier(hier, bd, tol=1e-8, maxiter=100, x0=state["x"])
    assert float(info2.relres) <= 1e-8
    assert int(info2.iterations) < int(info1.iterations) + 10


def test_cg_breakdown_detection():
    """Indefinite operator -> p^T A p <= 0 -> STATUS_BREAKDOWN (SURVEY.md
    §5.3 solver-level failure detection)."""
    n = 32
    d = jnp.asarray(np.concatenate([np.ones(16), -np.ones(16)]))

    def apply_A(x):
        return d * x

    b = jnp.asarray(default_rhs(n))
    x, info = pcg(apply_A, b, tol=1e-10, maxiter=50)
    assert int(info.status) == STATUS_BREAKDOWN


def test_residual_history_observability():
    A = poisson_2d(16)
    b = default_rhs(A.shape[0])
    x, info = solve(A, b, AmgConfig(splitting="pmis"),
                    SolveConfig(dtype="float64"))
    h = info["res_hist"]
    its = info["iterations"]
    assert np.isfinite(h[: its + 1]).all()
    assert np.isnan(h[its + 1:]).all()  # untouched buffer slots
    assert h[its] <= 1e-8 and h[0] == 1.0
    assert info["stats"]["operator_complexity"] > 1.0


def test_profiling_hooks_smoke(tmp_path):
    from raptor_tpu.utils.profiling import phase, timed, trace

    sink = {}
    with timed("setup", sink):
        with phase("strength"):
            _ = jnp.ones(8) * 2
    assert "setup" in sink and sink["setup"] >= 0


def test_native_kernels_match_python():
    """Native C++ host kernels (RS splitting, greedy coloring) must agree
    exactly with the Python fallbacks."""
    import scipy.sparse as sp

    from raptor_tpu.utils import native
    from tests.oracle import amg_oracle as oracle

    if native.load() is None:
        import pytest

        pytest.skip("no C++ toolchain")

    A = poisson_2d(20)
    S = oracle.classical_strength(A, 0.25)
    cf_native = native.rs_splitting_native(S)
    cf_py = oracle.rs_splitting(S)
    assert np.array_equal(cf_native, np.asarray(cf_py, np.int32))

    g = ((A + A.T) != 0).tocsr()
    color_n, nc_n = native.greedy_coloring_native(g.indptr, g.indices,
                                                  A.shape[0])
    # python fallback (import the module-level implementation directly)
    color_p = -np.ones(A.shape[0], dtype=np.int32)
    for i in range(A.shape[0]):
        nbr = g.indices[g.indptr[i]: g.indptr[i + 1]]
        used = set(color_p[nbr[nbr < i]].tolist()) if nbr.size else set()
        c = 0
        while c in used:
            c += 1
        color_p[i] = c
    assert np.array_equal(color_n, color_p)
    assert nc_n == int(color_p.max()) + 1


def test_hierarchy_determinism_same_seed_bitwise():
    """SURVEY §5.2: same seed => bitwise-identical hierarchy (int-key PMIS
    weights were designed for this; this locks the property in)."""
    import jax

    from raptor_tpu import AmgConfig, setup
    from raptor_tpu.gallery import poisson_3d

    A = poisson_3d(10)
    cfg = AmgConfig(splitting="pmis", smoother="jacobi", seed=7)
    h1 = setup(A, cfg, dtype=np.float64)
    h2 = setup(A, cfg, dtype=np.float64)
    l1 = jax.tree_util.tree_leaves(h1)
    l2 = jax.tree_util.tree_leaves(h2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        assert np.array_equal(np.asarray(a), np.asarray(b)), "nondeterministic leaf"

    # structured engine: one-jit setup, same input => bitwise-same levels
    from raptor_tpu.structured import build_structured_hierarchy, dia_from_stencil

    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for s in (0, 2):
            i[d] = s
            st[tuple(i)] = -1.0
        i[d] = 1
    D = dia_from_stencil(st, (8, 8, 8))
    s1 = build_structured_hierarchy(D, AmgConfig(smoother="mcgs"))
    s2 = build_structured_hierarchy(D, AmgConfig(smoother="mcgs"))
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_setup_and_cycle_clean_under_debug_nans():
    """SURVEY §5.2(a): setup + V-cycle application raise no NaNs under
    JAX's nan-checking mode (the sanitizer analogue for numerical races).
    The Krylov driver is excluded: its residual-history buffer is
    deliberately NaN-padded (see test_residual_history_observability)."""
    import jax
    import jax.numpy as jnp

    from raptor_tpu import AmgConfig, setup
    from raptor_tpu.core import pad_vector
    from raptor_tpu.gallery import default_rhs, poisson_3d
    from raptor_tpu.solve.cycle import cycle

    A = poisson_3d(8)
    b = default_rhs(A.shape[0])
    jax.config.update("jax_debug_nans", True)
    try:
        hier = setup(A, AmgConfig(splitting="pmis", smoother="cheb4"),
                     dtype=jnp.float64)
        bd = pad_vector(b, hier.levels[0].A.n_rows_pad)
        x = cycle(hier, jnp.asarray(bd))
        x = x + cycle(hier, jnp.asarray(bd) - jnp.asarray(x))
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(np.asarray(x)).all()
