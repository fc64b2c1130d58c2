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
