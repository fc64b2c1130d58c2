"""Dense coarse-tail materialization (docs/DESIGN.md §4, VERDICT r2 weak
#2 / missing #5): the sub-cycle below the tail level is linear, so setup
folds it into ONE dense operator and the solve replaces the recursion —
dozens of latency-bound tiny SpMVs — with a single MXU matvec.

The fold must be *algebraically identical* to the recursion it replaces
(same smoothers, transfers, coarse solve — only the evaluation order
changes), so cycle outputs agree to rounding and iteration counts match.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.api import AmgConfig, SolveConfig, setup, solve
from raptor_tpu.gallery import poisson_3d


def _cycle_pair(cfg):
    """Hierarchies with and without the dense tail for a 12^3 Poisson."""
    A = poisson_3d(12)
    h1 = setup(A, cfg)
    h0 = setup(A, dataclasses.replace(cfg, tail_max_n=0))
    return A, h1, h0


@pytest.mark.parametrize("cycle", ["V", "W"])
def test_algebraic_tail_matches_recursion(cycle):
    from raptor_tpu.solve.cycle import cycle as amg_cycle

    cfg = AmgConfig(splitting="pmis", smoother="jacobi", cycle=cycle)
    A, h1, h0 = _cycle_pair(cfg)
    assert h1.tail_start >= 1 and h1.tail_op is not None
    assert h0.tail_op is None
    n_t = h1.levels[h1.tail_start].A.n_rows_pad
    assert h1.tail_op.shape == (n_t, n_t)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(h1.levels[0].A.n_rows_pad)
                    .astype(np.float32))
    y1 = np.asarray(amg_cycle(h1, b))
    y0 = np.asarray(amg_cycle(h0, b))
    assert np.allclose(y1, y0, atol=2e-3 * np.abs(y0).max())


def test_algebraic_tail_solve_iterations_match():
    cfg = AmgConfig(splitting="pmis", smoother="mcgs")
    A = poisson_3d(14)
    b = np.ones(A.shape[0])
    x1, i1 = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True))
    x0, i0 = solve(A, b, dataclasses.replace(cfg, tail_max_n=0),
                   SolveConfig(tol=1e-8, refine=True))
    assert i1["relres"] <= 1e-8 and i0["relres"] <= 1e-8
    assert abs(i1["iterations"] - i0["iterations"]) <= 1
    assert np.linalg.norm(A @ x1 - b) / np.linalg.norm(b) <= 1e-7


@pytest.mark.slow
def test_structured_tail_matches_recursion():
    from tests.unit.test_dia import stencil_7pt
    from raptor_tpu.structured.dia import dia_from_stencil
    from raptor_tpu.structured.solver import (build_structured_hierarchy,
                                              scycle)

    st = stencil_7pt()
    A = dia_from_stencil(st, (12, 12, 12), dtype=np.float32)
    cfg = AmgConfig(smoother="mcgs")
    h1 = build_structured_hierarchy(A, cfg)
    h0 = build_structured_hierarchy(
        A, dataclasses.replace(cfg, tail_max_n=0))
    assert h1.tail_start >= 1 and h1.tail_op is not None
    assert h0.tail_op is None

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(A.n).astype(np.float32))
    y1 = np.asarray(scycle(h1, b))
    y0 = np.asarray(scycle(h0, b))
    assert np.allclose(y1, y0, atol=2e-3 * np.abs(y0).max())


def test_structured_tail_bf16_storage_follows_operators():
    """bf16-stored hierarchies store the tail operator in bf16 too (same
    HBM-traffic rule as A/Pt/Rt, structured.solver.cast_hierarchy)."""
    from tests.unit.test_dia import stencil_7pt
    from raptor_tpu.structured.dia import dia_from_stencil
    from raptor_tpu.structured.solver import build_structured_hierarchy

    st = stencil_7pt()
    A = dia_from_stencil(st, (8, 8, 8), dtype=np.float32)
    h = build_structured_hierarchy(
        A, AmgConfig(smoother="mcgs", operator_store_dtype="bfloat16"))
    assert h.tail_op is not None and h.tail_op.dtype == jnp.bfloat16
