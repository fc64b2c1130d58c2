"""Strength of connection, jit-traceable (SURVEY.md §2b C9).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): the reference stack's classical strength graph
(RAPtor ``strength.cpp``; BASELINE.json:5 "strength graph ... under jit",
BASELINE.json:9 "strength-of-connection filtering" for anisotropy).

The strength graph is represented *aligned with A*: a boolean slot mask of
the same (K, n_pad) shape as ``A.data`` — no reshuffling, every consumer
combines the mask with ``A.cols`` directly.  This keeps strength a pure
VPU-elementwise pass over the entry-major layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix

__all__ = ["strength_mask", "strong_transpose_counts"]


def strength_mask(A: EllMatrix, theta: float, kind: str = "classical") -> jax.Array:
    """(K, n_pad) bool: slot (k, i) True iff entry a_ij is a strong connection.

    classical: -a_ij >= theta * max_k(-a_ik)   (only negative couplings)
    abs:      |a_ij| >= theta * max_k |a_ik|   (symmetric variant)
    """
    off = (A.cols != A.row_index()) & A.slot_mask()
    if kind == "classical":
        v = jnp.where(off, -A.data, -jnp.inf)
        row_max = jnp.max(v, axis=0)
        return off & (v >= theta * row_max) & (row_max > 0) & (v > 0)
    elif kind == "abs":
        v = jnp.where(off, jnp.abs(A.data), 0)
        row_max = jnp.max(v, axis=0)
        return off & (v >= theta * row_max) & (v > 0)
    raise ValueError(f"unknown strength kind: {kind}")


def strong_transpose_counts(A: EllMatrix, smask: jax.Array) -> jax.Array:
    """lambda_i = |S^T_i|: how many points strongly depend on i (scatter)."""
    tgt = jnp.where(smask, A.cols, A.n_cols_pad)
    ones = jnp.ones_like(tgt)
    return (
        jnp.zeros(A.n_cols_pad, jnp.int32).at[tgt].add(ones, mode="drop")
    )
