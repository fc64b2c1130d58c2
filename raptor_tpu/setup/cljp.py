"""CLJP parallel classical coarsening, jit-traceable (SURVEY.md §2b C11).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's CLJP splitting (``par_splitting.cpp``;
BASELINE.json:5 "classical (Ruge-Stuben/PMIS/CLJP)").

Cleary-Luby-Jones-Plassmann: weights w_i = |S_i^T| + rand; each round

  0. undecided points whose weight fell below 1 (no remaining dependents)
     become F,
  1. the independent set of local weight maxima over the active strength
     graph becomes C,
  2. weight-update heuristics rewire the graph:
     H1 — a new C point c stops depending on its influences j in S_c:
          remove c's out-edges, decrement w_j;
     H2 — if j and k both strongly depend on a common new C point c and
          j depends on k, j can get k's information through c:
          remove edge (j, k), decrement w_k;
     edges into new C points (satisfied dependencies) are removed.

TPU adaptation: H2's common-new-C test is evaluated with random 31-bit
signatures (each new C draws a bit; rows OR the bits of their new-C
targets; an edge matches when the signatures intersect).  Rare false
positives remove an edge a round early — a benign perturbation of the
serial CLJP trajectory that preserves independence/coverage/termination
(property-tested).  Weights use the same exact-int32 (lambda*n + perm)
total order as PMIS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix
from raptor_tpu.setup.splitting import (
    C_PT,
    F_PT,
    UNDECIDED,
    splitting_weights,
)
from raptor_tpu.setup.strength import strong_transpose_counts

__all__ = ["cljp_splitting"]


@jax.jit
def cljp_splitting(A: EllMatrix, smask: jax.Array, perm: jax.Array) -> jax.Array:
    """CLJP C/F splitting. Returns (n_pad,) int32 in {C_PT, F_PT}."""
    n = A.n_rows_pad
    K = A.K
    row = A.row_index()
    lam0 = strong_transpose_counts(A, smask)
    ones_kn = jnp.ones((K, n), jnp.int32)

    def scatter_count(mask):
        return (
            jnp.zeros(n, jnp.int32)
            .at[jnp.where(mask, A.cols, n)]
            .add(ones_kn, mode="drop")
        )

    def body(state):
        cf, lam, edges, it = state

        # 0. no remaining dependents -> F.  lam is tracked UNCLAMPED so a
        # node with >63 strong dependents is not forced F prematurely when
        # edges are removed (ADVICE r1); the clamp applies only inside the
        # weight encoding below.
        cf = jnp.where((cf == UNDECIDED) & (lam <= 0), F_PT, cf)
        und = cf == UNDECIDED
        w = splitting_weights(lam, perm, n)

        # 1. independent set of local maxima over active edges (both dirs)
        w_und = jnp.where(und, w, -1)
        row_part = jnp.max(jnp.where(edges, jnp.take(w_und, A.cols), -1), axis=0)
        edge_w = jnp.where(edges, jnp.take(w_und, row), -1)
        col_part = (
            jnp.full(n, -1, w.dtype)
            .at[jnp.where(edges, A.cols, n)]
            .max(edge_w, mode="drop")
        )
        nmax = jnp.maximum(row_part, col_part)
        new_c = und & (w > nmax)
        cf = jnp.where(new_c, C_PT, cf)

        # 2a. H1: new C rows stop depending on their influences
        h1 = edges & jnp.take(new_c, row)
        dec = scatter_count(h1)

        # 2b. edges into new C are satisfied
        to_c = edges & jnp.take(new_c, A.cols)

        # 2c. H2 with random bit signatures
        key = jax.random.fold_in(jax.random.PRNGKey(17), it)
        bits = jax.random.randint(key, (n,), 0, 31, dtype=jnp.int32)
        cbit = jnp.where(new_c, jnp.left_shift(jnp.int32(1), bits), 0)
        sig = jnp.zeros(n, jnp.int32)
        for k in range(K):  # per-slot scatter-OR of the target's bit
            m = to_c[k]
            contrib = jnp.where(m, jnp.take(cbit, A.cols[k]), 0)
            part = (
                jnp.zeros(n, jnp.int32)
                .at[jnp.where(m, row[k], n)]
                .max(contrib, mode="drop")
            )
            sig = sig | part
        still_und = und & ~new_c
        share = (jnp.take(sig, row) & jnp.take(sig, A.cols)) != 0
        h2 = (
            edges
            & share
            & jnp.take(still_und, row)
            & jnp.take(still_und, A.cols)
        )
        dec = dec + scatter_count(h2)

        lam = lam - dec
        edges = edges & ~h1 & ~to_c & ~h2
        return cf, lam, edges, it + 1

    def cond(state):
        cf, lam, edges, it = state
        return jnp.any(cf == UNDECIDED) & (it < 500)

    cf, _lam, edges, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.full(n, UNDECIDED, jnp.int32), lam0, smask, jnp.int32(0)),
    )
    return jnp.where(cf == UNDECIDED, F_PT, cf)
