"""Aggressive (distance-2) coarsening + multipass interpolation
(SURVEY.md §2b C10/C12; BASELINE.json:9 "strength-of-connection filtering +
aggressive coarsening" — config 3).

Aggressive coarsening selects C points as a maximal independent set of the
*squared* strength graph (C points at graph distance >= 3), roughly halving
the coarse-grid size vs. PMIS at the cost of longer-range interpolation.
The distance-2 MIS reuses the PMIS engine on the boolean G^2 (SpGEMM), the
same pattern as smoothed aggregation (PAPERS.md:8).

Interpolation is Stüben's multipass: F points adjacent to C interpolate
directly; remaining F points interpolate through already-interpolated
strong neighbors,

    w_i· = -( Σ_{k usable} a_ik P_k· ) / ( a_ii + Σ_{unusable} a_ik ),

one SpGEMM per pass (host-synced exact widths; the level loop is
host-driven anyway)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix
from raptor_tpu.ops.sparse_ops import ell_add, spgemm
from raptor_tpu.setup.aggregation import _strength_ell
from raptor_tpu.setup.splitting import F_PT, make_perm, pmis_splitting

__all__ = ["aggressive_splitting", "multipass_interpolation"]


def aggressive_splitting(A: EllMatrix, smask, seed: int) -> jax.Array:
    """Distance-2 PMIS: MIS on G^2 of the symmetrized strength graph."""
    G = _strength_ell(A, smask, with_diag=True)
    G2 = spgemm(G, G)
    g2_off = (G2.cols != G2.row_index()) & G2.slot_mask()
    perm = make_perm(A.shape[0], A.n_rows_pad, seed)
    return pmis_splitting(G2, g2_off, perm)


@jax.jit
def _direct_pass(A: EllMatrix, smask, cf):
    from raptor_tpu.setup.interp import direct_interpolation

    return direct_interpolation(A, smask, cf)


def multipass_interpolation(
    A: EllMatrix, smask, cf, max_passes: int = 4
) -> tuple[EllMatrix, int]:
    """P for a (possibly aggressive) splitting where some F points have no
    strong C neighbor.  Returns (P, nc).  Host-driven passes, device math.
    """
    P, nc_arr = _direct_pass(A, smask, cf)
    nc = int(nc_arr)
    from raptor_tpu.setup.interp import tighten_coarse_space

    P = tighten_coarse_space(P, nc)

    is_real_f = (cf == F_PT) & (jnp.arange(A.n_rows_pad) < A.shape[0])
    for _ in range(max_passes):
        done = P.row_nnz > 0
        todo = is_real_f & ~done
        n_todo = int(jnp.sum(todo))
        if n_todo == 0:
            break
        usable = smask & jnp.take(done, A.cols)
        has_usable = jnp.any(usable, axis=0)
        active = todo & has_usable
        if int(jnp.sum(active)) == 0:
            break
        # W: usable couplings of active rows; everything else collapses
        # into the diagonal normalization
        wvals = jnp.where(usable & active[None, :], A.data, 0)
        W = dataclasses.replace(
            A, data=wvals,
            row_nnz=jnp.where(active, A.row_nnz, 0).astype(jnp.int32),
        )
        used_sum = jnp.sum(wvals, axis=0)
        off = (A.cols != A.row_index()) & A.slot_mask()
        row_sum = jnp.sum(jnp.where(off, A.data, 0), axis=0)
        dtil = A.diagonal() + (row_sum - used_sum)
        dtil = jnp.where(dtil != 0, dtil, 1.0)
        WP = spgemm(W, P)  # (n x nc), rows only at active
        scale = jnp.where(active, -1.0 / dtil, 0.0)
        WP = WP.scale_rows(scale.astype(WP.dtype))
        P = ell_add(P, WP)
    return P, nc
