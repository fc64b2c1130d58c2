"""AMG hierarchy construction (SURVEY.md §2b C14, §3b stack 2).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``multilevel/par_multilevel.hpp`` setup loop.

The level loop runs on host (shapes shrink per level, so each level body is
a separately-jitted static-shape program — SURVEY.md §3b: "Levels loop runs
on host (shapes change per level); each level body is jitted with static
shapes").  Inside a level everything is on device: strength mask, PMIS
splitting, direct interpolation, transpose, and the Galerkin RAP — the
"setup ... end-to-end under jit" of BASELINE.json:5.  The only host syncs
are the per-level coarse-size / output-width reads that static shaping
requires (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import EllMatrix, ell_from_csr
from raptor_tpu.ops.sparse_ops import ell_filter, ell_transpose, spgemm
from raptor_tpu.setup.interp import (
    add_identity_padding,
    classical_interpolation,
    direct_interpolation,
    tighten_coarse_space,
)
from raptor_tpu.setup.splitting import make_perm, pmis_splitting, rs_splitting_host
from raptor_tpu.setup.strength import strength_mask
from raptor_tpu.solve.smoothers import estimate_lmax, greedy_coloring_host

__all__ = ["Level", "Hierarchy", "build_hierarchy", "hierarchy_stats"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "P", "R", "dinv", "color", "cheb_lmax", "Abell",
                 "binv", "Aband", "Pband", "Rband"],
    meta_fields=["n", "ncolors"],
)
@dataclasses.dataclass(frozen=True)
class Level:
    """One level of the hierarchy (a pytree; SURVEY.md §2b C16)."""

    A: EllMatrix
    dinv: jax.Array
    P: Optional[EllMatrix]  # None on the coarsest level
    R: Optional[EllMatrix]
    color: Optional[jax.Array]  # (n_pad,) int32 for multicolor GS
    cheb_lmax: Optional[jax.Array]  # scalar for Chebyshev
    n: int  # logical (unpadded) dof count
    ncolors: int
    # block layout (BASELINE.json:5,10): present when the level carries a
    # BlockEllMatrix re-laying of A (SA/elasticity with a block smoother) —
    # the solve path then applies A and the smoother through b x b blocks
    Abell: Optional["object"] = None  # BlockEllMatrix
    binv: Optional[jax.Array] = None  # (nb_pad, b, b) diag-block inverses
    # banded layout (BASELINE.json:5 general CSR): present when the level
    # carries a BandedMatrix re-laying of A (fine_layout='banded'; the
    # whole hierarchy lives in the fine level's RCM ordering, so the
    # per-level layouts use identity perms and P/R are untouched)
    Aband: Optional["object"] = None  # core.hybrid.BandedMatrix
    Pband: Optional["object"] = None  # core.hybrid.RectBanded (transfer)
    Rband: Optional["object"] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "coarse_inv", "perm", "iperm"],
    meta_fields=["config"],
)
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    levels: Tuple[Level, ...]
    coarse_inv: jax.Array  # dense inverse of the coarsest operator
    config: AmgConfig
    # fine_layout='banded': the hierarchy lives in the RCM ordering of the
    # input; perm maps RCM slot -> original index (api.solve permutes the
    # rhs in and the solution out).  None for identity ordering.
    perm: Optional[jax.Array] = None
    iperm: Optional[jax.Array] = None

    @property
    def num_levels(self) -> int:
        return len(self.levels)


@jax.jit
def _dense_inverse(A: EllMatrix) -> jax.Array:
    """Explicit dense inverse of the (identity-padded, SPD) coarsest
    operator: the coarse solve is then one MXU matvec (triangular
    back-substitution is sequential and latency-bound on TPU)."""
    n = A.n_rows_pad
    vals = jnp.where(A.slot_mask(), A.data, 0)
    dense = jnp.zeros((n, n), A.dtype).at[A.row_index(), A.cols].add(vals)
    return jnp.linalg.inv(dense)


def _smoother_data(A: EllMatrix, cfg: AmgConfig, smask):
    """Per-level smoother precomputation (colors / Chebyshev eigenvalue)."""
    d = A.diagonal()
    dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    color, ncolors, lmax = None, 1, None
    if cfg.smoother == "mcgs":
        # coloring on the (host) adjacency of A — setup-only transfer
        from raptor_tpu.core.ell import ell_to_csr

        a = ell_to_csr(A)
        g = ((a + a.T) != 0).tocsr()
        col_np, ncolors = greedy_coloring_host(g.indptr, g.indices, a.shape[0])
        pad = np.zeros(A.n_rows_pad, dtype=np.int32)
        pad[: a.shape[0]] = col_np
        color = jnp.asarray(pad)
    elif cfg.smoother in ("chebyshev", "cheb4", "block_cheb"):
        # block_cheb levels that get a block layout override this with the
        # block-preconditioned estimate; others fall back to scalar cheb4
        lmax = estimate_lmax(A, dinv)
    return dinv, color, ncolors, lmax


def build_hierarchy(A, config: AmgConfig = AmgConfig(), dtype=jnp.float32) -> Hierarchy:
    """Build an AMG hierarchy from a scipy.sparse matrix or EllMatrix.

    Classical path (RS / PMIS splitting + direct interpolation).  The
    smoothed-aggregation path lives in raptor_tpu.setup.aggregation and is
    dispatched from raptor_tpu.api.
    """
    if not isinstance(A, EllMatrix):
        A = ell_from_csr(A, dtype=dtype, row_pad_multiple=config.pad_multiple)

    levels = []
    n = A.shape[0]
    while len(levels) + 1 < config.max_levels and n > config.coarse_size:
        smask = strength_mask(A, config.theta, config.strength)
        if config.aggressive:
            from raptor_tpu.setup.aggressive import (
                aggressive_splitting,
                multipass_interpolation,
            )

            cf = aggressive_splitting(A, smask, config.seed + len(levels))
            P, nc = multipass_interpolation(A, smask, cf)
            if nc == 0 or nc >= n:
                break
            R = ell_transpose(P)
            AP = spgemm(A, P)
            Ac = add_identity_padding(spgemm(R, AP), nc)
            dinv, color, ncolors, lmax = _smoother_data(A, config, smask)
            levels.append(
                Level(A=A, dinv=dinv, P=P, R=R, color=color, cheb_lmax=lmax,
                      n=n, ncolors=ncolors)
            )
            A, n = Ac, nc
            continue
        if config.splitting == "rs":
            cf = _rs_split_device(A, smask)
        elif config.splitting == "pmis":
            perm = make_perm(n, A.n_rows_pad, config.seed + len(levels))
            cf = pmis_splitting(A, smask, perm)
        elif config.splitting == "cljp":
            from raptor_tpu.setup.cljp import cljp_splitting

            perm = make_perm(n, A.n_rows_pad, config.seed + len(levels))
            cf = cljp_splitting(A, smask, perm)
        else:
            raise ValueError(f"unknown splitting: {config.splitting}")

        if config.interp == "classical":
            P_wide, nc_arr = classical_interpolation(A, smask, cf)
        else:
            P_wide, nc_arr = direct_interpolation(A, smask, cf)
        nc = int(nc_arr)
        if nc == 0 or nc >= n:
            break
        P = tighten_coarse_space(P_wide, nc, config.pad_multiple)
        R = ell_transpose(P)
        AP = spgemm(A, P)
        Ac = add_identity_padding(spgemm(R, AP), nc)
        if config.filter_tol > 0:
            Ac = ell_filter(Ac, config.filter_tol)

        dinv, color, ncolors, lmax = _smoother_data(A, config, smask)
        levels.append(
            Level(A=A, dinv=dinv, P=P, R=R, color=color, cheb_lmax=lmax,
                  n=n, ncolors=ncolors)
        )
        A, n = Ac, nc

    dinv, color, ncolors, lmax = _smoother_data(A, config, None)
    levels.append(
        Level(A=A, dinv=dinv, P=None, R=None, color=color, cheb_lmax=lmax,
              n=n, ncolors=ncolors)
    )
    inv = _dense_inverse(A)
    return Hierarchy(levels=tuple(levels), coarse_inv=inv, config=config)


def _rs_split_device(A: EllMatrix, smask) -> jax.Array:
    """Serial RS splitting: strength mask from device, splitting on host
    (inherently sequential; config-1 / CPU path, BASELINE.json:7)."""
    import scipy.sparse as sp

    sm = np.asarray(smask)
    cols = np.asarray(A.cols)
    rows = np.broadcast_to(np.arange(A.n_rows_pad), (A.K, A.n_rows_pad))
    S = sp.coo_matrix(
        (np.ones(int(sm.sum())), (rows[sm], cols[sm])),
        shape=(A.n_rows_pad, A.n_rows_pad),
    ).tocsr()
    cf = rs_splitting_host(S)
    return jnp.asarray(cf.astype(np.int32))


def hierarchy_stats(hier: Hierarchy) -> dict[str, Any]:
    """Grid/operator complexity report (SURVEY.md §5.5)."""
    sizes = [lev.n for lev in hier.levels]
    nnzs = [int(lev.A.nnz) for lev in hier.levels]
    return {
        "levels": len(sizes),
        "sizes": sizes,
        "nnz": nnzs,
        "grid_complexity": float(sum(sizes) / sizes[0]),
        "operator_complexity": float(sum(nnzs) / nnzs[0]),
    }
