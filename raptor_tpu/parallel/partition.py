"""Row partitioning and halo-exchange plan construction (SURVEY.md §2b C1/C7).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``Partition``/``Topology`` and ``ParComm``
communication-package construction.  Plans are precomputed on host at setup
from the partition + off-process column sets, then baked as static index
arrays into the jitted solve — "comm-package construction is separated from
comm execution" (SURVEY.md §5.8).

The execution model (see raptor_tpu.parallel.halo) is ring rounds of
``jax.lax.ppermute`` over the ICI mesh axis: for ring offset d, every device
sends a fixed-width buffer to device (i+d).  Widths are maxima over devices
(static shapes); devices with less traffic pad, receivers drop padding via
an out-of-range scatter target.  For contiguous row partitions of stencil
problems only offsets ±1 carry traffic, so this degenerates to the classic
nearest-neighbor halo exchange.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.ell import EllMatrix, ell_from_csr, ell_to_csr

__all__ = ["HaloPlan", "DistMatrix", "distribute_matrix", "plan_and_remap",
           "repartition_pad"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "recv_tgt"],
    meta_fields=["offsets", "n_local", "n_ext"],
)
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Precomputed exchange plan.

    send_idx: per ring offset, (ndev, m_d) int32 — indices into the local
              owned vector to gather into the send buffer (0-padded).
    recv_tgt: per ring offset, (ndev, m_d) int32 — indices into the extended
              vector to scatter received values to (n_ext = drop slot).
    offsets:  static ring offsets with nonzero traffic.
    n_local:  owned vector length per device.
    n_ext:    extended vector length: n_local + halo capacity (+1 drop slot).
    """

    send_idx: Tuple[jax.Array, ...]
    recv_tgt: Tuple[jax.Array, ...]
    offsets: Tuple[int, ...]
    n_local: int
    n_ext: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols", "row_nnz", "halo"],
    meta_fields=["n_rows_local", "K", "shape"],
)
@dataclasses.dataclass(frozen=True)
class DistMatrix:
    """Row-sharded ELL operator whose columns index the extended (owned +
    halo) vector of the *column* partition (RAPtor's on_proc/off_proc split
    collapsed into one local ELL with remapped columns; SURVEY.md §2b C4).

    Arrays are global (stacked over devices); shard over the last axis of
    data/cols and the only axis of row_nnz.  Inside ``shard_map`` use
    ``local_ell()`` to view the shard as a plain EllMatrix.
    """

    data: jax.Array  # (K, ndev * n_rows_local)
    cols: jax.Array  # (K, ndev * n_rows_local) -> [0, halo.n_ext)
    row_nnz: jax.Array  # (ndev * n_rows_local,)
    halo: HaloPlan
    n_rows_local: int
    K: int
    shape: Tuple[int, int]

    def local_ell(self) -> EllMatrix:
        """View the (per-device) shard as an EllMatrix. Call inside shard_map."""
        return EllMatrix(
            data=self.data,
            cols=self.cols,
            row_nnz=self.row_nnz,
            shape=(self.n_rows_local, self.halo.n_ext),
            n_rows_pad=self.n_rows_local,
            n_cols_pad=self.halo.n_ext,
        )


def repartition_pad(E: EllMatrix, ndev: int, dtype=None):
    """Host: re-pad a global square ELL so the row count divides ndev*8
    (identity padding rows), returning the new EllMatrix."""
    a = ell_to_csr(E)
    return ell_from_csr(a, dtype=dtype or np.dtype(str(E.dtype)),
                        row_pad_multiple=8 * ndev)


def distribute_matrix(E: EllMatrix, ndev: int, n_col_owned: int | None = None):
    """Split a global ELL into a DistMatrix over ``ndev`` contiguous row
    blocks, building the halo plan from the off-block column sets.

    ``n_col_owned``: owned-column count per device (defaults to row count per
    device for square operators; for rectangular P/R pass the column
    partition's per-device size).
    """
    n_rows = E.n_rows_pad
    assert n_rows % ndev == 0, "rows must divide the device count (repad first)"
    nl = n_rows // ndev
    nc_own = n_col_owned if n_col_owned is not None else nl
    assert E.n_cols_pad == nc_own * ndev, (E.n_cols_pad, nc_own, ndev)

    plan, new_cols = plan_and_remap(
        np.asarray(E.cols), np.asarray(E.row_nnz), ndev, nc_own
    )
    return DistMatrix(
        data=jnp.asarray(np.asarray(E.data)),
        cols=jnp.asarray(new_cols),
        row_nnz=jnp.asarray(np.asarray(E.row_nnz)),
        halo=plan,
        n_rows_local=nl,
        K=E.K,
        shape=E.shape,
    )


def plan_and_remap(cols: np.ndarray, nnz: np.ndarray, ndev: int, nc_own: int,
                   extra_ghosts=None):
    """Host structure pass shared by ``distribute_matrix`` and the
    distributed setup (parallel.dist_setup): from global ELL structure
    (``cols`` (K, n_rows), ``nnz`` (n_rows,), contiguous row blocks, column
    space owned ``nc_own`` per device) build the HaloPlan and the
    extended-vector column remap.  Values never pass through here — this is
    RAPtor-style comm-package construction, index bookkeeping only.

    ``extra_ghosts``: optional per-device arrays of additional global
    indices each device must receive beyond the matrix's own column
    pattern — the distributed RAP of LONG-RANGE interpolation (multipass,
    distance >= 2) needs fine rows outside the operator's distance-1 halo
    (parallel.dist_setup._run_rap assembles owned coarse rows from them).
    """
    K, n_rows = cols.shape
    assert n_rows % ndev == 0
    nl = n_rows // ndev
    mask = np.arange(K)[:, None] < nnz[None, :]

    owner = cols // nc_own  # (K, n_rows)
    shard_of_row = np.repeat(np.arange(ndev), nl)[None, :]

    # ghost columns per shard (sorted unique off-owned cols of real entries)
    ghosts = []
    for p in range(ndev):
        sel = mask & (shard_of_row == p) & (owner != p)
        g = cols[sel]
        if extra_ghosts is not None and len(extra_ghosts[p]):
            e = np.asarray(extra_ghosts[p])
            g = np.concatenate([g, e[e // nc_own != p]])
        ghosts.append(np.unique(g))
    n_halo = max((g.size for g in ghosts), default=0)
    n_ext = nc_own + n_halo + 1  # +1 drop slot

    # remap columns to extended-vector indices
    new_cols = np.zeros_like(cols)
    for p in range(ndev):
        rsel = shard_of_row == p
        c = cols[:, p * nl:(p + 1) * nl]
        m = mask[:, p * nl:(p + 1) * nl]
        local = c - p * nc_own
        gpos = np.searchsorted(ghosts[p], c)
        gpos = np.clip(gpos, 0, max(ghosts[p].size - 1, 0))
        is_ghost = (c // nc_own) != p
        mapped = np.where(is_ghost, nc_own + gpos, local)
        new_cols[:, p * nl:(p + 1) * nl] = np.where(m, mapped, 0)

    # ring rounds: offset d sends p -> (p+d) % ndev
    send_idx, recv_tgt, offsets = [], [], []
    for d in range(1, ndev):
        per_dev_send = []
        per_dev_recv = []
        m_d = 0
        for p in range(ndev):
            q = (p + d) % ndev  # p sends q's ghosts that p owns
            g = ghosts[q]
            owned_by_p = g[(g // nc_own) == p]
            per_dev_send.append(owned_by_p - p * nc_own)  # local indices on p
            # q receives from (q - d) % ndev = p' — compute per receiver below
            m_d = max(m_d, owned_by_p.size)
        for q in range(ndev):
            src = (q - d) % ndev
            g = ghosts[q]
            from_src = np.nonzero((g // nc_own) == src)[0]  # ghost ranks
            per_dev_recv.append(nc_own + from_src)
        if m_d == 0:
            continue
        S = np.zeros((ndev, m_d), dtype=np.int32)
        Rt = np.full((ndev, m_d), n_ext, dtype=np.int32)  # drop by default
        for p in range(ndev):
            s = per_dev_send[p]
            S[p, : s.size] = s
            r = per_dev_recv[p]
            Rt[p, : r.size] = r
        send_idx.append(jnp.asarray(S))
        recv_tgt.append(jnp.asarray(Rt))
        offsets.append(d)

    plan = HaloPlan(
        send_idx=tuple(send_idx),
        recv_tgt=tuple(recv_tgt),
        offsets=tuple(offsets),
        n_local=nc_own,
        n_ext=n_ext,
    )
    return plan, new_cols
