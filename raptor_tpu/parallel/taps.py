"""TAPS-style two-level aggregated halo exchange (SURVEY.md §2b C8).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``TAPComm`` 3-step node-aware communication
(BASELINE.json:5 — "node-aware TAPS communication maps to jax.lax.ppermute
halo exchange over ICI").  The original trades many small inter-node
messages for one aggregated message routed through a designated on-node
process.  The TPU mesh analogue uses a 2D mesh ("node" = slow/DCN axis,
"chip" = fast/ICI axis):

  1. gather: all chips of a node all_gather their contributions over the
     ICI axis (cheap),
  2. transfer: the node aggregate is split evenly across the node's chips
     and ONE ppermute per node-ring-offset moves it over the DCN axis —
     each chip carries 1/n_chip of the aggregate, so the slow axis sees a
     single large, perfectly-balanced transfer instead of n_chip^2 small
     ones,
  3. scatter: receivers all_gather the pieces over ICI and scatter into
     their halo slots.

Plans are host-precomputed static index arrays, exactly like the flat plan
(raptor_tpu.parallel.partition); execution is jit-traceable inside
shard_map over the 2D mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.ell import EllMatrix

__all__ = ["TapsPlan", "build_taps_plan", "taps_exchange"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "recv_tgt", "local_src", "local_tgt"],
    meta_fields=["offsets", "n_local", "n_ext", "n_nodes", "n_chips"],
)
@dataclasses.dataclass(frozen=True)
class TapsPlan:
    """Per node-ring-offset d:
    send_idx[d]: (n_nodes, n_chips, m_d) int32 — local indices each chip
                 contributes to its node's aggregate for destination node
                 (node+d) (padding: 0, value ignored by receiver).
    recv_tgt[d]: (n_nodes, n_chips, n_chips*m_d) int32 — where each chip
                 scatters the reassembled aggregate from source node
                 (node-d) into its extended vector (padding: n_ext = drop).
    """

    send_idx: Tuple[jax.Array, ...]
    recv_tgt: Tuple[jax.Array, ...]
    local_src: jax.Array  # (n_nodes, n_chips, m_l) node-local ghost sources
    local_tgt: jax.Array  # (n_nodes, n_chips, m_l) extended-vector targets
    offsets: Tuple[int, ...]
    n_local: int
    n_ext: int
    n_nodes: int
    n_chips: int


def build_taps_plan(E: EllMatrix, n_nodes: int, n_chips: int,
                    n_col_owned: int | None = None):
    """Two-level plan from a global ELL row-partitioned over n_nodes*n_chips
    contiguous blocks.  Returns (TapsPlan, remapped cols) compatible with
    DistMatrix's extended-vector convention (same sorted-unique ghost order,
    so the remapped cols are interchangeable with ``distribute_matrix``'s).

    ``n_col_owned``: owned-column count per device for rectangular transfer
    operators (defaults to the per-device row count for square operators).
    """
    ndev = n_nodes * n_chips
    n_rows = E.n_rows_pad
    assert n_rows % ndev == 0
    nl = n_rows // ndev
    nc_own = n_col_owned if n_col_owned is not None else nl
    assert E.n_cols_pad == nc_own * ndev, (E.n_cols_pad, nc_own, ndev)

    cols = np.asarray(E.cols)
    nnz = np.asarray(E.row_nnz)
    K = E.K
    mask = np.arange(K)[:, None] < nnz[None, :]
    owner = cols // nc_own
    shard_of_row = np.repeat(np.arange(ndev), nl)[None, :]

    ghosts = []
    for p in range(ndev):
        sel = mask & (shard_of_row == p) & (owner != p)
        ghosts.append(np.unique(cols[sel]))
    n_halo = max((g.size for g in ghosts), default=0)
    n_ext = nc_own + n_halo + 1

    new_cols = np.zeros_like(cols)
    for p in range(ndev):
        c = cols[:, p * nl:(p + 1) * nl]
        m = mask[:, p * nl:(p + 1) * nl]
        gpos = np.searchsorted(ghosts[p], c)
        gpos = np.clip(gpos, 0, max(ghosts[p].size - 1, 0))
        is_ghost = (c // nc_own) != p
        mapped = np.where(is_ghost, nc_own + gpos, c - p * nc_own)
        new_cols[:, p * nl:(p + 1) * nl] = np.where(m, mapped, 0)

    node_of = lambda p: p // n_chips
    send_idx, recv_tgt, offsets = [], [], []
    for d in range(1, n_nodes):
        # node N sends to node (N+d): the union over (N+d)'s chips' ghosts
        # that node N owns, in global sorted order (canonical aggregate order)
        agg = {}
        for Nn in range(n_nodes):
            dstN = (Nn + d) % n_nodes
            need = np.unique(np.concatenate(
                [ghosts[dstN * n_chips + c] for c in range(n_chips)]
            )) if n_chips else np.zeros(0, np.int64)
            need = need[(need // (nc_own * n_chips)) == Nn]  # owned by node Nn
            agg[Nn] = need
        m_total = max(v.size for v in agg.values())
        if m_total == 0:
            continue
        m_d = -(-m_total // n_chips)  # per-chip piece size
        S = np.zeros((n_nodes, n_chips, m_d), dtype=np.int32)
        Rt = np.full((n_nodes, n_chips, n_chips * m_d), n_ext, dtype=np.int32)
        for Nn in range(n_nodes):
            g = agg[Nn]  # global indices node Nn sends to node Nn+d
            padded = np.zeros(n_chips * m_d, dtype=np.int64)
            padded[: g.size] = g
            # chip c of node Nn contributes slice [c*m_d:(c+1)*m_d] of the
            # node aggregate, gathered from the node-gathered buffer; but
            # the gather step collects each chip's OWN rows — so the
            # aggregate must be indexed against the node-local vector.
            for c in range(n_chips):
                piece = padded[c * m_d:(c + 1) * m_d]
                # index into the node's concatenated owned vector
                S[Nn, c] = (piece - Nn * n_chips * nc_own).astype(np.int32)
            # receiver side: node (Nn+d)'s chips scatter the aggregate
            dstN = (Nn + d) % n_nodes
            for c in range(n_chips):
                p = dstN * n_chips + c
                gl = ghosts[p]
                pos = np.searchsorted(gl, padded[: g.size])
                hit = (pos < gl.size) & (gl[np.clip(pos, 0, gl.size - 1)]
                                         == padded[: g.size])
                tgt = np.full(n_chips * m_d, n_ext, dtype=np.int32)
                tgt[: g.size][hit] = (nc_own + pos[hit]).astype(np.int32)
                Rt[dstN, c] = tgt
        send_idx.append(jnp.asarray(S))
        recv_tgt.append(jnp.asarray(Rt))
        offsets.append(d)

    # intra-node ghosts: filled straight from the node-level all_gather
    m_l = 0
    locs = []
    for p in range(ndev):
        Nn = node_of(p)
        g = ghosts[p]
        same = g[(g // (nc_own * n_chips)) == Nn]
        rank = np.searchsorted(g, same)
        locs.append((same - Nn * n_chips * nc_own, nc_own + rank))
        m_l = max(m_l, same.size)
    Ls = np.zeros((n_nodes, n_chips, max(m_l, 1)), dtype=np.int32)
    Lt = np.full((n_nodes, n_chips, max(m_l, 1)), n_ext, dtype=np.int32)
    for p in range(ndev):
        src, tgt = locs[p]
        Ls[node_of(p), p % n_chips, : src.size] = src
        Lt[node_of(p), p % n_chips, : tgt.size] = tgt

    plan = TapsPlan(
        send_idx=tuple(send_idx), recv_tgt=tuple(recv_tgt),
        local_src=jnp.asarray(Ls), local_tgt=jnp.asarray(Lt),
        offsets=tuple(offsets), n_local=nc_own, n_ext=n_ext,
        n_nodes=n_nodes, n_chips=n_chips,
    )
    return plan, jnp.asarray(new_cols)


def taps_exchange(
    x_own: jax.Array, plan: TapsPlan,
    node_axis: str = "node", chip_axis: str = "chip",
) -> jax.Array:
    """Two-level exchange inside shard_map over a (node, chip) mesh.

    x_own: (n_local,) owned shard.  Returns the (n_ext,) extended vector.
    Plan arrays arrive shard-sliced: send_idx (1,1,m), recv_tgt (1,1,C*m).
    """
    x_ext = jnp.zeros(plan.n_ext, x_own.dtype).at[: plan.n_local].set(x_own)
    n_nodes = plan.n_nodes

    # node-local concatenated vector (ICI all_gather — step 1)
    x_node = jax.lax.all_gather(x_own, chip_axis, tiled=True)
    # intra-node ghosts come straight off the ICI gather (RAPtor's L-comm)
    x_ext = x_ext.at[plan.local_tgt[0, 0]].set(
        jnp.take(x_node, plan.local_src[0, 0], axis=0), mode="drop"
    )

    for d, sidx, rtgt in zip(plan.offsets, plan.send_idx, plan.recv_tgt):
        piece = jnp.take(x_node, sidx[0, 0], axis=0)  # my 1/C of the aggregate
        # step 2: ONE inter-node transfer, split across chips
        perm = [(i, (i + d) % n_nodes) for i in range(n_nodes)]
        piece = jax.lax.ppermute(piece, node_axis, perm)
        # step 3: reassemble within the node (ICI) and scatter
        agg = jax.lax.all_gather(piece, chip_axis, tiled=True)
        x_ext = x_ext.at[rtgt[0, 0]].set(agg, mode="drop")
    return x_ext
