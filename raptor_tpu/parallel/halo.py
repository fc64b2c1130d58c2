"""Halo exchange execution over the ICI mesh axis (SURVEY.md §2b C7, §3b
stack 5).

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``ParComm`` (MPI Isend/Irecv);
BASELINE.json:5 — "node-aware TAPS communication maps to jax.lax.ppermute
halo exchange over ICI".

Runs inside ``shard_map``: gather the precomputed send indices from the
owned vector, one ``ppermute`` ring round per offset (XLA overlaps the
rounds; on TPU each round rides the ICI torus), scatter into the extended
vector.  All shapes static — plan padding scatters to a drop slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raptor_tpu.parallel.partition import DistMatrix, HaloPlan

__all__ = ["halo_exchange", "dist_spmv", "psum_dot"]


def halo_exchange(x_own: jax.Array, plan: HaloPlan, axis: str = "x") -> jax.Array:
    """Extend the owned vector with halo values from neighbor shards.

    Call inside shard_map; ``x_own`` is the (n_local,) owned shard; returns
    the (n_ext,) extended vector [owned | halo | drop-slot].
    """
    ndev = jax.lax.axis_size(axis)
    x_ext = jnp.zeros(plan.n_ext, x_own.dtype).at[: plan.n_local].set(x_own)
    for d, sidx, rtgt in zip(plan.offsets, plan.send_idx, plan.recv_tgt):
        # plan arrays are sharded (1, m_d) per device
        buf = jnp.take(x_own, sidx[0], axis=0)
        perm = [(i, (i + d) % ndev) for i in range(ndev)]
        buf = jax.lax.ppermute(buf, axis, perm)
        x_ext = x_ext.at[rtgt[0]].set(buf, mode="drop")
    return x_ext


def dist_spmv(A: DistMatrix, x_own: jax.Array, axis: str = "x") -> jax.Array:
    """y_local = A_local @ [x_own | halo(x)].  Inside shard_map."""
    from raptor_tpu.ops.sparse_ops import spmv

    x_ext = halo_exchange(x_own, A.halo, axis)
    return spmv(A.local_ell(), x_ext)


def psum_dot(axis: str = "x"):
    """Distributed inner product: local dot + one psum over the mesh axis —
    the only global synchronization per Krylov iteration (SURVEY.md §3b)."""

    def dot(a, b):
        return jax.lax.psum(jnp.vdot(a, b), axis)

    return dot
