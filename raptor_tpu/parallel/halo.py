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

__all__ = ["halo_exchange", "halo_exchange_many", "halo_reduce", "dist_spmv",
           "psum_dot"]


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


def halo_exchange_many(M: jax.Array, plan: HaloPlan, axis: str = "x") -> jax.Array:
    """Row-batched halo exchange: ``M`` is (K, n_local) — K vectors sharing
    one plan (e.g. the K ELL slots of a matrix's rows, exchanged so each
    device holds whole neighbor *rows*, the distributed-SpGEMM prerequisite).
    Returns (K, n_ext)."""
    ndev = jax.lax.axis_size(axis)
    K = M.shape[0]
    ext = jnp.zeros((K, plan.n_ext), M.dtype).at[:, : plan.n_local].set(M)
    for d, sidx, rtgt in zip(plan.offsets, plan.send_idx, plan.recv_tgt):
        buf = jnp.take(M, sidx[0], axis=1)
        perm = [(i, (i + d) % ndev) for i in range(ndev)]
        buf = jax.lax.ppermute(buf, axis, perm)
        ext = ext.at[:, rtgt[0]].set(buf, mode="drop")
    return ext


def halo_reduce(
    x_ext: jax.Array, plan: HaloPlan, axis: str = "x", op: str = "add"
) -> jax.Array:
    """Adjoint of ``halo_exchange``: fold halo-slot contributions back onto
    their owners (the AMG-setup analogue of distributed FEM assembly — used
    by the distributed setup for strong-transpose counts and PMIS scatter
    reductions over incoming edges).

    ``x_ext`` is the (n_ext,) extended vector whose halo slots hold partial
    contributions for remote-owned entries; returns the (n_local,) owned
    vector with every remote contribution combined in (``op`` ∈ {add, max}).
    Reverses each ring round of the plan: gather at recv_tgt, ppermute by
    -d, combine at send_idx.  The drop slot (n_ext) reads as the op identity
    so plan padding is inert.
    """
    ndev = jax.lax.axis_size(axis)
    ident = jnp.zeros((), x_ext.dtype) if op == "add" else (
        jnp.finfo(x_ext.dtype).min if jnp.issubdtype(x_ext.dtype, jnp.floating)
        else jnp.iinfo(x_ext.dtype).min)
    padded = jnp.concatenate([x_ext, jnp.full(1, ident, x_ext.dtype)])
    out = x_ext[: plan.n_local]
    for d, sidx, rtgt in zip(plan.offsets, plan.send_idx, plan.recv_tgt):
        buf = jnp.take(padded, rtgt[0], axis=0)  # halo partials (or identity)
        perm = [(i, (i - d) % ndev) for i in range(ndev)]
        buf = jax.lax.ppermute(buf, axis, perm)
        if op == "add":
            out = out.at[sidx[0]].add(buf)
        else:
            out = out.at[sidx[0]].max(buf)
    return out


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
