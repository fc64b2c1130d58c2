"""TAPS-routed distributed AMG solve over a (node, chip) 2D mesh.

Capability target (SURVEY.md §0 — the public RAPtor AMG library named by
BASELINE.json:5; convergence spec = tests/oracle/amg_oracle.py): RAPtor's
node-aware TAPComm used BY THE SOLVER, not just as a standalone exchange —
BASELINE.json:5 "node-aware TAPS communication maps to jax.lax.ppermute halo
exchange over ICI".

This is the 2D-mesh variant of ``parallel.dist.dist_solve``: identical
hierarchy data and cycle arithmetic (the TAPS extended-vector layout is
bit-compatible with the flat one — same sorted-unique ghost order, proven in
tests/distributed/test_taps.py), with every halo exchange executed as the
two-level gather → single inter-node transfer → scatter of
``parallel.taps.taps_exchange``.  The intra-node ("chip") axis models ICI,
the inter-node ("node") axis models DCN.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raptor_tpu.ops.sparse_ops import spmv
from raptor_tpu.parallel.dist import (
    CommCtx,
    DistHierarchy,
    _dist_cycle,
    _info_struct,
    distribute_hierarchy,
    hier_spec,
)
from raptor_tpu.parallel.taps import TapsPlan, build_taps_plan, taps_exchange
from raptor_tpu.setup.hierarchy import Hierarchy
from raptor_tpu.solve.krylov import bicgstab, krylov_dispatch, pcg

__all__ = [
    "TapsDistHierarchy",
    "distribute_hierarchy_taps",
    "dist_solve_taps",
    "make_taps_mesh",
]

NODE, CHIP = "node", "chip"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "plans"],
    meta_fields=["keys", "n_nodes", "n_chips"],
)
@dataclasses.dataclass(frozen=True)
class TapsDistHierarchy:
    """Flat DistHierarchy + one TapsPlan per (operator, level) slot.

    ``keys`` holds the static slot names ("A", k) / ("P", k) / ("R", k)
    aligned with ``plans`` (keys are metadata so the pytree leaves are
    arrays only)."""

    base: DistHierarchy
    plans: Tuple[TapsPlan, ...]
    keys: Tuple[Tuple[str, int], ...]
    n_nodes: int
    n_chips: int

    def plan(self, slot) -> TapsPlan:
        return self.plans[self.keys.index(slot)]


def make_taps_mesh(n_nodes: int, n_chips: int) -> Mesh:
    devs = jax.devices()
    assert len(devs) >= n_nodes * n_chips
    return jax.make_mesh((n_nodes, n_chips), (NODE, CHIP),
                         devices=devs[: n_nodes * n_chips])


def distribute_hierarchy_taps(
    hier: Hierarchy, n_nodes: int, n_chips: int, tail_size: int = 4096
) -> TapsDistHierarchy:
    """Shard like ``distribute_hierarchy`` and attach TAPS plans per sharded
    operator (the flat column remap is reused — layouts coincide)."""
    ndev = n_nodes * n_chips
    base = distribute_hierarchy(hier, ndev, tail_size=tail_size)
    t = len(base.levels)
    plans, keys = [], []
    for k in range(t):
        lev = hier.levels[k]
        pA, _ = build_taps_plan(lev.A, n_nodes, n_chips)
        plans.append(pA)
        keys.append(("A", k))
        if k + 1 < t:
            nlc = hier.levels[k + 1].A.n_rows_pad // ndev
            nlf = lev.A.n_rows_pad // ndev
            pR, _ = build_taps_plan(lev.R, n_nodes, n_chips, n_col_owned=nlf)
            pP, _ = build_taps_plan(lev.P, n_nodes, n_chips, n_col_owned=nlc)
            plans.extend([pR, pP])
            keys.extend([("R", k), ("P", k)])
    return TapsDistHierarchy(base=base, plans=tuple(plans), keys=tuple(keys),
                             n_nodes=n_nodes, n_chips=n_chips)


def _taps_ctx(th: TapsDistHierarchy) -> CommCtx:
    def sp(slot, dm, x_own):
        x_ext = taps_exchange(x_own, th.plan(slot), NODE, CHIP)
        return spmv(dm.local_ell(), x_ext)

    def shard_index():
        return (jax.lax.axis_index(NODE) * th.n_chips
                + jax.lax.axis_index(CHIP))

    return CommCtx(sp=sp, axes=(NODE, CHIP), shard_index=shard_index)


def _plan_spec(pl: TapsPlan) -> TapsPlan:
    s = P(NODE, CHIP, None)
    return TapsPlan(
        send_idx=tuple(s for _ in pl.send_idx),
        recv_tgt=tuple(s for _ in pl.recv_tgt),
        local_src=s, local_tgt=s,
        offsets=pl.offsets, n_local=pl.n_local, n_ext=pl.n_ext,
        n_nodes=pl.n_nodes, n_chips=pl.n_chips,
    )


def _hier_spec_taps(th: TapsDistHierarchy) -> TapsDistHierarchy:
    base = hier_spec(th.base)
    # the flat spec uses axis name "x"; rewrite vector/matrix shardings to
    # the flattened ("node", "chip") tuple of the 2D mesh
    def rewrite(spec):
        if isinstance(spec, P):
            return P(*(("node", "chip") if ax == "x" else ax for ax in spec))
        return spec

    base = jax.tree_util.tree_map(
        rewrite, base, is_leaf=lambda x: isinstance(x, P))
    plans = tuple(_plan_spec(pl) for pl in th.plans)
    return TapsDistHierarchy(base=base, plans=plans, keys=th.keys,
                             n_nodes=th.n_nodes, n_chips=th.n_chips)


def dist_solve_taps(
    th: TapsDistHierarchy,
    b,
    mesh: Mesh,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
):
    """Jitted distributed AMG-Krylov solve with TAPS halo exchange.

    ``b`` is the global padded rhs; returns (global solution, KrylovInfo).
    """
    b = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P((NODE, CHIP))))

    @partial(jax.jit, static_argnames=("krylov", "maxiter"))
    def run(th, b, tol, krylov, maxiter):
        def body(th, b):
            ctx = _taps_ctx(th)
            lev0 = th.base.levels[0]

            def apply_A(x):
                return ctx.sp(("A", 0), lev0.A, x)

            def apply_M(r):
                return _dist_cycle(th.base, r, ctx)

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), (NODE, CHIP))

            solver = krylov_dispatch(krylov)
            return solver(apply_A, b, apply_M, tol=tol, maxiter=maxiter,
                          dot_fn=dot)

        rep_info = jax.tree_util.tree_map(
            lambda _: P(), _info_struct(maxiter, b.dtype))
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(_hier_spec_taps(th), P((NODE, CHIP))),
            out_specs=(P((NODE, CHIP)), rep_info),
        )(th, b)

    return run(th, b, tol, krylov, maxiter)
