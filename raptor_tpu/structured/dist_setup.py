"""Weak-scaling distributed structured setup: the whole hierarchy build —
transfers, Galerkin products, eigen-estimates — under ONE shard_map'd jit
(BASELINE.json:11 "weak-scaling SpGEMM setup").

Sharding is the same plane decomposition as the solve
(raptor_tpu.structured.dist): dim0 in contiguous blocks.  The only
communication is plane halos: a DIA x DIA Galerkin product's shifted reads
reach at most ~2 planes across the boundary, exchanged once per product via
two ppermutes.  Every other setup op (collapse weights, compaction,
boundary masks) is local elementwise work, so the setup time per chip is
constant as chips x problem size grow together.

After agglomeration (grid <= tail_size) the coarsest sharded operator is
all_gathered and the tail hierarchy is built with the replicated
single-device routines inside the same traced program.
"""

from __future__ import annotations

import dataclasses

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raptor_tpu.config import AmgConfig
from raptor_tpu.structured.dia import DiaMatrix, _linear, boundary_mask_traced
from raptor_tpu.structured.dist import (
    AXIS,
    SDistHierarchy,
    SDistLevel,
    plan_coarsening_dist,
)
from raptor_tpu.structured.solver import (
    SHierarchy,
    SLevel,
    _build_hierarchy_planned,
    _c_mask,
    _coarse_dims,
    _compact,
    _parity,
)

__all__ = ["sdist_build_hierarchy"]

Vec = Tuple[int, ...]


def _halo_extend(data: jax.Array, LP: int, RP: int) -> jax.Array:
    """Extend (n_off, nl) plane-sharded diagonals with LP/RP halo columns
    from the ring neighbors (one ppermute per direction for all diagonals)."""
    ndev = jax.lax.axis_size(AXIS)
    parts = []
    if LP:
        parts.append(jax.lax.ppermute(
            data[:, -LP:], AXIS, [(i, (i + 1) % ndev) for i in range(ndev)]
        ))
    parts.append(data)
    if RP:
        parts.append(jax.lax.ppermute(
            data[:, :RP], AXIS, [(i, (i - 1) % ndev) for i in range(ndev)]
        ))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else data


def _sdist_mult(A: DiaMatrix, B: DiaMatrix, dims_local: Vec) -> DiaMatrix:
    """C = A @ B on plane shards (dims are LOCAL; offsets vector-exact)."""
    nl = int(np.prod(dims_local))
    linsA = [_linear(o, dims_local) for o in A.offsets]
    LP = max([0] + [-l for l in linsA])
    RP = max([0] + [l for l in linsA])
    B_ext = _halo_extend(B.data, LP, RP)
    out: dict[Vec, list] = {}
    for i, (o1, lin1) in enumerate(zip(A.offsets, linsA)):
        a = A.data[i]
        for j, o2 in enumerate(B.offsets):
            key = tuple(x + y for x, y in zip(o1, o2))
            seg = jax.lax.dynamic_slice(
                B_ext[j], (LP + lin1,), (nl,)
            ) if (LP or RP) else B.data[j]
            out.setdefault(key, []).append(a * seg)
    offs = sorted(out.keys())
    planes = []
    for o in offs:
        acc = out[o][0]
        for t in out[o][1:]:
            acc = acc + t
        planes.append(acc)
    return DiaMatrix(data=jnp.stack(planes), offsets=tuple(offs),
                     dims=dims_local)


def _sdist_transpose(A: DiaMatrix, dims_local: Vec) -> DiaMatrix:
    """A.T on plane shards: dataT_{-o}(i) = data_o(i - lin(o))."""
    nl = int(np.prod(dims_local))
    lins = [_linear(o, dims_local) for o in A.offsets]
    LP = max([0] + [l for l in lins])  # shifting by +lin reads i - lin
    RP = max([0] + [-l for l in lins])
    ext = _halo_extend(A.data, LP, RP)
    items = []
    for k, (o, lin) in enumerate(zip(A.offsets, lins)):
        plane = (jax.lax.dynamic_slice(ext[k], (LP - lin,), (nl,))
                 if (LP or RP) else A.data[k])
        items.append((tuple(-v for v in o), plane))
    items.sort(key=lambda t: t[0])
    return DiaMatrix(data=jnp.stack([p for _, p in items]),
                     offsets=tuple(o for o, _ in items), dims=dims_local)


def _bmask_dist(dims_local: Vec, D0: int, off: Vec) -> jax.Array:
    """Boundary-validity mask on the local box with dim0 judged GLOBALLY
    (traced: uses the shard index)."""
    m = boundary_mask_traced(dims_local, (0,) + tuple(off[1:]))
    if off[0] == 0:
        return m
    me = jax.lax.axis_index(AXIS)
    d0l = dims_local[0]
    gp = me * d0l + jax.lax.broadcasted_iota(jnp.int32, dims_local, 0)
    ok0 = ((gp + off[0] >= 0) & (gp + off[0] < D0)).reshape(-1)
    return m & ok0


def _build_transfer_dist(A: DiaMatrix, dims_local: Vec, D0: int, d: int):
    from raptor_tpu.structured.solver import _collapse_weights

    from raptor_tpu.structured.solver import _c_mask_traced

    cm = _c_mask_traced(dims_local, d)  # d==0: valid because the per-shard
    # plane count is even, so local parity == global parity
    fm = ~cm
    w_m, w_p = _collapse_weights(
        DiaMatrix(data=A.data, offsets=A.offsets, dims=dims_local), d
    )
    nd = len(dims_local)
    e = tuple(1 if ax == d else 0 for ax in range(nd))
    ne = tuple(-1 if ax == d else 0 for ax in range(nd))
    bm_p = _bmask_dist(dims_local, D0, e)
    bm_m = _bmask_dist(dims_local, D0, ne)
    zero_off = tuple([0] * nd)
    data = jnp.stack([
        jnp.where(fm & bm_m, w_m, 0.0).astype(A.dtype),
        cm.astype(A.dtype),
        jnp.where(fm & bm_p, w_p, 0.0).astype(A.dtype),
    ])
    return DiaMatrix(data=data, offsets=(ne, zero_off, e), dims=dims_local)


def _compact_dia_dist(Ae: DiaMatrix, dims_local: Vec, D0: int, d: int):
    cd_local = _coarse_dims(dims_local, d)
    D0c = (D0 + 1) // 2 if d == 0 else D0
    planes, offs = [], []
    for k, o in enumerate(Ae.offsets):
        if o[d] % 2 != 0:
            continue
        oc = tuple(v // 2 if ax == d else v for ax, v in enumerate(o))
        plane = _compact(Ae.data[k], dims_local, d)
        plane = plane * _bmask_dist(cd_local, D0c, oc).astype(Ae.dtype)
        planes.append(plane)
        offs.append(oc)
    return DiaMatrix(data=jnp.stack(planes), offsets=tuple(offs),
                     dims=cd_local)


def _lmax_dist(A: DiaMatrix, dims_local: Vec, dinv, iters=40, safety=1.1):
    from raptor_tpu.structured.dist import _halo_spmv

    nl = int(np.prod(dims_local))
    i = jnp.arange(nl, dtype=A.dtype) + 7.0 * jax.lax.axis_index(AXIS)
    v = jnp.sin(i * 0.7511) + 0.01

    def norm(w):
        return jnp.sqrt(jax.lax.psum(jnp.vdot(w, w), AXIS))

    v = v / norm(v)

    def body(_, v):
        w = dinv * _halo_spmv(A, dims_local, v)
        return w / norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * _halo_spmv(A, dims_local, v)
    num = jax.lax.psum(jnp.vdot(v, w), AXIS)
    den = jax.lax.psum(jnp.vdot(v, v), AXIS)
    return safety * num / den


def sdist_build_hierarchy(
    A: DiaMatrix,
    config: AmgConfig,
    mesh: Mesh,
    dim_policy: str = "operator",
    tail_size: int = 4096,
) -> SDistHierarchy:
    """Distributed structured setup: one jitted shard_map over the mesh.

    ``A`` is the global operator (host or device); its diagonals are sharded
    over the mesh and every sharded level is built with plane-halo
    communication only.  The agglomerated tail is built replicated inside
    the same program.  Returns the same SDistHierarchy the solve consumes.
    """
    ndev = mesh.devices.size
    A = dataclasses.replace(A, const_planes=None)  # uniform pytree metadata
    assert A.dims[0] % ndev == 0
    plan, t = plan_coarsening_dist(A, config, ndev, dim_policy, tail_size)
    dims_global = A.dims
    D0 = dims_global[0]

    # static shape bookkeeping for the sharded prefix
    dims_seq = [dims_global]
    for d in plan:
        dims_seq.append(_coarse_dims(dims_seq[-1], d))

    def _dist_parity(dl):
        # per-shard plane count is even at sharded levels => local parity
        # equals global parity
        return _parity(dl) == 0

    def body(data):
        Ak = DiaMatrix(data=data, offsets=A.offsets,
                       dims=(dims_global[0] // ndev,) + dims_global[1:])
        levels = []
        D0k = D0
        for k in range(t):
            d = plan[k]
            dl = Ak.dims
            Pt = _build_transfer_dist(Ak, dl, D0k, d)
            Rt = _sdist_transpose(Pt, dl)
            Ae = _sdist_mult(Rt, _sdist_mult(Ak, Pt, dl), dl)
            Ac = _compact_dia_dist(Ae, dl, D0k, d)
            diag = Ak.diagonal()
            dinv = 1.0 / jnp.where(jnp.abs(diag) > 0, diag, 1.0)
            lmax = (_lmax_dist(Ak, dl, dinv)
                    if config.smoother in ("chebyshev", "cheb4") else None)
            lev = SDistLevel(
                A=Ak, Pt=Pt, Rt=Rt, dinv=dinv, red=_dist_parity(dl),
                cheb_lmax=lmax, dims_local=dl, cdim=d,
            )
            levels.append(lev)
            Ak = Ac
            if d == 0:
                D0k = (D0k + 1) // 2

        # agglomerate: gather the coarsest sharded operator.  The tail is
        # built OUTSIDE this shard_map (on the replicated gathered data) so
        # the whole sharded program runs with full replication checking
        # (check_vma on — the SURVEY §5.2 TSAN analogue).  The gather is
        # expressed as scatter-into-zeros + psum because psum output is
        # statically replication-inferred while all_gather's is not.
        nloc = Ak.data.shape[1]
        me = jax.lax.axis_index(AXIS)
        buf = jnp.zeros((Ak.data.shape[0], nloc * ndev), Ak.data.dtype)
        zero = jnp.zeros((), me.dtype)
        buf = jax.lax.dynamic_update_slice(buf, Ak.data, (zero, me * nloc))
        glob_planes = jax.lax.psum(buf, AXIS)
        return tuple(levels), glob_planes

    # ---- static output structure (offset algebra mirrors the body) ----
    def mult_offs(a, b):
        return tuple(sorted({tuple(x + y for x, y in zip(o1, o2))
                             for o1 in a for o2 in b}))

    def compact_offs(offs, d):
        return tuple(sorted({
            tuple(v // 2 if ax == d else v for ax, v in enumerate(o))
            for o in offs if o[d] % 2 == 0
        }))

    nd = len(dims_global)
    zero = tuple([0] * nd)
    lev_specs = []
    offs_k = A.offsets
    for k in range(t):
        d = plan[k]
        dl = (dims_seq[k][0] // ndev,) + dims_seq[k][1:]
        e = tuple(1 if ax == d else 0 for ax in range(nd))
        ne = tuple(-1 if ax == d else 0 for ax in range(nd))
        p_offs = (ne, zero, e)
        lev_specs.append(SDistLevel(
            A=DiaMatrix(data=P(None, AXIS), offsets=offs_k, dims=dl),
            Pt=DiaMatrix(data=P(None, AXIS), offsets=p_offs, dims=dl),
            Rt=DiaMatrix(data=P(None, AXIS), offsets=p_offs, dims=dl),
            dinv=P(AXIS), red=P(AXIS),
            cheb_lmax=(P() if config.smoother in ("chebyshev", "cheb4")
                       else None),
            dims_local=dl, cdim=d,
        ))
        offs_k = compact_offs(mult_offs(p_offs, mult_offs(offs_k, p_offs)), d)

    # shard the fine diagonals over the mesh and run (replication checking
    # stays ON — SURVEY §5.2)
    dims_t = dims_seq[t]
    data = jax.device_put(
        jnp.asarray(A.data), NamedSharding(mesh, P(None, AXIS))
    )
    run = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, AXIS),
        out_specs=(tuple(lev_specs), P()),
    ))
    levels, tail_data = run(data)
    # replicated tail built outside the shard_map (same traced program
    # family; compile is cached per shape like the rest of the setup)
    A_tail = DiaMatrix(data=tail_data, offsets=offs_k, dims=dims_t)
    tail = _build_hierarchy_planned(A_tail, config, plan[t:])
    return SDistHierarchy(levels=levels, tail=tail, config=config, ndev=ndev)
