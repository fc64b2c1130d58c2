"""Distributed structured multigrid: plane-sharded DIA over the ICI mesh.

Config 5 (BASELINE.json:11 "3D Poisson 256^3 sharded: distributed
hierarchy, ppermute halo exchange, weak-scaling setup") on the structured
fast path: shard the slowest grid dimension (contiguous plane blocks), so

* every level operator's cross-shard reach is exactly one plane (offsets
  along dim0 are in {-1,0,1}), so a SpMV needs ONE ppermute halo round in
  each direction — boundary planes ride the ICI torus while the interior
  rolls locally (the TAPS-analogue locality structure of SURVEY.md §2b C8),
* dim0 linear offsets are identical locally and globally (dim0 is slowest),
  so the local shard IS a DiaMatrix on the local grid box,
* coarsening dim0 stays perfectly balanced while the per-shard plane count
  is even; the plan then switches to the other dims, and the small tail is
  agglomerated (replicated) exactly like the algebraic path.

``distribute_structured`` builds globally (one jit) then shards the fine
levels; ``raptor_tpu.structured.dist_setup.sdist_build_hierarchy`` is the
weak-scaling variant that runs the whole setup under shard_map with plane
halos (BASELINE.json:11 "weak-scaling setup").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raptor_tpu.config import AmgConfig
from raptor_tpu.solve.krylov import bicgstab, krylov_dispatch, pcg
from raptor_tpu.structured.dia import DiaMatrix, _linear
from raptor_tpu.structured.solver import (
    SHierarchy,
    SLevel,
    _coarse_dims,
    _compact,
    _expand,
    _parity,
    _slevel,
    plan_coarsening,
    _build_hierarchy_planned,
)

__all__ = ["SDistHierarchy", "distribute_structured", "sdist_solve",
           "plan_coarsening_dist"]

AXIS = "x"
Vec = Tuple[int, ...]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Pt", "Rt", "dinv", "red", "cheb_lmax"],
    meta_fields=["dims_local", "cdim"],
)
@dataclasses.dataclass(frozen=True)
class SDistLevel:
    """Arrays are global (noff, n) / (n,), sharded over the lane axis; meta
    describes the per-shard box.  dim0 linear offsets coincide locally and
    globally, so the shard viewed with dims_local is a valid DiaMatrix."""

    A: DiaMatrix  # dims = GLOBAL dims; data sharded
    Pt: Optional[DiaMatrix]
    Rt: Optional[DiaMatrix]
    dinv: jax.Array
    red: jax.Array
    cheb_lmax: Optional[jax.Array]  # replicated scalar
    dims_local: Vec
    cdim: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "tail"],
    meta_fields=["config", "ndev"],
)
@dataclasses.dataclass(frozen=True)
class SDistHierarchy:
    levels: Tuple[SDistLevel, ...]
    tail: SHierarchy  # replicated agglomerated coarse hierarchy
    config: AmgConfig
    ndev: int


def plan_coarsening_dist(
    A: DiaMatrix, config: AmgConfig, ndev: int, dim_policy: str = "operator",
    tail_size: int = 4096,
) -> tuple[Tuple[int, ...], int]:
    """(plan, n_sharded_levels): like plan_coarsening, but while a level is
    sharded dim0 is only coarsened if the per-shard plane count stays even
    (balanced shards, parity-aligned compaction); sharding stops
    (agglomeration onto replicas) once the grid drops below tail_size."""
    # full-coarsening steps are not supported by the plane-sharded
    # distributed kernels yet: plan with semicoarsening only
    full = plan_coarsening(A, config, dim_policy, allow_full=False)
    dims = list(A.dims)
    plan = []
    t = 0
    counting = True
    for d in full:
        bad0 = (dims[0] // ndev) % 2 != 0 or (dims[0] // 2) // ndev < 2
        if counting and d == 0 and bad0:
            # coarsening dim0 would unbalance or de-shard the next level:
            # replan this step onto the largest other dim if possible
            alts = [ax for ax in range(1, len(dims)) if dims[ax] > 3]
            if not alts:
                counting = False
            else:
                d = max(alts, key=lambda ax: dims[ax])
        plan.append(d)
        dims[d] = (dims[d] + 1) // 2
        if counting and int(np.prod(dims)) > tail_size \
                and dims[0] % ndev == 0 and (dims[0] // ndev) >= 2:
            t += 1
        else:
            counting = False
    return tuple(plan), max(t, 1)


def distribute_structured(
    A: DiaMatrix, config: AmgConfig, ndev: int,
    dim_policy: str = "operator", tail_size: int = 4096,
) -> SDistHierarchy:
    """Build (single jitted setup) then shard the fine levels over ndev."""
    assert A.dims[0] % ndev == 0, "dim0 must divide the device count"
    plan, t = plan_coarsening_dist(A, config, ndev, dim_policy, tail_size)
    assert 1 <= t < len(plan) + 1
    hier = _build_hierarchy_planned(A, config, plan)

    strip = lambda m: None if m is None else dataclasses.replace(
        m, const_planes=None)  # keep dist pytree metadata uniform
    dlevels = []
    for k in range(t):
        lev = hier.levels[k]
        d0l = lev.dims[0] // ndev
        dims_local = (d0l,) + lev.dims[1:]
        dlevels.append(
            SDistLevel(
                A=strip(lev.A), Pt=strip(lev.Pt), Rt=strip(lev.Rt),
                dinv=lev.dinv, red=lev.red, cheb_lmax=lev.cheb_lmax,
                dims_local=dims_local, cdim=lev.cdim,
            )
        )
    tail_levels = tuple(
        dataclasses.replace(lv, A=strip(lv.A), Pt=strip(lv.Pt),
                            Rt=strip(lv.Rt))
        for lv in hier.levels[t:]
    )
    tail = SHierarchy(levels=tail_levels, coarse_inv=hier.coarse_inv,
                      config=config)
    if config.tail_max_n > 0:
        # replace the whole replicated coarse cycle with one dense matvec
        # (min_start=0: the dist tail is already coarse at its level 0)
        from raptor_tpu.structured.solver import materialize_tail

        tail = materialize_tail(tail, config.tail_max_n, min_start=0)
    return SDistHierarchy(levels=tuple(dlevels), tail=tail,
                          config=config, ndev=ndev)


# ---------------------------------------------------------------------------
# sharded kernels (inside shard_map)
# ---------------------------------------------------------------------------

def _local_dia(A: DiaMatrix, dims_local: Vec) -> DiaMatrix:
    """View the shard as a DiaMatrix on the local box (same linear offsets)."""
    return DiaMatrix(data=A.data, offsets=A.offsets, dims=dims_local)


def _halo_spmv(A: DiaMatrix, dims_local: Vec, x_own: jax.Array) -> jax.Array:
    """SpMV with one ppermute halo round per direction.

    Halo widths are the exact extremal linear offsets (a mixed offset like
    (+1,+1,0) reaches one plane *plus* one line beyond the shard, so widths
    can exceed one plane but never two — the plan keeps >=2 local planes).
    Wrap reads at the global boundary are annihilated by the
    boundary-zeroed diagonals.

    Large shards route the local compute through the Pallas DIA v2 kernel
    (halo-extended variant, ops/pallas/dia_kernel.dia_spmv_pallas_v2_halo) —
    the same kernel win as the single-chip path (VERDICT r2 missing #3);
    small shards and non-TPU backends use the XLA dynamic-slice rolls.
    """
    from raptor_tpu.structured import dia as _dia

    ndev = jax.lax.axis_size(AXIS)
    nl = x_own.shape[0]
    lins = [_linear(o, dims_local) for o in A.offsets]
    LP = max(0, -min(lins))  # static
    RP = max(0, max(lins))
    zero = jnp.zeros(0, x_own.dtype)
    recv_l = jax.lax.ppermute(  # my tail -> right neighbor's left halo
        x_own[-LP:], AXIS, [(i, (i + 1) % ndev) for i in range(ndev)]
    ) if LP else zero
    recv_r = jax.lax.ppermute(  # my head -> left neighbor's right halo
        x_own[:RP], AXIS, [(i, (i - 1) % ndev) for i in range(ndev)]
    ) if RP else zero

    if (_dia._pallas_route() and nl >= _dia.PALLAS_MIN_N and nl % 128 == 0
            and A.data.dtype in (jnp.float32, jnp.bfloat16)
            and x_own.dtype == jnp.float32):
        try:
            from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas_v2_halo

            return dia_spmv_pallas_v2_halo(
                A.data, tuple(lins), x_own, recv_l, recv_r,
                interpret=_dia.PALLAS_INTERPRET)
        except ValueError:
            pass  # no viable VMEM tile for this shard: XLA path below

    x_ext = jnp.concatenate([recv_l, x_own, recv_r])
    y = None
    for k, lin in enumerate(lins):
        term = A.data[k] * jax.lax.dynamic_slice(x_ext, (LP + lin,), (nl,))
        y = term if y is None else y + term
    return y


def _sdist_smooth(lev: SDistLevel, cfg: AmgConfig, b, x, backward: bool,
                  x0_zero: bool = False):
    """``x0_zero`` (trace-time): x == 0 on entry, so the first residual is
    exactly ``b`` — elides one halo-SpMV (rolls + ppermute halo) per level
    per cycle (XLA does not fold A@0; see solver._smooth)."""
    sweeps = cfg.nu2 if backward else cfg.nu1
    if sweeps == 0:
        return x
    spmv = lambda v: _halo_spmv(lev.A, lev.dims_local, v)
    first = [x0_zero]  # consumed by the FIRST residual below

    def res(x):
        if first[0]:
            first[0] = False
            return b
        return b - spmv(x)

    if cfg.smoother == "jacobi":
        for _ in range(sweeps):
            x = x + cfg.omega * lev.dinv * res(x)
        return x
    if cfg.smoother == "mcgs":
        order = (False, True) if backward else (True, False)
        for _ in range(sweeps):
            for red_turn in order:
                r = res(x)
                upd = lev.red if red_turn else ~lev.red
                x = x + jnp.where(upd, lev.dinv * r, 0)
        return x
    if cfg.smoother == "cheb4":
        r = res(x)
        d = (4.0 / 3.0) / lev.cheb_lmax * (lev.dinv * r)
        x = x + d
        for k in range(2, cfg.cheb_degree + 1):
            r = r - spmv(d)
            d = ((2 * k - 3) / (2 * k + 1)) * d + (
                (8 * k - 4) / (2 * k + 1) / lev.cheb_lmax
            ) * (lev.dinv * r)
            x = x + d
        return x
    if cfg.smoother == "chebyshev":  # mirrors solver._smooth 1st-kind variant
        lmax = lev.cheb_lmax
        lmin = lmax / 30.0
        dd = (lmax + lmin) / 2
        cc = (lmax - lmin) / 2
        p = jnp.zeros_like(x)
        alpha = jnp.zeros_like(dd)
        for i in range(cfg.cheb_degree):
            z = lev.dinv * res(x)
            if i == 0:
                p, alpha = z, 1.0 / dd
            else:
                beta = (cc * alpha / 2) ** 2
                alpha = 1.0 / (dd - beta / alpha)
                p = z + beta * p
            x = x + alpha * p
        return x
    raise ValueError(f"distributed structured smoother: {cfg.smoother}")


def _sdist_level(dh: SDistHierarchy, k: int, b):
    cfg = dh.config
    lev = dh.levels[k]
    x = _sdist_smooth(lev, cfg, b, jnp.zeros_like(b), backward=False,
                      x0_zero=True)
    r = b - _halo_spmv(lev.A, lev.dims_local, x) if cfg.nu1 else b
    rr = _halo_spmv(lev.Rt, lev.dims_local, r)
    if k + 1 < len(dh.levels):
        rc = _compact(rr, lev.dims_local, lev.cdim)
        ec = _sdist_level(dh, k + 1, rc)
        if cfg.cycle == "W":
            # second coarse visit (gamma=2); sharded levels always have the
            # tail below, so the single-device k+1 < nlev-1 guard holds
            lev1 = dh.levels[k + 1]
            rc2 = rc - _halo_spmv(lev1.A, lev1.dims_local, ec)
            ec = ec + _sdist_level(dh, k + 1, rc2)
        e = _expand(ec, lev.dims_local, lev.cdim)
    else:
        # agglomerate: gather the (small) coarse residual, run the
        # replicated tail cycle, slice our plane block back
        rc_loc = _compact(rr, lev.dims_local, lev.cdim)
        rc = jax.lax.all_gather(rc_loc, AXIS, tiled=True)
        ec = _slevel(dh.tail, cfg, 0, rc)
        if cfg.cycle == "W" and len(dh.tail.levels) > 1:
            from raptor_tpu.structured.dia import dia_spmv

            rc2 = rc - dia_spmv(dh.tail.levels[0].A, ec)
            ec = ec + _slevel(dh.tail, cfg, 0, rc2)
        nl_c = rc_loc.shape[0]
        me = jax.lax.axis_index(AXIS)
        ec_loc = jax.lax.dynamic_slice(ec, (me * nl_c,), (nl_c,))
        e = _expand(ec_loc, lev.dims_local, lev.cdim)
    x = x + _halo_spmv(lev.Pt, lev.dims_local, e)
    x = _sdist_smooth(lev, cfg, b, x, backward=True)
    return x


def sdist_cycle(dh: SDistHierarchy, b):
    return _sdist_level(dh, 0, b)


def _hier_spec(dh: SDistHierarchy) -> SDistHierarchy:
    sharded_dia = lambda m: None if m is None else DiaMatrix(
        data=P(None, AXIS), offsets=m.offsets, dims=m.dims
    )
    levels = tuple(
        SDistLevel(
            A=sharded_dia(lv.A), Pt=sharded_dia(lv.Pt), Rt=sharded_dia(lv.Rt),
            dinv=P(AXIS), red=P(AXIS),
            cheb_lmax=None if lv.cheb_lmax is None else P(),
            dims_local=lv.dims_local, cdim=lv.cdim,
        )
        for lv in dh.levels
    )
    tail = jax.tree_util.tree_map(lambda _: P(), dh.tail)
    return SDistHierarchy(levels=levels, tail=tail, config=dh.config,
                          ndev=dh.ndev)


def sdist_solve(
    dh: SDistHierarchy,
    b,
    mesh: Mesh,
    tol: float = 1e-8,
    maxiter: int = 200,
    krylov: str = "cg",
):
    """Jitted distributed structured AMG-PCG solve over the mesh."""
    b = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P(AXIS)))

    @partial(jax.jit, static_argnames=("krylov", "maxiter"))
    def run(dh, b, tol, krylov, maxiter):
        def body(dh, b):
            lev0 = dh.levels[0]

            def apply_A(x):
                return _halo_spmv(lev0.A, lev0.dims_local, x)

            def apply_M(r):
                return sdist_cycle(dh, r)

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), AXIS)

            solver = krylov_dispatch(krylov)
            return solver(apply_A, b, apply_M, tol=tol, maxiter=maxiter,
                          dot_fn=dot)

        from raptor_tpu.solve.krylov import KrylovInfo

        info_spec = KrylovInfo(iterations=P(), status=P(), relres=P(),
                               res_hist=P())
        return jax.shard_map(
            body, mesh=mesh, in_specs=(_hier_spec(dh), P(AXIS)),
            out_specs=(P(AXIS), info_spec),
        )(dh, b)

    return run(dh, b, tol, krylov, maxiter)
