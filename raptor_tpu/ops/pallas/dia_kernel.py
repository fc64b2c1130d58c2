"""Pallas TPU kernel: fused DIA SpMV (SURVEY.md §2b C5 — "SpMV ... are
Pallas kernels", BASELINE.json:5).

The XLA fallback (raptor_tpu.structured.dia.dia_spmv) materializes one
rolled copy of x per diagonal: ~2 HBM passes over x per offset plus the
diagonal planes.  This kernel DMAs each x tile ONCE into VMEM (with a
lane-aligned halo window; overlapping windows are not expressible as
BlockSpecs, so the window is copied manually) and accumulates every
diagonal out of the single resident window.  Traffic drops to
(n_off + ~3) vector passes — the bandwidth floor for this operator.

Layout: vectors are viewed as (rows, 128) lane tiles.  A diagonal's shifted
read at linear offset ``lin`` decomposes statically into a row offset
``q = (Hp+lin)//128`` and lane offset ``c``; the unaligned segment is two
static 2D slices concatenated on the lane axis.  x is zero-padded by the
lane-rounded max |offset| (``Hp``) on both sides, so reads stay in-bounds
and boundary-zeroed diagonals annihilate wrap values."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv_pallas", "supports_pallas"]

LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def supports_pallas() -> bool:
    return jax.devices()[0].platform == "tpu"


@partial(jax.jit, static_argnames=("lins", "tile", "interpret"))
def _dia_pallas_call(data, x_pad, lins: tuple, tile: int, interpret: bool = False):
    n_off, n = data.shape
    H = max(abs(l) for l in lins) if lins else 0
    Hp = _round_up(max(H, 1), LANE)
    HpR = Hp // LANE
    R = tile // LANE  # rows per tile
    grid = n // tile
    win_rows = R + 2 * HpR

    x2 = x_pad.reshape(-1, LANE)
    d3 = data.reshape(n_off, n // LANE, LANE)

    def kernel(x_hbm, d_ref, o_ref, xw, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * R, win_rows), :], xw, sem
        )
        cp.start()
        cp.wait()
        acc = None
        for k, lin in enumerate(lins):
            q, c = divmod(Hp + lin, LANE)
            if c == 0:
                seg = xw[q:q + R, :]
            else:
                seg = jnp.concatenate(
                    [xw[q:q + R, c:], xw[q + 1:q + 1 + R, :c]], axis=1
                )
            term = d_ref[k].astype(seg.dtype) * seg  # accumulate in x dtype
            acc = term if acc is None else acc + term
        o_ref[:, :] = acc

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded x, DMA'd manually
            # (explicit HBM: with ANY, XLA may place small inputs in VMEM
            # inside larger programs and the manual DMA faults the worker)
            pl.BlockSpec((n_off, R, LANE), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, LANE), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // LANE, LANE), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANE), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2, d3)
    return out.reshape(-1)


def dia_spmv_pallas(data, offsets_lin, x, tile: int = 65536, interpret: bool = False):
    """y = DIA-spmv via the fused Pallas kernel.

    data: (n_off, n) with n a multiple of 128; offsets_lin: static tuple of
    linear offsets; x: (n,)."""
    n_off, n = data.shape
    lins = tuple(int(l) for l in offsets_lin)
    H = max(abs(l) for l in lins) if lins else 0
    Hp = _round_up(max(H, 1), LANE)
    tile = min(tile, n)
    while n % tile != 0:  # shrink to a divisor (n is lane-padded upstream)
        tile //= 2
        if tile < LANE:
            raise ValueError(f"cannot tile n={n}")
    x_pad = jnp.concatenate(
        [jnp.zeros(Hp, x.dtype), x, jnp.zeros(Hp, x.dtype)]
    )
    return _dia_pallas_call(data, x_pad, lins, tile, interpret)
