"""Attribute the algebraic-engine 128^3 V-cycle on hardware (round 4).

Builds via api.setup (the exact bench.py alg128 configuration, including
the dense coarse tail) and times each level's cycle ops with shape-safe
rep loops, plus one full-cycle ground-truth measurement.  Output is
unbuffered lines — run with stdout to a FILE, not a pipe:

    timeout 3000 python scripts/bench_alg_cycle_attrib.py > /tmp/attr.txt 2>&1
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from raptor_tpu.api import setup
from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import poisson_3d
from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic
from raptor_tpu.solve.cycle import _smooth, apply_op, apply_transfer, cycle
from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 16

cfg = AmgConfig(splitting="pmis", interp="extended", fine_layout="banded",
                smoother="cheb4", cheb_degree=2,
                operator_store_dtype="bfloat16")
A = poisson_3d(SIZE)
t0 = time.perf_counter()
h = setup(A, cfg)
jax.block_until_ready(h.levels[0].dinv)
print(f"setup {time.perf_counter() - t0:.1f}s; tail_start="
      f"{getattr(h, 'tail_start', -1)}", flush=True)
hM = cast_hierarchy_algebraic(h, jnp.bfloat16)
for i, lv in enumerate(hM.levels):
    lay = ("hyb" if lv.Ahyb is not None else
           ("band" + ("/rcm" if lv.Aband.reordered else ""))
           if lv.Aband is not None else "ell")
    txf = ("band" if lv.Pband is not None else
           ("ell" if lv.P is not None else "-"))
    print(f"  L{i}: n={lv.n:>8} K={lv.A.K:>3} {lay:>8} txf={txf} "
          f"dt={np.dtype(lv.A.dtype).name}", flush=True)


def timeit(f, op, x, out_like):
    """ms per f(op, x); shape-safe for rect ops: carry (x, y), feed a tiny
    y-dependence back into x so XLA can't hoist the loop-invariant call.
    ``op`` (a pytree: Level / tail matrix / hierarchy) is a jit ARGUMENT —
    closing over it embeds its arrays as constants in the HLO, and the
    axon remote-compile endpoint rejects the resulting POST (HTTP 413)."""
    y0 = jnp.zeros_like(out_like)

    def run(o, v):
        def body(i, c):
            x_, y_ = c
            y2 = f(o, x_ + y_[0] * 1e-30)
            return (x_, y2.astype(y0.dtype)[: y0.shape[0]])

        return jax.lax.fori_loop(0, REPS, body, (v, y0))[1]

    loop = jax.jit(run)
    jax.block_until_ready(loop(op, x))
    # D async dispatches, ONE final block: sequential block_until_ready
    # paid a full tunnel RTT (~30 ms) per dispatch — a 3.75 ms/op floor at
    # the old 2x(REPS=8) that swamped every sub-ms measurement (round-5
    # remeasure; the structured attrib at reps=1000 showed the same ops at
    # 0.1-0.3 ms)
    D = 6
    t0 = time.perf_counter()
    out = None
    for _ in range(D):
        out = loop(op, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (D * REPS) * 1e3


# ---- ground truth: one full preconditioner cycle ----
npad0 = hM.levels[0].A.n_rows_pad
b = jnp.ones(npad0, jnp.float32)
full = timeit(lambda hh, v: cycle(hh, v), hM, b, b)
print(f"full cycle: {full:8.3f} ms", flush=True)

tail_start = getattr(hM, "tail_start", None)
nlev = len(hM.levels) if tail_start is None else tail_start + 1
tot = 0.0
for i, lv in enumerate(hM.levels[:nlev]):
    x = jnp.ones(lv.A.n_rows_pad, jnp.float32)
    if tail_start is not None and i == tail_start:
        row = {"dense_tail": timeit(
            lambda t, v: (t @ v).astype(jnp.float32), hM.tail_op, x, x)}
        tot += row["dense_tail"]
        print(f"  L{i}: dense_tail={row['dense_tail']:8.3f}ms", flush=True)
        break
    row = {"apply": timeit(lambda o, v: apply_op(o, v), lv, x, x)}
    row["smooth"] = timeit(
        lambda o, v: _smooth(o, cfg, v, jnp.zeros_like(v),
                             backward=False, x0_zero=True), lv, x, x)
    if lv.P is not None:
        xc = jnp.ones(lv.P.n_cols_pad, jnp.float32)
        row["restrict"] = timeit(
            lambda o, v: apply_transfer(o.Rband, o.R, v), lv, x, xc)
        row["prolong"] = timeit(
            lambda o, v: apply_transfer(o.Pband, o.P, v), lv, xc, x)
    lvl = 2 * row["smooth"] + row["apply"] + row.get("restrict", 0) \
        + row.get("prolong", 0)
    tot += lvl
    print(f"  L{i}: " + "  ".join(f"{k}={v:8.3f}ms" for k, v in row.items())
          + f"  ~share={lvl:8.3f}ms", flush=True)
print(f"sum of per-level shares ~ {tot:.1f} ms vs full {full:.1f} ms",
      flush=True)
