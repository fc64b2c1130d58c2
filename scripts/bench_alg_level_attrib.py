"""Per-level time attribution for the ALGEBRAIC-engine V-cycle at --size.

Builds the same hierarchy as bench.py's alg128 row (natural-ordered 3D
Poisson through the general CSR API, fine_layout='banded') and times each
level's dominant ops in isolation — pre-smooth, operator apply, restrict,
prolong — so a slow cycle can be attributed to a specific level/layout
instead of guessed at (round 4: L1 falling back to gather-ELL dominated a
1.5 s cycle).  Run: PYTHONPATH=. python scripts/bench_alg_level_attrib.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=128)
ap.add_argument("--reps", type=int, default=50)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from raptor_tpu.api import setup
from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import poisson_3d
from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic
from raptor_tpu.solve.cycle import _smooth, apply_op, apply_transfer
from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

sz = args.size
A = poisson_3d(sz)
cfg = AmgConfig(splitting="pmis", interp="extended", fine_layout="banded",
                smoother="cheb4", cheb_degree=2,
                operator_store_dtype="bfloat16")
t0 = time.perf_counter()
h = setup(A, cfg)
jax.block_until_ready(h.levels[0].dinv)
print(f"setup {time.perf_counter() - t0:.1f}s; levels:", flush=True)
for i, lv in enumerate(h.levels):
    lay = ("hyb" if lv.Ahyb is not None else
           "band" + ("/rcm" if lv.Aband is not None and lv.Aband.reordered
                     else "") if lv.Aband is not None else "ell")
    print(f"  L{i}: n={lv.n} pad={lv.A.n_rows_pad} K={lv.A.K} {lay} "
          f"txf={'band' if lv.Pband is not None else 'ell'}")
hM = cast_hierarchy_algebraic(h, jnp.bfloat16)

N = args.reps


def timeit(f, x):
    loop = jax.jit(lambda v: jax.lax.fori_loop(
        0, N, lambda i, u: f(u).astype(v.dtype)[: v.shape[0]], v))
    jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x))
    return (time.perf_counter() - t0) / N * 1e3


tot = 0.0
for i, lv in enumerate(hM.levels):
    npad = lv.A.n_rows_pad
    x = jnp.ones(npad, jnp.float32)
    row = {"apply": timeit(lambda v, lv=lv: apply_op(lv, v), x)}
    row["smooth"] = timeit(
        lambda v, lv=lv: _smooth(lv, cfg, v, jnp.zeros_like(v),
                                 backward=False, x0_zero=True), x)
    if lv.R is not None:
        row["restrict"] = timeit(
            lambda v, lv=lv: apply_transfer(lv.Rband, lv.R, v), x)
        xc = jnp.ones(lv.R.n_rows_pad if False else lv.P.n_cols_pad,
                      jnp.float32)
        row["prolong"] = timeit(
            lambda v, lv=lv: apply_transfer(lv.Pband, lv.P, v), xc)
    # V-cycle visits: 2 smooths + 1 apply + restrict + prolong per level
    lvl_cost = 2 * row["smooth"] + row["apply"] + row.get("restrict", 0) \
        + row.get("prolong", 0)
    tot += lvl_cost
    print(f"  L{i}: " + "  ".join(f"{k}={v:8.3f}ms" for k, v in row.items())
          + f"  ~cycle-share={lvl_cost:8.3f}ms", flush=True)
print(f"sum of per-level shares ~ {tot:.1f} ms/cycle")
