"""Per-level time attribution for the structured V-cycle at --size.

Times N repetitions of each level's dominant ops (smooth, residual spmv,
transfer) in isolation, so the 256^3 per-DOF regression (VERDICT r2 weak #2)
can be attributed to specific levels instead of guessed at.
Run: PYTHONPATH=. python scripts/bench_level_attrib.py --size 256
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=256)
ap.add_argument("--reps", type=int, default=1000)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import default_rhs
from raptor_tpu.structured import (
    build_structured_hierarchy, cast_hierarchy, dia_from_stencil)
from raptor_tpu.structured.solver import _smooth, _slevel
from raptor_tpu.structured.dia import dia_spmv

st = np.zeros((3, 3, 3))
st[1, 1, 1] = 6.0
for d in range(3):
    i = [1, 1, 1]
    for s in (0, 2):
        i[d] = s
        st[tuple(i)] = -1.0

sz = args.size
A = dia_from_stencil(st, (sz, sz, sz), dtype=jnp.float32)
cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=512,
                max_levels=40)
h = build_structured_hierarchy(A, cfg, dim_policy="size")
hM = cast_hierarchy(h, jnp.bfloat16)
N = args.reps


def timeit(fn, *a):
    r = jax.jit(lambda *a: jax.lax.fori_loop(
        0, N, lambda i, v: fn(*a[:-1], v), a[-1]))
    out = r(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = r(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N


total_sm = 0.0
print(f"size={sz} levels={len(hM.levels)}")
for k, lev in enumerate(hM.levels):
    if lev.A.n < 65536:
        print(f"L{k:2d} n={lev.A.n:9d} (skipped: small)", flush=True)
        continue
    b = jnp.asarray(default_rhs(lev.A.n, dtype=np.float32))
    t_spmv = timeit(lambda v: dia_spmv(lev.A, v).astype(jnp.float32), b)
    t_sm = timeit(
        lambda v: _smooth(lev, cfg, v, jnp.zeros_like(v), False).astype(
            jnp.float32), b)
    per = 2 * t_sm + 2 * t_spmv  # pre+post smooth + residual + transfer-ish
    total_sm += per
    print(f"L{k:2d} n={lev.A.n:9d} n_off={lev.A.n_off:2d} "
          f"const={lev.A.const_planes is not None} "
          f"spmv={t_spmv*1e3:7.3f} ms smooth={t_sm*1e3:7.3f} ms "
          f"~cycle-share={per*1e3:7.3f} ms", flush=True)
print(f"sum of shares ~= {total_sm*1e3:.2f} ms")
