"""Measure 256^3 (or --size) structured V-cycle vs coarse_size cut.

The coarse tail below ~4k dofs is latency-bound (27-offset rolls, VERDICT r2
weak #2); truncating the hierarchy there and direct-solving with the dense
inverse (one MXU matvec) trades HBM reads of the inverse for many tiny rolls.
Run: PYTHONPATH=. python scripts/bench_coarse_cut.py [--size 256] [--cuts ...]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=256)
ap.add_argument("--cuts", type=int, nargs="+",
                default=[512, 2048, 4096, 16384])
ap.add_argument("--cycles", type=int, default=20)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import default_rhs
from raptor_tpu.structured import (
    build_structured_hierarchy, cast_hierarchy, dia_from_stencil, scycle)

st = np.zeros((3, 3, 3))
st[1, 1, 1] = 6.0
for d in range(3):
    i = [1, 1, 1]
    for s in (0, 2):
        i[d] = s
        st[tuple(i)] = -1.0

sz = args.size
dims = (sz, sz, sz)
n = sz**3
A = dia_from_stencil(st, dims, dtype=jnp.float32)
b = jnp.asarray(default_rhs(n, dtype=np.float32))
N = args.cycles

for cut in args.cuts:
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=cut,
                    max_levels=40)
    t0 = time.perf_counter()
    h = build_structured_hierarchy(A, cfg, dim_policy="size")
    _ = np.asarray(h.coarse_inv[:1, :1])
    setup = time.perf_counter() - t0
    hM = cast_hierarchy(h, jnp.bfloat16)

    @jax.jit
    def run_cycles(h_, r):
        return jax.lax.fori_loop(
            0, N, lambda i, v: scycle(h_, v).astype(jnp.float32), r)

    ssum = jax.jit(lambda v: jnp.sum(v))
    x = run_cycles(hM, b)
    _ = float(ssum(x))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        x = run_cycles(hM, x)
    _ = float(ssum(x))
    vc = (time.perf_counter() - t0) / reps / N
    nlev = len(h.levels)
    ncoarse = h.levels[-1].A.n
    print(f"cut={cut:6d}: {nlev} levels, coarsest n={ncoarse}, "
          f"V-cycle {vc*1e3:.2f} ms ({n/vc/1e9:.3f} GDOF/s), setup {setup:.1f}s",
          flush=True)
    del h, hM
    jax.clear_caches()
