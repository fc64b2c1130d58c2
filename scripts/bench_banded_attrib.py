"""Time attribution for the banded refined solve (STATUS round-4 agenda:
72 ms device -> <60 ms).  Times the level-0 operator apply, one full
V-cycle preconditioner application, one inner PCG iteration, and the full
refined solve, so the gap decomposes into named parts.
Run: PYTHONPATH=. python scripts/bench_banded_attrib.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=48)
ap.add_argument("--reps", type=int, default=1000)
ap.add_argument("--bf16", action="store_true",
                help="also time a bf16-cast preconditioner hierarchy")
args = ap.parse_args()

import jax
import jax.numpy as jnp

from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from raptor_tpu.api import setup, solve_hier_refined
from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import pad_vector
from raptor_tpu.gallery import default_rhs, poisson_3d
from raptor_tpu.solve.cycle import apply_op, cycle

rng = np.random.default_rng(0)
A = poisson_3d(args.n)
perm = rng.permutation(A.shape[0])
import scipy.sparse as sp

P = sp.identity(A.shape[0], format="csr")[perm]
A = (P @ A @ P.T).tocsr()
cfg = AmgConfig(splitting="pmis", smoother="cheb4", fine_layout="banded")
t0 = time.perf_counter()
hier = setup(A, cfg, dtype=np.float32)
jax.block_until_ready(hier.levels[-1].A.data)
print(f"setup {time.perf_counter()-t0:.1f}s, {len(hier.levels)} levels, "
      f"sizes={[l.n for l in hier.levels]}")
b = pad_vector(default_rhs(A.shape[0]).astype(np.float32),
               hier.levels[0].A.n_rows_pad)
b = jnp.asarray(b)
lev0 = hier.levels[0]
N = args.reps


def timeit(name, fn, *a):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, N, lambda i, v: fn(*a[:-1], v), a[-1]))
    out = run(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(*a))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


t_spmv = timeit("level0 banded spmv", lambda v: apply_op(lev0, v), b)
t_cyc = timeit("V-cycle (apply_M)", lambda v: cycle(hier, v), b)


def pcg_iter(v):
    # one PCG iteration's compute shape: apply_A + apply_M (+ cheap dots)
    w = apply_op(lev0, v)
    z = cycle(hier, w)
    return z / (1.0 + jnp.vdot(w, z))


t_it = timeit("spmv+cycle (1 PCG iter)", pcg_iter, b)

# full refined solve, wall + device
x, rel, it = solve_hier_refined(hier, b, tol=1e-8)  # warm
jax.block_until_ready(x)
R5 = 5  # async dispatches, one sync: amortize the tunnel round trip
t0 = time.perf_counter()
for _ in range(R5):
    x, rel, it = solve_hier_refined(hier, b, tol=1e-8)
jax.block_until_ready(x)
dt = (time.perf_counter() - t0) * 1e3 / R5
print(f"{'refined solve (warm)':28s} {dt:8.1f} ms   "
      f"iters={int(it)} relres={float(rel):.2e}")
print(f"  -> iters * iter_cost = {int(it) * t_it:.1f} ms; "
      f"residual/overhead = {dt - int(it)*t_it:.1f} ms")

if args.bf16:
    from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic

    hM = cast_hierarchy_algebraic(hier, jnp.bfloat16)
    timeit("V-cycle bf16 (apply_M)", lambda v: cycle(hM, v).astype(b.dtype), b)
    x, rel, it = solve_hier_refined(hier, b, tol=1e-8, M_hier=hM)  # warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(R5):
        x, rel, it = solve_hier_refined(hier, b, tol=1e-8, M_hier=hM)
    jax.block_until_ready(x)
    print(f"{'refined solve bf16-M (warm)':28s} "
          f"{(time.perf_counter()-t0)*1e3/R5:8.1f} ms   "
          f"iters={int(it)} relres={float(rel):.2e}")
