"""Attribute the x0-zero pre-smooth fold on hardware (VERDICT r3 next #4).

Times the structured V-cycle at --size with the fold ON (shipped path:
every level's pre-smooth starts from x=0, so its first residual is exactly
b and one A-SpMV of HBM traffic is elided) and OFF (first residual computed
as b - A@0), and prints the delta.  The OFF variant is produced by wrapping
``_smooth`` to force ``x0_zero=False`` — everything else identical, fresh
jit for each variant.

Run: PYTHONPATH=. python scripts/bench_x0_fold.py --size 128
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=128)
ap.add_argument("--reps", type=int, default=200)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery import default_rhs
from raptor_tpu.structured import (
    build_structured_hierarchy, cast_hierarchy, dia_from_stencil)
from raptor_tpu.structured import solver as S
from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

st = np.zeros((3, 3, 3))
st[1, 1, 1] = 6.0
for d in range(3):
    i = [1, 1, 1]
    for s in (0, 2):
        i[d] = s
        st[tuple(i)] = -1.0

sz = args.size
A = dia_from_stencil(st, (sz, sz, sz), dtype=jnp.float32)
cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=2048,
                max_levels=40)
h = build_structured_hierarchy(A, cfg, dim_policy="size")
hM = cast_hierarchy(h, jnp.bfloat16)
b = jnp.asarray(default_rhs(hM.levels[0].A.n, dtype=np.float32))
N = args.reps

_orig_smooth = S._smooth


def _smooth_nofold(lev, cfg, b, x, backward, x0_zero=False):
    return _orig_smooth(lev, cfg, b, x, backward, x0_zero=False)


def timeit():
    # the hierarchy rides as a jit ARGUMENT: closing over it embeds its
    # arrays as HLO constants and the axon remote-compile endpoint rejects
    # the POST at 256^3 (HTTP 413)
    loop = jax.jit(lambda hh, v: jax.lax.fori_loop(
        0, N, lambda i, x: S.scycle(hh, x.astype(b.dtype), cfg).astype(
            jnp.float32), v))
    ssum = jax.jit(jnp.sum)
    out = loop(hM, b)
    _ = float(ssum(out))  # scalar fetch: block_until_ready on a remote
    t0 = time.perf_counter()  # buffer returned early at 256^3 (bench.py
    out = loop(hM, b)  # forces completion the same way)
    _ = float(ssum(out))
    return (time.perf_counter() - t0) / N


t_fold = timeit()
S._smooth = _smooth_nofold
try:
    t_nofold = timeit()
finally:
    S._smooth = _orig_smooth

print(f"size={sz}^3 n={sz**3} reps={N}")
print(f"fold ON  (shipped): {t_fold * 1e3:8.3f} ms/cycle")
print(f"fold OFF          : {t_nofold * 1e3:8.3f} ms/cycle")
print(f"delta: {(t_nofold - t_fold) * 1e3:+.3f} ms "
      f"({(t_nofold / t_fold - 1) * 100:+.1f}% without the fold)")
