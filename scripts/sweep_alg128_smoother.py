"""Smoother sweep on the alg128 row: build the 128^3 hierarchy ONCE, then
re-solve with cheb_degree variants (config replace only — the hierarchy is
smoother-agnostic apart from cheb_lmax, which cheb4 always computes).
Round-4 motivation: the algebraic engine converges in 22 PCG iterations at
128^3 vs 12 at 48^3; with the cycle now 68 ms (split + slot ranges), a
deeper Chebyshev smoother may buy a better time-to-solution.

    timeout 3000 python scripts/sweep_alg128_smoother.py > /tmp/sweep.txt 2>&1
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from raptor_tpu.api import setup, solve
from raptor_tpu.config import AmgConfig, SolveConfig
from raptor_tpu.gallery import poisson_3d
from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = AmgConfig(splitting="pmis", interp="extended", fine_layout="banded",
                smoother="cheb4", cheb_degree=2,
                operator_store_dtype="bfloat16")
A = poisson_3d(SIZE)
n = A.shape[0]
b = np.ones(n)
t0 = time.perf_counter()
h = setup(A, cfg)
jax.block_until_ready(h.levels[0].dinv)
print(f"setup {time.perf_counter() - t0:.1f}s", flush=True)

import scipy.sparse as sp

a64 = sp.csr_matrix(A).astype(np.float64)
for deg in (2, 3, 4):
    c = dataclasses.replace(cfg, cheb_degree=deg)
    hh = dataclasses.replace(h, config=c)
    x, info = solve(A, b, c, SolveConfig(tol=1e-8, refine=True), hier=hh)
    t0 = time.perf_counter()
    x, info = solve(A, b, c, SolveConfig(tol=1e-8, refine=True), hier=hh)
    warm = time.perf_counter() - t0
    tr = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
    print(f"cheb_degree={deg}: iters={info['iterations']} "
          f"solve_warm={warm:.3f}s true={tr:.2e}", flush=True)
