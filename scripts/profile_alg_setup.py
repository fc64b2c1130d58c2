"""Measure where algebraic-engine setup time goes (VERDICT r2 missing #1).

Builds the shuffled-48^3 Poisson hierarchy (n=110,592) on the attached
device, logging per-level phase wall times and compile events, then builds
again warm.  Run:  python scripts/profile_alg_setup.py [size]
"""
import logging
import sys
import time

import numpy as np
import scipy.sparse as sp

size = int(sys.argv[1]) if len(sys.argv) > 1 else 48

import jax

from raptor_tpu.config import AmgConfig
from raptor_tpu.gallery.stencils import poisson_3d
from raptor_tpu.setup.hierarchy import build_hierarchy

logging.basicConfig(level=logging.WARNING)
jax.config.update("jax_log_compiles", True)

A = poisson_3d(size)
rng = np.random.default_rng(0)
p = rng.permutation(A.shape[0])
A = sp.csr_matrix(A)[p][:, p].tocsr()
cfg = AmgConfig(splitting="pmis", interp="direct")

n_compiles = [0]


class CompileCounter(logging.Handler):
    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            n_compiles[0] += 1
            print(f"  [compile {n_compiles[0]}] {record.getMessage()[:150]}")


logging.getLogger("jax._src.interpreters.pxla").addHandler(CompileCounter())
logging.getLogger("jax._src.dispatch").addHandler(CompileCounter())

t0 = time.perf_counter()
h = build_hierarchy(A, cfg)
jax.block_until_ready(h.levels[0].A.data)
t1 = time.perf_counter()
print(f"COLD setup: {t1 - t0:.2f}s, {n_compiles[0]} compiles, "
      f"{len(h.levels)} levels, sizes={[l.n for l in h.levels]}, "
      f"K={[l.A.K for l in h.levels]}")

n_compiles[0] = 0
t0 = time.perf_counter()
h = build_hierarchy(A, cfg)
jax.block_until_ready(h.levels[0].A.data)
t1 = time.perf_counter()
print(f"WARM setup: {t1 - t0:.2f}s, {n_compiles[0]} compiles")
