"""Phase-level wall-time attribution of the alg128 bench row (round 4).

Replays api._setup_banded's phases inline on the natural-ordered 128^3
Poisson (the bench.py alg128 configuration) with a timer around each:
plane detection, host ELL build, build_hierarchy (device-fused levels +
host tail), per-level fast-layout attach (hybrid / banded / RCM-banded /
rect transfers), and the staged upload.  Then times each level's cycle
ops (apply/smooth/restrict/prolong) with few reps so the 320 ms V-cycle
(round-4 first measure) can be attributed.  Writes unbuffered lines; run
with stdout to a file, NOT through a pipe (grep/tail buffer ~forever):

    timeout 3000 python scripts/profile_alg128_phases.py > /tmp/prof.txt 2>&1
"""
import dataclasses
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from raptor_tpu.api import BANDED_MIN_N, _plane_stats, _plane_stats_ell, pad_rows
from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import ell_from_csr
from raptor_tpu.core.hybrid import (
    banded_from_ell, hybrid_from_ell, rect_banded_from_ell)
from raptor_tpu.gallery import poisson_3d
from raptor_tpu.setup.hierarchy import (
    build_hierarchy, cast_hierarchy_algebraic, stage_hierarchy)
from raptor_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 5

_t = [time.perf_counter()]


def tick(label):
    now = time.perf_counter()
    print(f"[phase] {label}: {now - _t[0]:8.2f}s", flush=True)
    _t[0] = now


A = poisson_3d(SIZE)
n = A.shape[0]
dtype = jnp.float32
config = AmgConfig(splitting="pmis", interp="extended", fine_layout="banded",
                   smoother="cheb4", cheb_degree=2,
                   operator_store_dtype="bfloat16")
tick("gallery matrix")

a = sp.csr_matrix(A)
coo = a.tocoo()
cov0, eff0 = _plane_stats(coo.col.astype(np.int64) - coo.row, n)
plane_mode = cov0 >= 0.9 and eff0 >= 0.5
p = np.arange(n, dtype=np.int64)
ar = a
tick(f"csr+plane stats (plane_mode={plane_mode})")

pm_mult = int(np.lcm(config.pad_multiple, 1024))
E = ell_from_csr(ar, dtype=dtype, row_pad_multiple=pm_mult, device=False)
cfg = dataclasses.replace(config, pad_multiple=pm_mult)
tick("ell_from_csr (host)")

hier = build_hierarchy(E, cfg, dtype=dtype, row_ids=p, stage=False)
tick("build_hierarchy total (stage=False)")

levels = []
for i, lev in enumerate(hier.levels):
    if lev.n >= BANDED_MIN_N and lev.A.n_rows_pad % 1024 == 0:
        attached = False
        if plane_mode:
            cov, eff = _plane_stats_ell(lev.A)
            tick(f"  L{i} plane stats (cov={cov:.2f} eff={eff:.2f})")
            if cov >= 0.9 and eff >= 0.5:
                H = hybrid_from_ell(lev.A, reorder=False, max_offsets=32,
                                    pad_multiple=lev.A.n_rows_pad,
                                    device=False)
                tick(f"  L{i} hybrid_from_ell")
                if H.n_pad == lev.A.n_rows_pad:
                    lev = dataclasses.replace(lev, Ahyb=H)
                    attached = True
        if not attached:
            B = banded_from_ell(lev.A, reorder=i > 0)
            tick(f"  L{i} banded_from_ell(reorder={i > 0}) "
                 f"-> {'ok' + ('/rcm' if B is not None and B.reordered else '') if B is not None else 'None'}")
            if B is not None and B.n_pad == lev.A.n_rows_pad:
                lev = dataclasses.replace(lev, Aband=B)
                attached = True
        if attached and lev.P is not None:
            Pb = rect_banded_from_ell(lev.P, pad_rows(lev.P.n_cols_pad, 1024))
            Rb = rect_banded_from_ell(lev.R, pad_rows(lev.R.n_cols_pad, 1024))
            tick(f"  L{i} rect transfers -> P={'band' if Pb is not None else 'ELL'} "
                 f"R={'band' if Rb is not None else 'ELL'}")
            lev = dataclasses.replace(lev, Pband=Pb, Rband=Rb)
    levels.append(lev)
tick("layout attach loop total")

n_pad = hier.levels[0].A.n_rows_pad
perm = np.arange(n_pad, dtype=np.int32)
iperm = np.arange(n_pad, dtype=np.int32)
h = stage_hierarchy(dataclasses.replace(
    hier, levels=tuple(levels), perm=perm, iperm=iperm))
jax.block_until_ready(h.levels[0].dinv)
tick("stage_hierarchy (upload)")

for i, lv in enumerate(h.levels):
    lay = ("hyb" if lv.Ahyb is not None else
           ("band" + ("/rcm" if lv.Aband.reordered else ""))
           if lv.Aband is not None else "ell")
    txf = "band" if lv.Pband is not None else ("ell" if lv.P is not None
                                               else "-")
    print(f"  L{i}: n={lv.n:>8} pad={lv.A.n_rows_pad:>8} K={lv.A.K:>3} "
          f"{lay:>8} txf={txf}", flush=True)

hM = cast_hierarchy_algebraic(h, jnp.bfloat16)
tick("bf16 cast")

from raptor_tpu.solve.cycle import _smooth, apply_op, apply_transfer


def timeit(f, x):
    loop = jax.jit(lambda v: jax.lax.fori_loop(
        0, REPS, lambda i, u: f(u).astype(v.dtype)[: v.shape[0]], v))
    jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x))
    jax.block_until_ready(loop(x))
    return (time.perf_counter() - t0) / (2 * REPS) * 1e3


tot = 0.0
for i, lv in enumerate(hM.levels):
    x = jnp.ones(lv.A.n_rows_pad, jnp.float32)
    row = {"apply": timeit(lambda v, lv=lv: apply_op(lv, v), x)}
    row["smooth"] = timeit(
        lambda v, lv=lv: _smooth(lv, config, v, jnp.zeros_like(v),
                                 backward=False, x0_zero=True), x)
    if lv.R is not None:
        row["restrict"] = timeit(
            lambda v, lv=lv: apply_transfer(lv.Rband, lv.R, v), x)
        xc = jnp.ones(lv.P.n_cols_pad, jnp.float32)
        row["prolong"] = timeit(
            lambda v, lv=lv: apply_transfer(lv.Pband, lv.P, v), xc)
    lvl = 2 * row["smooth"] + row["apply"] + row.get("restrict", 0) \
        + row.get("prolong", 0)
    tot += lvl
    print(f"  L{i}: " + "  ".join(f"{k}={v:8.3f}ms" for k, v in row.items())
          + f"  ~share={lvl:8.3f}ms", flush=True)
    tick(f"  L{i} attribution wall")
print(f"sum of per-level shares ~ {tot:.1f} ms/cycle", flush=True)
