"""Device-pipeline hierarchy QUALITY at scale (VERDICT r4 next #6).

Builds the shuffled 96^3 Poisson hierarchy twice — once through the fused
device setup programs (default host_setup_threshold: the fat fine levels run
the two jitted programs per level, exactly the pipeline the TPU devsetup
latency row times) and once all-host (host_setup_threshold=inf) — then
measures both with the SAME fp64 host PCG preconditioned by the exported
V-cycle.  Quality is a property of the hierarchy (P/R/A_c), not of the
device solver, so the comparison runs entirely host-side: no tunnel pulls
of 100+ MB operators, no extra compiled device programs.

Runs under JAX_PLATFORMS=cpu (the fused programs compile on XLA:CPU — the
same trick as tests/conftest.py); invoked by bench.py --devsetup-only in a
fresh subprocess.

Prints ONE JSON line: {"iterations_dev": .., "iterations_host": ..,
"relres_dev": .., "relres_host": .., "levels_dev": [..], "levels_host": [..]}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the image's site hook can preselect the TPU platform regardless of env
# vars (observed: 48^3 smoke run exported through the tunnel at ~0.1 MB/s);
# force CPU before the first backend touch, mirroring __graft_entry__
jax.config.update("jax_platforms", "cpu")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def export_levels(h):
    """Hierarchy -> [{A, P, R, dinv} scipy/np] (host; cheap on CPU backend)."""
    from raptor_tpu.core.ell import ell_to_csr

    out = []
    for lv in h.levels:
        e = {"A": ell_to_csr(lv.A).astype(np.float64),
             "dinv": np.asarray(lv.dinv, np.float64)[: lv.n]}
        if lv.P is not None:
            e["P"] = ell_to_csr(lv.P).astype(np.float64)
            e["R"] = ell_to_csr(lv.R).astype(np.float64)
        out.append(e)
    return out


def oracle_pcg(levels, b, tol=1e-8, maxiter=200, nu=2):
    """fp64 PCG with the exported hierarchy as V-cycle preconditioner.
    Identical solver for both hierarchies => iteration counts compare
    interpolation/coarse-operator quality and nothing else."""
    import scipy.sparse.linalg as spla

    def vcycle(k, bb):
        A, dinv = levels[k]["A"], levels[k]["dinv"]
        if "P" not in levels[k]:
            return spla.spsolve(A.tocsc(), bb)
        x = np.zeros_like(bb)
        for _ in range(nu // 2 or 1):
            x = x + (2.0 / 3.0) * dinv * (bb - A @ x)
        ec = vcycle(k + 1, levels[k]["R"] @ (bb - A @ x))
        x = x + levels[k]["P"] @ ec
        for _ in range(nu // 2 or 1):
            x = x + (2.0 / 3.0) * dinv * (bb - A @ x)
        return x

    A = levels[0]["A"]
    x = np.zeros_like(b)
    r = b - A @ x
    z = vcycle(0, r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    for it in range(1, maxiter + 1):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) / nb < tol:
            return x, it, float(np.linalg.norm(r) / nb)
        z = vcycle(0, r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, maxiter, float(np.linalg.norm(r) / nb)


def main(size=96):
    import dataclasses

    import scipy.sparse as sp

    from raptor_tpu.api import setup
    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import poisson_3d

    A = poisson_3d(size)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    A = sp.csr_matrix(A)[p][:, p].tocsr()
    cfg = AmgConfig(splitting="pmis", interp="extended")

    out = {"n": int(n)}
    b = np.ones(n)
    for tag, c in (("dev", cfg),
                   ("host", dataclasses.replace(
                       cfg, host_setup_threshold=1 << 60))):
        t0 = time.perf_counter()
        h = setup(A, c)
        ndev = sum(lv.n > c.host_setup_threshold for lv in h.levels)
        t1 = time.perf_counter()
        lv = export_levels(h)
        x, it, rel = oracle_pcg(lv, b)
        out[f"iterations_{tag}"] = it
        out[f"relres_{tag}"] = rel
        out[f"levels_{tag}"] = [int(e["A"].shape[0]) for e in lv]
        out[f"device_fused_levels_{tag}"] = int(ndev)
        log(f"[{tag}] setup {t1-t0:.1f}s ({ndev} device-fused), "
            f"levels={out[f'levels_{tag}']}, oracle PCG iters={it} "
            f"relres={rel:.2e} ({time.perf_counter()-t1:.1f}s oracle)")
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 96)
