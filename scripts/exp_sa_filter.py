"""Experiment: filtered SA (sa_filter) + W-cycle on config-4 elasticity.

Run on CPU (host SA path): iterations to 1e-8, operator complexity,
setup/solve wall.  Usage: JAX_PLATFORMS=cpu python scripts/exp_sa_filter.py [nx]
"""
import dataclasses
import sys
import time

import numpy as np


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from raptor_tpu.api import setup as amg_setup, solve
    from raptor_tpu.config import PRESETS, SolveConfig
    from raptor_tpu.gallery import elasticity_3d

    A, B = elasticity_3d(nx)[:2]
    b = np.ones(A.shape[0])
    base = PRESETS["config4"]
    variants = {
        "base": base,
        "f0.05": dataclasses.replace(base, sa_filter=0.05),
        "f0.10": dataclasses.replace(base, sa_filter=0.10),
        "f0.15": dataclasses.replace(base, sa_filter=0.15),
        "W": dataclasses.replace(base, cycle="W"),
        "f0.10+W": dataclasses.replace(base, sa_filter=0.10, cycle="W"),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        hier = amg_setup(A, cfg, B=B)
        ts = time.perf_counter() - t0
        nnz = [float(np.asarray(lv.A.row_nnz).sum()) for lv in hier.levels]
        cx = sum(nnz) / nnz[0]
        t0 = time.perf_counter()
        x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True),
                        hier=hier)
        tsol = time.perf_counter() - t0
        import scipy.sparse as sp
        a64 = sp.csr_matrix(A).astype(np.float64)
        true_rel = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
        print(f"{name:10s} n={A.shape[0]} iters={int(info['iterations']):3d} "
              f"cx={cx:.3f} setup={ts:.1f}s solve={tsol:.1f}s "
              f"true={true_rel:.2e} levels={[lv.n for lv in hier.levels]}",
              flush=True)


if __name__ == "__main__":
    main()
