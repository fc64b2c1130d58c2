"""Repro: banded refined solve on the real TPU (bench algebraic detail)."""
import sys
import time

import numpy as np


def shuffled_poisson(nx, seed=0):
    import scipy.sparse as sp

    from raptor_tpu.gallery import poisson_3d

    A = poisson_3d(nx)
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    Pm = sp.coo_matrix((np.ones(len(p)), (np.arange(len(p)), p)),
                       shape=A.shape).tocsr()
    return (Pm @ A @ Pm.T).tocsr()


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tail = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax

    from raptor_tpu.api import setup, solve
    from raptor_tpu.config import AmgConfig, SolveConfig

    print("devices:", jax.devices(), flush=True)
    A = shuffled_poisson(nx)
    b = np.ones(A.shape[0])
    cfg = AmgConfig(splitting="pmis", interp="direct", fine_layout="banded",
                    tail_max_n=tail)
    t0 = time.perf_counter()
    hb = setup(A, cfg)
    print(f"setup {time.perf_counter()-t0:.1f}s tail_start={hb.tail_start}",
          flush=True)
    t0 = time.perf_counter()
    x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True), hier=hb)
    print(f"solve {time.perf_counter()-t0:.2f}s iters={info['iterations']} "
          f"relres={info['relres']:.2e}", flush=True)


if __name__ == "__main__":
    main()
