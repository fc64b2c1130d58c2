"""Hybrid (RCM + DIA planes + spill) vs pure-gather ELL SpMV on a non-grid
matrix (VERDICT r1 missing #6 / next #7: "measured >=10x over the
pure-gather path on a non-grid matrix, e.g. shuffled Poisson").

Run on the TPU:  python scripts/bench_hybrid_spmv.py --nx 64
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.core.hybrid import hybrid_from_ell, hybrid_spmv_ro
    from raptor_tpu.gallery import poisson_3d
    from raptor_tpu.ops import spmv

    print(f"device={jax.devices()[0]}")
    A = poisson_3d(args.nx)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    P = sp.coo_matrix((np.ones(n), (np.arange(n), p)), shape=A.shape).tocsr()
    A = (P @ A @ P.T).tocsr()

    E = ell_from_csr(A, dtype=np.float32, row_pad_multiple=128)
    t0 = time.perf_counter()
    H = hybrid_from_ell(E, min_fill=0.02, max_offsets=512)
    t_build = time.perf_counter() - t0
    planes_nnz = int(np.count_nonzero(np.asarray(H.planes)))
    print(f"n={n} nnz={A.nnz} -> {H.n_off} planes capture "
          f"{planes_nnz/A.nnz:.1%}, spill K={H.spill.K if H.spill is not None else 0} "
          f"(build {t_build:.2f}s host)")

    x = jnp.asarray(rng.standard_normal(E.n_cols_pad).astype(np.float32))
    xh = jnp.zeros(H.n_pad, jnp.float32).at[:n].set(x[:n])

    R = args.reps

    @jax.jit
    def run_gather(E, v):
        return jax.lax.fori_loop(0, R, lambda i, u: spmv(E, u) / 8.0, v)

    @jax.jit
    def run_hybrid(H, v):
        return jax.lax.fori_loop(0, R, lambda i, u: hybrid_spmv_ro(H, u) / 8.0, v)

    def bench(f, *a):
        y = f(*a)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(3):
            y = f(*a)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / 3 / R

    tg = bench(run_gather, E, x)
    th = bench(run_hybrid, H, xh)
    print(f"gather ELL : {tg*1e3:8.3f} ms/spmv  ({n/tg/1e9:.4f} GDOF/s)")
    print(f"hybrid     : {th*1e3:8.3f} ms/spmv  ({n/th/1e9:.4f} GDOF/s)")
    print(f"speedup    : {tg/th:.1f}x")

    # correctness cross-check (reordered-space result mapped back)
    y_ref = np.asarray(spmv(E, x))[:n]
    yr = np.asarray(hybrid_spmv_ro(H, jnp.take(xh, H.perm)))
    y = yr[np.asarray(H.iperm)][:n]
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    print(f"relerr vs gather: {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
