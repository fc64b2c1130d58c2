"""General-matrix SpMV layouts vs the pure-gather ELL path on a non-grid
matrix (VERDICT r1 missing #6 / next #7: "measured >=10x over the
pure-gather path on a non-grid matrix, e.g. shuffled Poisson").

Measured (TPU v5e, shuffled 48^3 Poisson, fp32):
    gather ELL : 5.86 ms/spmv (0.019 GDOF/s)
    banded     : 0.28 ms/spmv (0.388 GDOF/s)   -> 20.6x

Run on the TPU:  python scripts/bench_hybrid_spmv.py --nx 48
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--tile", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import raptor_tpu.ops.pallas.banded_kernel as bk
    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.core.hybrid import banded_from_csr
    from raptor_tpu.gallery import poisson_3d
    from raptor_tpu.ops import spmv

    print(f"device={jax.devices()[0]}")
    A = poisson_3d(args.nx)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    P = sp.coo_matrix((np.ones(n), (np.arange(n), p)), shape=A.shape).tocsr()
    A = (P @ A @ P.T).tocsr()

    E0 = ell_from_csr(A, dtype=np.float32, row_pad_multiple=args.tile)
    t0 = time.perf_counter()
    B = banded_from_csr(A, dtype=np.float32, tile=args.tile)
    t_build = time.perf_counter() - t0
    K, n_pad, tile, kh, npage, Wp = B.meta
    print(f"n={n} nnz={A.nnz} K={K} W_rcm={Wp} pages/window={npage} "
          f"(host build {t_build:.2f}s)")

    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    R = args.reps
    plan = B.plan()
    pad = kh * tile

    @jax.jit
    def run_gather(E, v):
        return jax.lax.fori_loop(0, R, lambda i, u: spmv(E, u) / 8.0, v)

    @jax.jit
    def run_banded(vals, pidx, v):
        def body(i, u):
            up = jnp.concatenate(
                [jnp.zeros(pad, u.dtype), u, jnp.zeros(pad, u.dtype)])
            return bk._banded_call(
                vals, pidx, up, K=K, n=n_pad, tile=tile, kh=kh,
                npage=npage) / 8.0
        return jax.lax.fori_loop(0, R, body, v)

    def bench(f, *a):
        y = f(*a)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(3):
            y = f(*a)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / 3 / R

    # correctness first (compiled)
    from raptor_tpu.core.hybrid import banded_spmv

    y1 = np.asarray(banded_spmv(B, x))
    y2 = A @ np.asarray(x[:n], np.float64)
    err = np.linalg.norm(y1[:n] - y2) / np.linalg.norm(y2)
    print(f"relerr vs scipy: {err:.2e}")
    assert err < 1e-5

    tg = bench(run_gather, E0, x)
    tb = bench(run_banded, plan["vals"], plan["pidx"], x)
    print(f"gather ELL : {tg*1e3:8.3f} ms/spmv  ({n/tg/1e9:.4f} GDOF/s)")
    print(f"banded     : {tb*1e3:8.3f} ms/spmv  ({n/tb/1e9:.4f} GDOF/s)")
    print(f"speedup    : {tg/tb:.1f}x")


if __name__ == "__main__":
    main()
