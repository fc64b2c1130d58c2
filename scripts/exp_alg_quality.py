"""Algorithm sweep for the alg128 iteration gap (VERDICT r4 next #5).

Builds hierarchy variants through the HOST pipeline (pure NumPy — the same
algorithms the device pipeline mirrors, bit-identical splittings) on the CPU
backend, exports to scipy, and measures PCG iterations with the PRODUCTION
smoother (fourth-kind Chebyshev, replicated in fp64 numpy) — so a variant's
iteration count here predicts the alg128 hardware row without paying a
single remote compile.

Run: python scripts/exp_alg_quality.py [size] [shuffle]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np
import scipy.sparse as sp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def export_levels(h):
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


def lmax_est(A, dinv, iters=40, safety=1.1):
    rng = np.random.default_rng(3)
    v = rng.standard_normal(A.shape[0])
    v /= np.linalg.norm(v)
    for _ in range(iters):
        w = dinv * (A @ v)
        v = w / np.linalg.norm(w)
    w = dinv * (A @ v)
    return safety * (v @ w)


def cheb4(A, dinv, lmax, b, x, degree=3, x0_zero=False):
    r = b if x0_zero else b - A @ x
    d = (4.0 / 3.0) / lmax * (dinv * r)
    x = x + d
    for k in range(2, degree + 1):
        r = r - A @ d
        d = ((2 * k - 3) / (2 * k + 1)) * d + (
            (8 * k - 4) / (2 * k + 1) / lmax) * (dinv * r)
        x = x + d
    return x


def pcg(levels, b, tol=1e-8, maxiter=200, degree=3, gamma=1):
    """gamma=1: V-cycle; gamma=2: W-cycle below the finest level."""
    import scipy.sparse.linalg as spla

    lmaxes = [lmax_est(e["A"], e["dinv"]) for e in levels]

    def vc(k, bb):
        e = levels[k]
        A, dinv = e.get("Am", e["A"]), e["dinv"]
        if "P" not in e:
            return spla.spsolve(e["A"].tocsc(), bb)
        x = cheb4(A, dinv, lmaxes[k], bb, np.zeros_like(bb), degree, True)
        for _ in range(gamma if k > 0 else 1):
            ec = vc(k + 1, e.get("Rm", e["R"]) @ (bb - A @ x))
            x = x + e.get("Pm", e["P"]) @ ec
        x = cheb4(A, dinv, lmaxes[k], bb, x, degree)
        return x

    A = levels[0]["A"]
    x = np.zeros_like(b)
    r = b.copy()
    z = vc(0, r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    for it in range(1, maxiter + 1):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) / nb < tol:
            return it, float(np.linalg.norm(r) / nb)
        z = vc(0, r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxiter, float(np.linalg.norm(r) / nb)


def run_variant(A, name, cfg, degree=3, bf16=False, gamma=1):
    from raptor_tpu.api import setup

    t0 = time.perf_counter()
    h = setup(A, cfg)
    ts = time.perf_counter() - t0
    lv = export_levels(h)
    if bf16:
        # mirror the production preconditioner: operators stored in bf16
        # (outer CG matvec stays fp64) — isolates the precision loss from
        # the hierarchy-quality question
        import ml_dtypes

        def rt(m):
            m = m.copy()
            m.data = m.data.astype(ml_dtypes.bfloat16).astype(np.float64)
            return m

        # preconditioner ops ("Am"/"Pm"/"Rm") are bf16 round-trips; the
        # outer CG matvec keeps the exact lv[0]["A"]
        lv = [{**e,
               **{k + "m": rt(e[k]) for k in ("A", "P", "R") if k in e}}
              for e in lv]
    nnz0 = lv[0]["A"].nnz
    opc = sum(e["A"].nnz for e in lv) / nnz0
    ks = [int(np.diff(e["A"].indptr).max()) for e in lv]
    b = np.ones(A.shape[0])
    t0 = time.perf_counter()
    it, rel = pcg(lv, b, degree=degree, gamma=gamma)
    tp = time.perf_counter() - t0
    sizes = [e["A"].shape[0] for e in lv]
    # cycle cost proxy: total smoothing+residual traffic per cycle =
    # (2*degree+1) * nnz summed over levels + transfer nnz
    traffic = sum((2 * degree + 1) * e["A"].nnz for e in lv) + sum(
        2 * e["P"].nnz for e in lv if "P" in e)
    log(f"{name:32s} iters={it:3d} relres={rel:.1e} opc={opc:.2f} "
        f"maxK={ks} sizes={sizes} traffic/cyc={traffic/1e6:.1f}M "
        f"cost~{it*traffic/1e6:.0f}M setup={ts:.1f}s pcg={tp:.1f}s")
    return {"name": name, "iters": it, "opc": opc, "traffic": traffic}


def geo_mode(size, degree=3, interp="extended", theta=0.25, bf16=True):
    """Plane-detected geometric-split coarsening (validation for the
    production change): alternate semicoarsening of the largest grid dim —
    the C/F split the structured engine uses — fed through the GENERAL
    interpolation machinery (np ext+i) and Galerkin RAP.  If this matches
    the structured engine's iteration count, the banded setup path gets a
    'given-split' mode and alg128 inherits structured-grade convergence."""
    import scipy.sparse as sp

    from raptor_tpu.core.ell import ell_from_csr
    from raptor_tpu.gallery import poisson_3d
    from raptor_tpu.setup.host_setup import (
        np_distance_two_interpolation, np_strength_mask)
    from raptor_tpu.setup.splitting import C_PT, F_PT

    a = sp.csr_matrix(poisson_3d(size)).astype(np.float64)
    exts = [size, size, size]  # extents, stride order: [1, e0, e0*e1]
    levels = []
    t0 = time.perf_counter()
    while a.shape[0] > 3000 and max(exts) > 2:
        n = a.shape[0]
        E = ell_from_csr(a, dtype=np.float64, device=False)
        data, cols, nnz = (np.asarray(E.data), np.asarray(E.cols),
                           np.asarray(E.row_nnz))
        n_pad = E.n_rows_pad
        smask = np_strength_mask(data, cols, nnz, theta)
        d = int(np.argmax(exts))  # coarsen the largest dim
        stride = int(np.prod(exts[:d])) if d > 0 else 1
        idx = np.arange(n_pad)
        coord = (idx // stride) % exts[d]
        cf = np.where((coord % 2 == 0) & (idx < n), C_PT, F_PT).astype(
            np.int32)
        if interp == "direct1d":
            # dim-restricted direct interpolation (the structured engine's
            # transfer shape): only the +/-stride couplings interpolate, so
            # RAP never grows past 27-pt
            from raptor_tpu.setup.host_setup import np_direct_interpolation

            rows_b = np.broadcast_to(idx[None, :], cols.shape)
            m1d = smask & (np.abs(cols - rows_b) == stride)
            Pd, Pc, Pn, nc = np_direct_interpolation(data, cols, nnz, m1d,
                                                     cf)
            from raptor_tpu.setup.host_setup import _ell_np_to_coo

            P_pad = _ell_np_to_coo(Pd, Pc, Pn, n_pad, nc).tocsr()
        else:
            P_pad, nc = np_distance_two_interpolation(
                data, cols, nnz, smask, cf, variant=interp)
        P = P_pad[:n].tocsr()
        R = P.T.tocsr()
        dinv = 1.0 / a.diagonal()
        levels.append({"A": a, "dinv": dinv, "P": P, "R": R})
        a = (R @ (a @ P)).tocsr()
        exts[d] = (exts[d] + 1) // 2
    levels.append({"A": a, "dinv": 1.0 / a.diagonal()})
    ts = time.perf_counter() - t0
    if bf16:
        import ml_dtypes

        def rt(m):
            m = m.copy()
            m.data = m.data.astype(ml_dtypes.bfloat16).astype(np.float64)
            return m

        levels = [{**e, **{k + "m": rt(e[k]) for k in ("A", "P", "R")
                           if k in e}} for e in levels]
    nnz0 = levels[0]["A"].nnz
    opc = sum(e["A"].nnz for e in levels) / nnz0
    ks = [int(np.diff(e["A"].indptr).max()) for e in levels]
    b = np.ones(levels[0]["A"].shape[0])
    t0 = time.perf_counter()
    it, rel = pcg(levels, b, degree=degree)
    tp = time.perf_counter() - t0
    sizes = [e["A"].shape[0] for e in levels]
    log(f"geo-split {interp} deg{degree} bf16={bf16}: iters={it} "
        f"relres={rel:.1e} opc={opc:.2f} maxK={ks} sizes={sizes} "
        f"setup={ts:.1f}s pcg={tp:.1f}s")
    return it


def main():
    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import poisson_3d

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    if len(sys.argv) > 2 and sys.argv[2] == "geo":
        for iv in (sys.argv[3].split(",") if len(sys.argv) > 3
                   else ["extended", "classical"]):
            geo_mode(size, interp=iv)
        return
    shuffle = len(sys.argv) > 2 and sys.argv[2] == "shuffle"
    A = poisson_3d(size)
    if shuffle:
        rng = np.random.default_rng(0)
        p = rng.permutation(A.shape[0])
        A = sp.csr_matrix(A)[p][:, p].tocsr()
    log(f"=== 3D Poisson {size}^3 n={A.shape[0]} shuffle={shuffle} ===")
    base = AmgConfig(splitting="pmis", interp="extended",
                     host_setup_threshold=1 << 60)
    if size >= 96:
        # at-scale isolation runs (single core: keep the list short)
        import itertools

        all_variants = [
            ("base fp64", base, False),
            ("base bf16-precond", base, True),
            ("filt.02 bf16-precond",
             dataclasses.replace(base, filter_tol=0.02), True),
            ("th.5 bf16", dataclasses.replace(base, theta=0.5), True),
            ("th.5 filt.02 bf16",
             dataclasses.replace(base, theta=0.5, filter_tol=0.02), True),
            ("th.5 pmax6 filt.02 bf16",
             dataclasses.replace(base, theta=0.5, p_max_elements=6,
                                 filter_tol=0.02), True),
            ("pmax6 filt.02 bf16",
             dataclasses.replace(base, p_max_elements=6, filter_tol=0.02),
             True),
            ("filt.05 bf16",
             dataclasses.replace(base, filter_tol=0.05), True),
            ("wcycle filt.02 bf16",
             dataclasses.replace(base, filter_tol=0.02), True,
             {"gamma": 2}),
            ("deg4 filt.02 bf16",
             dataclasses.replace(base, filter_tol=0.02), True,
             {"degree": 4}),
            ("deg5 filt.02 bf16",
             dataclasses.replace(base, filter_tol=0.02), True,
             {"degree": 5}),
        ]
        sel = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        for name, cfg, bf, *rest in all_variants:
            if sel is not None and not any(s in name for s in sel):
                continue
            try:
                run_variant(A, name, cfg, bf16=bf, **(rest[0] if rest else {}))
            except Exception as e:
                log(f"{name:32s} FAILED: {type(e).__name__}: {e}")
        return
    variants = [
        ("base th.25 pmax4", base),
        ("th.5", dataclasses.replace(base, theta=0.5)),
        ("th.6", dataclasses.replace(base, theta=0.6)),
        ("th.5 pmax6", dataclasses.replace(base, theta=0.5,
                                           p_max_elements=6)),
        ("th.5 filt.02", dataclasses.replace(base, theta=0.5,
                                             filter_tol=0.02)),
        ("th.25 filt.02", dataclasses.replace(base, filter_tol=0.02)),
        ("th.5 refine1", dataclasses.replace(base, theta=0.5,
                                             interp_refine=1)),
        ("rs th.25", dataclasses.replace(base, splitting="rs")),
        ("rs th.5", dataclasses.replace(base, splitting="rs", theta=0.5)),
        ("cljp th.5", dataclasses.replace(base, splitting="cljp",
                                          theta=0.5)),
    ]
    for name, cfg in variants:
        try:
            run_variant(A, name, cfg)
        except Exception as e:
            log(f"{name:32s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
