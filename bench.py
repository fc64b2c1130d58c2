"""Benchmark harness (SURVEY.md §2b C20): emits the BASELINE.json:2 metric.

Headline: V-cycle DOF/s/chip on 3D Poisson AMG-PCG (structured DIA engine,
the TPU-native fast path), plus setup time and solve time to a true fp64
relative residual of 1e-8 (mixed-precision iterative refinement around the
fp32 on-device solve).

vs_baseline: BASELINE.json:5 targets ">=10x CPU-core-equivalent V-cycle
DOF/s on a single chip".  The CPU-core equivalent is measured in-process: the
same Galerkin hierarchy exported to SciPy CSR, one fp64 V-cycle in
vectorized SciPy (optimized C matvecs) — i.e. a competent single-core CPU
AMG doing identical work.  vs_baseline = (device DOF/s) / (10 x CPU DOF/s),
so >= 1.0 meets the north star.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sig(x, digits=4):
    """Round floats (recursively) to a few significant digits so the final
    JSON line stays compact: the driver's tail capture truncates at 2000
    chars, and full float reprs blew past it in round 3 (BENCH_r03
    parsed=null — the round's headline metric was lost)."""
    if isinstance(x, float):
        if x == 0 or not np.isfinite(x):
            return x
        from math import floor, log10

        return round(x, max(0, digits - 1 - floor(log10(abs(x)))))
    if isinstance(x, dict):
        return {k: _sig(v, digits) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_sig(v, digits) for v in x]
    return x


def scipy_vcycle_time(levels_csr, b, nu=2, reps=5):
    """fp64 SciPy V-cycle on the exported hierarchy: the CPU-core baseline."""
    import scipy.sparse.linalg as spla

    mats = [lv["A"] for lv in levels_csr]
    Ps = [lv["P"] for lv in levels_csr[:-1]]
    Rs = [lv["R"] for lv in levels_csr[:-1]]
    dinvs = [1.0 / lv["A"].diagonal() for lv in levels_csr]

    def vcycle(k, bb):
        A = mats[k]
        if k == len(mats) - 1:
            return spla.spsolve(A.tocsc(), bb)
        x = np.zeros_like(bb)
        for _ in range(nu // 2 or 1):
            x = x + (2.0 / 3.0) * dinvs[k] * (bb - A @ x)
        r = bb - A @ x
        ec = vcycle(k + 1, Rs[k] @ r)
        x = x + Ps[k] @ ec
        for _ in range(nu // 2 or 1):
            x = x + (2.0 / 3.0) * dinvs[k] * (bb - A @ x)
        return x

    vcycle(0, b)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        vcycle(0, b)
        best = min(best, time.perf_counter() - t0)
    return best  # fastest CPU run = the strongest baseline


def kernel_equality_check(on_tpu: bool) -> dict:
    """Compiled-mode Pallas-vs-XLA equality assert at bench startup
    (VERDICT r2 next #8): every BENCH_r*.json is then also a hardware
    correctness record for the DIA v2 kernel (fp32 + bf16 data) and the
    banded paged-gather kernel.  ~5 s; returns a small summary dict."""
    import jax
    import jax.numpy as jnp

    if not on_tpu:
        return {"ran": False}
    from raptor_tpu.core.hybrid import banded_from_csr, banded_spmv_ro
    from raptor_tpu.gallery import stencil_grid
    from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas_v2
    from raptor_tpu.structured import dia_from_stencil

    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for s in (0, 2):
            i[d] = s
            st[tuple(i)] = -1.0
    dims = (32, 32, 32)
    A = dia_from_stencil(st, dims, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(A.n).astype(np.float32))
    lins = A.linear_offsets()
    out = {"ran": True}
    # XLA roll reference
    ref = None
    for k, o in enumerate(lins):
        t = A.data[k] * (x if o == 0 else jnp.roll(x, -o))
        ref = t if ref is None else ref + t
    ref = np.asarray(ref)
    for name, data in (("dia_v2_fp32", A.data),
                       ("dia_v2_bf16", A.data.astype(jnp.bfloat16))):
        y = np.asarray(dia_spmv_pallas_v2(data, lins, x))
        err = float(np.abs(y - ref).max() / np.abs(ref).max())
        assert err < (1e-6 if name.endswith("fp32") else 2e-2), (name, err)
        out[name + "_maxrel"] = err
    # banded kernel vs its jnp reference path on a shuffled matrix
    a_sp = stencil_grid(st, dims)
    p = rng.permutation(a_sp.shape[0])
    a_sh = a_sp[p][:, p].tocsr()
    B = banded_from_csr(a_sh, dtype=np.float32)
    if B is not None:
        xr = jnp.asarray(rng.standard_normal(B.n_pad).astype(np.float32))
        yk = np.asarray(banded_spmv_ro(B, xr))  # kernel (TPU route)
        from raptor_tpu.ops.pallas.banded_kernel import banded_spmv_ref

        yr = np.asarray(banded_spmv_ref(B.plan(), xr))
        err = float(np.abs(yk - yr).max() / (np.abs(yr).max() or 1.0))
        assert err < 1e-6, ("banded", err)
        out["banded_maxrel"] = err
    log(f"kernel equality check PASSED: "
        f"{ {k: v for k, v in out.items() if k != 'ran'} }")
    return out


def algebraic_setup_detail() -> dict:
    """Algebraic (true-AMG) engine setup latency on the shuffled 48^3
    Poisson (n=110,592; no grid structure available) — the general-matrix
    setup time the spec's metric names (VERDICT r2 missing #1: was 430 s
    cold, unreported).  Reports cold (incl. compile) and warm builds plus
    the banded-layout end-to-end solve."""
    import time as _t

    import scipy.sparse as sp

    from raptor_tpu.api import setup, solve
    from raptor_tpu.config import AmgConfig, SolveConfig
    from raptor_tpu.gallery import poisson_3d

    A = poisson_3d(48)
    rng = np.random.default_rng(0)
    p = rng.permutation(A.shape[0])
    A = sp.csr_matrix(A)[p][:, p].tocsr()
    cfg = AmgConfig(splitting="pmis", interp="direct")

    t0 = _t.perf_counter()
    h = setup(A, cfg)
    _ = float(np.asarray(h.levels[0].dinv[0]))
    cold = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    h = setup(A, cfg)
    _ = float(np.asarray(h.levels[0].dinv[0]))
    warm = _t.perf_counter() - t0

    b = np.ones(A.shape[0])
    # cheb4 degree-2 smoothing: 19 -> 12 PCG iterations vs Jacobi on the
    # shuffled Poisson (same best-measured smoother as the structured
    # headline; the spec pins the coarsening/interp, not the smoother)
    cfg_b = AmgConfig(splitting="pmis", interp="direct", fine_layout="banded",
                      smoother="cheb4", cheb_degree=2)
    t0 = _t.perf_counter()
    hb = setup(A, cfg_b)
    x, info = solve(A, b, cfg_b, SolveConfig(tol=1e-8, refine=True), hier=hb)
    total = _t.perf_counter() - t0
    # warm solve: same hierarchy, jit cache hot — the per-solve latency a
    # production caller pays (the cold number above is compile-dominated)
    t0 = _t.perf_counter()
    x, info = solve(A, b, cfg_b, SolveConfig(tol=1e-8, refine=True), hier=hb)
    solve_warm = _t.perf_counter() - t0
    # device-only warm solve (no rhs upload / solution download): on the
    # remote-tunnel backend the transfers cost ~150 ms for 2x440 KB each
    # way, which is environment, not solver; production-local TPUs pay PCIe
    import jax as _jax

    from raptor_tpu.api import solve_hier_refined
    from raptor_tpu.core.ell import pad_vector

    pm = np.asarray(hb.perm)[: A.shape[0]]
    bp = b[pm]
    bd = pad_vector(bp.astype(np.float32), hb.levels[0].A.n_rows_pad)
    bdl = pad_vector((bp - bp.astype(np.float32).astype(np.float64))
                     .astype(np.float32), hb.levels[0].A.n_rows_pad)
    # maxiter must match SolveConfig's so this traces the SAME program the
    # api.solve calls above compiled — a new static-arg variant is another
    # executable load, and the remote backend errors (INVALID_ARGUMENT)
    # once too many programs accumulate in one process
    mi = SolveConfig().maxiter
    _jax.block_until_ready(
        solve_hier_refined(hb, bd, tol=1e-8, maxiter=mi, b_lo=bdl))
    # R async dispatches, one sync: a single dispatch+block pays a full
    # tunnel round trip (6-30 ms, environment noise at this scale)
    R = 5
    t0 = _t.perf_counter()
    for _ in range(R):
        out_dev = solve_hier_refined(hb, bd, tol=1e-8, maxiter=mi, b_lo=bdl)
    _jax.block_until_ready(out_dev)
    solve_dev = (_t.perf_counter() - t0) / R
    out = {
        "problem": "shuffled 3D Poisson 48^3 (n=110592), algebraic engine",
        "setup_cold_s": cold, "setup_warm_s": warm,
        "banded_setup_and_solve_cold_s": total,
        "banded_solve_warm_s": solve_warm,
        "banded_solve_warm_device_s": solve_dev,
        "iterations": int(info["iterations"]),
        "relres": float(info["relres"]),
    }
    log(f"[algebraic] setup cold={cold:.1f}s warm={warm:.2f}s; banded "
        f"setup+solve cold {total:.1f}s, warm solve {solve_warm*1e3:.0f} ms "
        f"({solve_dev*1e3:.0f} ms device), "
        f"iters={info['iterations']} relres={info['relres']:.2e}")
    return out


def algebraic_128_detail() -> dict:
    """Natural-ordered 3D Poisson 128^3 (n=2,097,152) through the GENERAL
    algebraic engine (VERDICT r3 next #2a): scipy CSR in, no grid metadata.
    fine_layout='banded' detects the plane structure and attaches the hybrid
    DIA-plane layouts (api._setup_banded), so this measures the true-AMG
    pipeline — device-fused PMIS + ext+i + Galerkin RAP at n>262k, host-
    NumPy tail below — at the same scale as the structured headline.
    Setup here IS the at-scale device-setup evidence (VERDICT r3 next #2b
    companion): levels above host_setup_threshold run the two fused jitted
    programs per level (setup/hierarchy.py)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from raptor_tpu.api import setup, solve
    from raptor_tpu.config import AmgConfig, SolveConfig
    from raptor_tpu.core.ell import pad_vector
    from raptor_tpu.gallery import poisson_3d
    from raptor_tpu.setup.hierarchy import cast_hierarchy_algebraic
    from raptor_tpu.solve.cycle import cycle

    A = poisson_3d(128)
    n = A.shape[0]
    # cheb_degree=3: measured best time-to-solution at this scale (round 4
    # sweep on hardware: deg2 23 iters / 5.21 s warm, deg3 17 / 4.62 s,
    # deg4 16 / 4.95 s — scripts/sweep_alg128_smoother.py)
    cfg = AmgConfig(splitting="pmis", interp="extended", fine_layout="banded",
                    smoother="cheb4", cheb_degree=3,
                    operator_store_dtype="bfloat16")

    def _build():
        t0 = _t.perf_counter()
        h = setup(A, cfg)
        jax.block_until_ready(h.levels[0].dinv)
        return h, _t.perf_counter() - t0

    h, cold = _build()
    h, warm = _build()
    n_dev_levels = sum(lv.n > cfg.host_setup_threshold for lv in h.levels)
    log(f"[alg128] setup: {warm:.2f}s warm ({cold:.1f}s cold), "
        f"{len(h.levels)} levels ({n_dev_levels} device-fused), "
        f"layouts={['hyb' if lv.Ahyb is not None else 'band' if lv.Aband is not None else 'ell' for lv in h.levels]}")

    # V-cycle throughput with bf16-stored preconditioner operators (same
    # production configuration as the structured headline)
    hM = cast_hierarchy_algebraic(h, jnp.bfloat16)
    b = pad_vector(np.ones(n, np.float32), h.levels[0].A.n_rows_pad)
    N = 20

    @jax.jit
    def run_cycles(hh, r):
        return jax.lax.fori_loop(
            0, N, lambda i, v: cycle(hh, v).astype(jnp.float32), r)

    ssum = jax.jit(jnp.sum)
    x = run_cycles(hM, b)
    _ = float(ssum(x))
    t0 = _t.perf_counter()
    reps = 3
    for _ in range(reps):
        x = run_cycles(hM, x)
    _ = float(ssum(x))
    vc = (_t.perf_counter() - t0) / reps / N
    rate = n / vc
    log(f"[alg128] V-cycle: {vc*1e3:.2f} ms -> {rate/1e9:.3f} GDOF/s "
        f"(bf16 operators)")

    # solve to a true 1e-8 (on-device df64 refinement) — warm timing
    b1 = np.ones(n)
    x_, info = solve(A, b1, cfg, SolveConfig(tol=1e-8, refine=True), hier=h)
    t0 = _t.perf_counter()
    x_, info = solve(A, b1, cfg, SolveConfig(tol=1e-8, refine=True), hier=h)
    sol = _t.perf_counter() - t0
    import scipy.sparse as sp

    a64 = sp.csr_matrix(A).astype(np.float64)
    true_rel = float(np.linalg.norm(b1 - a64 @ x_) / np.linalg.norm(b1))
    out = {
        "problem": "natural-ordered 3D Poisson 128^3 via general CSR API",
        "n": n, "setup_cold_s": cold, "setup_warm_s": warm,
        "setup_rows_per_s": n / warm,
        "device_fused_levels": int(n_dev_levels), "levels": len(h.levels),
        "vcycle_ms": vc * 1e3, "dof_per_s": rate,
        "solve_warm_s": sol, "iterations": int(info["iterations"]),
        "true_relres": true_rel,
    }
    log(f"[alg128] solve {sol:.3f}s warm, {info['iterations']} iters, "
        f"true relres {true_rel:.2e}")
    return out


def device_setup_detail() -> dict:
    """Device-pipeline algebraic setup at n > host_setup_threshold
    (VERDICT r3 next #2b): shuffled 96^3 Poisson (n=884,736 — no structure,
    no plane layout, the general sparse path).  With the default threshold
    (262,144) the fine levels run the two fused jitted device programs per
    level (setup/hierarchy._level_phase1/2) — this row is the measured
    cold/warm number for setup-on-device at scale, reported as rows/s so
    SpGEMM/RAP setup throughput is driver-visible (VERDICT r3 next #6)."""
    import time as _t

    import jax
    import scipy.sparse as sp

    from raptor_tpu.api import setup
    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import poisson_3d

    A = poisson_3d(96)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    A = sp.csr_matrix(A)[p][:, p].tocsr()
    cfg = AmgConfig(splitting="pmis", interp="extended")

    def _build():
        t0 = _t.perf_counter()
        h = setup(A, cfg)
        jax.block_until_ready(h.levels[0].dinv)
        return h, _t.perf_counter() - t0

    h, cold = _build()
    h, warm = _build()
    n_dev = sum(lv.n > cfg.host_setup_threshold for lv in h.levels)
    out = {
        "problem": "shuffled 3D Poisson 96^3 (n=884736), device-fused setup",
        "n": n, "setup_cold_s": cold, "setup_warm_s": warm,
        "setup_rows_per_s": n / warm,
        "device_fused_levels": int(n_dev), "levels": len(h.levels),
    }
    log(f"[devsetup] n={n}: {warm:.2f}s warm ({cold:.1f}s cold), "
        f"{n_dev}/{len(h.levels)} device-fused levels, "
        f"{n/warm/1e3:.0f} krows/s")

    # hierarchy QUALITY at scale (VERDICT r4 next #6): the same 96^3
    # problem built device-fused vs all-host, both measured by an identical
    # fp64 host PCG + exported-V-cycle oracle (scripts/devsetup_quality.py).
    # Runs on the CPU backend in a fresh subprocess: quality is a property
    # of the hierarchy, not the device solver, and this avoids both the
    # tunnel's 100+ MB operator pulls and two more unique TPU programs.
    import pathlib
    import subprocess

    try:
        qp = subprocess.run(
            [sys.executable,
             str(pathlib.Path(__file__).with_name("scripts")
                 / "devsetup_quality.py"), "96"],
            capture_output=True, text=True, timeout=500,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        q = json.loads(qp.stdout.strip().splitlines()[-1])
        out["iterations_dev"] = q["iterations_dev"]
        out["iterations_host"] = q["iterations_host"]
        out["quality"] = q
        log(f"[devsetup] oracle PCG quality: device-built "
            f"{q['iterations_dev']} iters vs host-built "
            f"{q['iterations_host']} iters")
    except Exception as e:
        out["quality"] = {"error": f"{type(e).__name__}: {e}"}
        log(f"[devsetup] quality comparison FAILED: {type(e).__name__}: {e}")
    return out


def acceptance_configs_detail(on_tpu: bool) -> dict:
    """One row per BASELINE.json acceptance config at driver-affordable
    sizes (VERDICT r2 next #7): capability claims become driver-visible
    artifacts instead of README assertions.  Config 5's sharded execution
    cannot run on one chip — its single-chip configuration runs here and the
    sharded path is exercised by the driver's dryrun_multichip."""
    import time as _t

    from raptor_tpu.api import solve
    from raptor_tpu.config import AmgConfig, PRESETS, SolveConfig
    from raptor_tpu.gallery import (
        anisotropic_2d, convection_diffusion_2d, elasticity_3d, poisson_2d,
        poisson_3d)

    import dataclasses

    probs = {
        "config1": lambda: (poisson_2d(64), None),
        "config2": lambda: (poisson_3d(32), None),
        "config3": lambda: (anisotropic_2d(96), None),
        # n=324,864 (VERDICT r3 next #5: elasticity at meaningful scale,
        # was 22,800): 48^3 grid x 3 dof through BlockELL + W-cycle,
        # measured 20 PCG iterations to true 5.8e-9 at op complexity 1.23
        "config4": lambda: elasticity_3d(48)[:2],  # (A, rigid-body modes)
        "config5": lambda: (poisson_3d(64), None),
        # beyond the five acceptance configs: nonsymmetric upwind
        # convection-diffusion through AMG-preconditioned restarted GMRES
        "nonsym_gmres": lambda: (convection_diffusion_2d(128), None),
    }
    amg_cfgs = {
        # host-SA setup at this n (vectorized NumPy, 57 s): the device SA
        # pipeline exists but pays compile + sync latency per level through
        # the remote tunnel; the SOLVE runs fully on the block layouts
        "config4": dataclasses.replace(PRESETS["config4"],
                                       host_setup_threshold=400000),
        "nonsym_gmres": AmgConfig(splitting="pmis", smoother="jacobi"),
    }
    solve_cfgs = {
        "nonsym_gmres": SolveConfig(tol=1e-8, refine=True, krylov="gmres"),
    }
    out = {}
    for name, gen in probs.items():
        try:
            A, B = gen()
            b = np.ones(A.shape[0])
            cfg = amg_cfgs.get(name) or PRESETS[name]
            t0 = _t.perf_counter()
            hier = None
            if B is not None:
                from raptor_tpu.api import setup as amg_setup

                hier = amg_setup(A, cfg, B=B)
            scfg = solve_cfgs.get(name) or SolveConfig(tol=1e-8, refine=True)
            x, info = solve(A, b, cfg, scfg, hier=hier)
            dt = _t.perf_counter() - t0
            import scipy.sparse as sp

            a64 = sp.csr_matrix(A).astype(np.float64)
            true_rel = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
            out[name] = {
                "n": int(A.shape[0]),
                "iterations": int(info["iterations"]),
                "relres": float(info["relres"]),
                "true_relres": true_rel,  # external fp64 check, not device
                "total_s": dt,
                "levels": info["stats"]["levels"],
            }
            log(f"[{name}] n={A.shape[0]} iters={info['iterations']} "
                f"relres={info['relres']:.2e} true={true_rel:.2e} {dt:.1f}s")
        except Exception as e:  # a config row must not kill the headline
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
    return out


def main():
    # global wall-clock budget (VERDICT r4 next #1): the driver's observed
    # kill window is < 2280 s (BENCH_r04 rc=124 with the old budget unspent
    # by its own accounting), so assume <= 1500 s and keep a finish margin.
    # Every detail phase below fits itself into what remains and is skipped
    # (with a visible marker) rather than risking the final JSON line — and
    # the compact headline is printed IMMEDIATELY after the 128^3 block +
    # CPU baseline, before any subprocess, so a kill can no longer lose the
    # round's machine-readable metric.
    t_bench_start = time.perf_counter()
    budget_s = float(os.environ.get("RAPTOR_BENCH_BUDGET_S", "1400"))

    def _remaining() -> float:
        return budget_s - (time.perf_counter() - t_bench_start)

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=0, help="grid points per dim")
    # 100 cycles/dispatch: the timed region holds 3 dispatches + 1 scalar
    # fetch, each a tunnel round trip (~30-100 ms) — at 20 cycles that
    # overhead inflated the 128^3 V-cycle ~2.03 ms vs 1.27 ms measured at
    # reps=200 (round 4, scripts/bench_x0_fold.py); 300 total cycles cuts
    # the per-cycle contamination ~5x while keeping the block < 10 s
    ap.add_argument("--cycles", type=int, default=100)
    # 2048: measured identical V-cycle time and iteration count vs 512 at
    # 256^3, but two fewer levels => ~80 s less cold setup compile
    ap.add_argument("--coarse-size", type=int, default=2048)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--profile", metavar="LOGDIR", default=None,
                    help="capture a jax.profiler trace of the timed V-cycles "
                         "(view in Perfetto/TensorBoard; phases are "
                         "named_scope-annotated per level)")
    ap.add_argument("--no-extra-sizes", action="store_true",
                    help="skip the secondary-size measurement")
    ap.add_argument("--no-solve", action="store_true",
                    help="skip the refined-solve measurement (compile-heavy)")
    ap.add_argument("--no-configs", action="store_true",
                    help="skip the per-acceptance-config detail rows")
    ap.add_argument("--no-kernel-check", action="store_true",
                    help="skip the compiled kernel-vs-roll equality assert")
    ap.add_argument("--measure-only", action="store_true",
                    help="internal: measure --size and print the raw dict as "
                         "JSON (used to run the secondary size in a fresh "
                         "process — the axon backend cannot hold both sizes' "
                         "programs at once)")
    ap.add_argument("--configs-only", action="store_true",
                    help="internal: run the acceptance-config rows and print "
                         "one JSON dict (fresh process: the remote backend "
                         "errors when too many programs accumulate)")
    ap.add_argument("--alg-only", action="store_true",
                    help="internal: run the algebraic-engine detail and "
                         "print one JSON dict (fresh process, see above)")
    ap.add_argument("--alg128-only", action="store_true",
                    help="internal: 128^3 natural-ordered Poisson through "
                         "the general algebraic engine (fresh process)")
    ap.add_argument("--devsetup-only", action="store_true",
                    help="internal: device-fused setup at n=884k "
                         "(fresh process)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    # persistent compile cache for TPU runs (no-op on CPU): remote compiles
    # dominate every cold measurement (63s structured 128^3, 265s banded
    # 48^3 refined solve); repeat bench runs on the same machine start warm
    from raptor_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    on_tpu = dev.platform not in ("cpu",)
    size = args.size or (128 if on_tpu else 32)
    log(f"device={dev} platform={dev.platform} size={size}^3")

    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import poisson_3d, default_rhs
    from raptor_tpu.structured import (
        DiaMatrix,
        build_structured_hierarchy,
        cast_hierarchy,
        dia_from_stencil,
        dia_to_scipy,
        structured_solve,
        scycle,
    )

    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for s in (0, 2):
            i[d] = s
            st[tuple(i)] = -1.0
        i[d] = 1

    # best measured configuration (docs/DESIGN.md): fourth-kind Chebyshev
    # degree-2 smoothing, bf16-stored preconditioner hierarchy
    cfg = AmgConfig(smoother="cheb4", cheb_degree=2, coarse_size=args.coarse_size,
                    max_levels=40)

    from raptor_tpu.gallery import stencil_grid
    from raptor_tpu.structured import structured_solve_refined

    def measure(sz: int, profile_dir=None):
        """Setup + V-cycle + refined-solve measurement at one size."""
        dims_ = (sz, sz, sz)
        n_ = sz**3
        A_ = dia_from_stencil(st, dims_, dtype=jnp.float32)
        _ = np.asarray(A_.data[0, :8])
        t0 = time.perf_counter()
        h_ = build_structured_hierarchy(A_, cfg, dim_policy="size")
        _ = np.asarray(h_.coarse_inv[:1, :1])
        cold = time.perf_counter() - t0
        # warm setup: same shapes hit the jit cache — the honest compute time
        t0 = time.perf_counter()
        h_ = build_structured_hierarchy(A_, cfg, dim_policy="size")
        _ = np.asarray(h_.coarse_inv[:1, :1])
        warm = time.perf_counter() - t0
        log(f"[{sz}^3] setup: {warm:.3f}s warm ({cold:.1f}s cold incl. "
            f"compile), {len(h_.levels)} levels, "
            f"offsets={[lv.A.n_off for lv in h_.levels]}")

        # V-cycle throughput (production preconditioner application:
        # bf16-stored operators, fp32 vectors)
        hM_ = cast_hierarchy(h_, jnp.bfloat16)
        b_ = jnp.asarray(default_rhs(n_, dtype=np.float32))
        N = args.cycles

        @jax.jit
        def run_cycles(h, r):  # N cycles inside one program: device time only
            return jax.lax.fori_loop(
                0, N, lambda i, v: scycle(h, v).astype(jnp.float32), r)

        ssum = jax.jit(lambda v: jnp.sum(v))
        x = run_cycles(hM_, b_)
        _ = float(ssum(x))  # 4-byte sync (large downloads pollute the timing)
        import contextlib

        from raptor_tpu.utils.profiling import trace

        prof = trace(profile_dir) if profile_dir else contextlib.nullcontext()
        with prof:
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                x = run_cycles(hM_, x)
            _ = float(ssum(x))
            vc = (time.perf_counter() - t0) / reps / N
        rate = n_ / vc
        log(f"[{sz}^3] V-cycle: {vc*1e3:.2f} ms -> {rate/1e9:.3f} GDOF/s")

        # fp32-stored-operator comparison (bf16 planes are the production
        # default; the driver artifact records what they buy — VERDICT r3
        # item 5)
        x32 = run_cycles(h_, b_)
        _ = float(ssum(x32))
        t0 = time.perf_counter()
        x32 = run_cycles(h_, x32)
        _ = float(ssum(x32))
        vc32 = (time.perf_counter() - t0) / N
        log(f"[{sz}^3] V-cycle fp32 operators: {vc32*1e3:.2f} ms "
            f"(bf16 speedup {vc32/vc:.2f}x)")

        if args.no_solve:
            return {
                "hier": h_, "vcycle_s": vc, "vcycle_fp32_s": vc32,
                "dof_per_s": rate, "setup_s": warm, "setup_cold_s": cold,
                "solve_s": -1.0, "iters": -1, "relres": -1.0,
            }
        # solve to true 1e-8: fully on device (fp32 inner AMG-PCG inside
        # compensated double-float32 refinement — one jit, docs/DESIGN.md §5b)
        (xh, xl), rel, iters = structured_solve_refined(
            h_, b_, tol=args.tol, M_hier=hM_)  # warm (compile)
        _ = float(rel)
        t0 = time.perf_counter()
        (xh, xl), rel, iters = structured_solve_refined(
            h_, b_, tol=args.tol, M_hier=hM_)
        _ = float(rel)
        sol = time.perf_counter() - t0
        # honest external verification in numpy fp64
        A_sp_ = stencil_grid(st, dims_)
        b64 = np.asarray(b_, dtype=np.float64)
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        relres = float(np.linalg.norm(b64 - A_sp_ @ x64) / np.linalg.norm(b64))
        log(f"[{sz}^3] solve: {sol:.3f}s, {int(iters)} PCG iterations, "
            f"true relres {relres:.2e}")
        return {
            "hier": h_, "vcycle_s": vc, "vcycle_fp32_s": vc32,
            "dof_per_s": rate, "setup_s": warm, "setup_cold_s": cold,
            "solve_s": sol, "iters": int(iters), "relres": relres,
        }

    if args.measure_only:
        m = measure(size)
        m.pop("hier")
        print(json.dumps(m), flush=True)
        return
    if args.configs_only:
        print(json.dumps(acceptance_configs_detail(on_tpu)), flush=True)
        return
    for flag, fn in (("alg_only", algebraic_setup_detail),
                     ("alg128_only", algebraic_128_detail),
                     ("devsetup_only", device_setup_detail)):
        if getattr(args, flag):
            try:
                print(json.dumps(fn()), flush=True)
            except Exception as e:
                print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            return

    kcheck = ({"ran": False} if args.no_kernel_check
              else kernel_equality_check(on_tpu))

    m = measure(size, profile_dir=args.profile)
    hier = m["hier"]
    n = size**3
    vcycle_s, dofs_per_s = m["vcycle_s"], m["dof_per_s"]
    setup_s, setup_cold_s = m["setup_s"], m["setup_cold_s"]
    solve_s, iters_total, final_relres = m["solve_s"], m["iters"], m["relres"]

    # snapshot the headline hierarchy to host CSR now so its device buffers
    # can be dropped before the 256^3 measurement (holding both hierarchies
    # plus compiled programs pressures the 16 GiB HBM)
    levels_csr = []
    for k, lv in enumerate(hier.levels):
        entry = {"A": dia_to_scipy(lv.A).astype(np.float64)}
        if lv.Pt is not None:
            from raptor_tpu.structured.dia import dia_to_scipy as d2s
            from raptor_tpu.structured.solver import _c_mask

            cmask = _c_mask(lv.dims, lv.cdim)
            Pt = d2s(lv.Pt).astype(np.float64)
            entry["P"] = Pt[:, cmask]
            entry["R"] = entry["P"].T.tocsr()
        levels_csr.append(entry)
    del hier
    m["hier"] = None
    # also drop the 128^3 executables: loaded TPU programs live in HBM, and
    # the resident 128^3 setup/solve programs plus the 256^3 ones exceed the
    # chip's program space (observed as INVALID_ARGUMENT at 256^3 otherwise)
    jax.clear_caches()

    # ---- CPU-core-equivalent baseline, IMMEDIATELY after the headline
    # block (VERDICT r4 next #1): the compact line must be printable before
    # any detail subprocess runs ----
    cpu_size = size
    bc = default_rhs(cpu_size**3, dtype=np.float64)
    cpu_cycle_s = scipy_vcycle_time(levels_csr, bc)
    cpu_dofs = cpu_size**3 / cpu_cycle_s
    log(f"CPU-core baseline ({cpu_size}^3): {cpu_cycle_s*1e3:.2f} ms/cycle "
        f"-> {cpu_dofs/1e6:.1f} MDOF/s")
    vs_baseline = dofs_per_s / (10.0 * cpu_dofs)

    # mutable detail state: every emit() snapshots it; phases fill it in
    extra = {}
    configs_detail: dict = {}
    alg128_detail: dict = {}
    devsetup_detail: dict = {}
    alg_detail: dict = {}

    def _cfg_compact(d):
        if "error" in d:  # the whole configs phase failed or was skipped
            return str(d["error"])[:80]
        return {k: ([v.get("n"), v.get("iterations"), v.get("true_relres")]
                    if isinstance(v, dict) and "error" not in v else "ERR")
                for k, v in d.items()}

    def emit():
        """Write BENCH_DETAIL.json and print the compact headline line.

        Called right after the headline block (so a driver kill can never
        again lose the round's metric — BENCH_r04 rc=124/parsed=null) and
        re-called at the very end so the enriched line is last-on-stdout in
        a completed run.  Every printed line is a complete <1800-char JSON
        object; the driver's 2000-char stdout tail keeps the last one."""
        full_detail = {
            "problem": f"3D Poisson {size}^3 AMG-PCG (structured DIA engine)",
            "op_dtype": "bfloat16 operators / fp32 vectors",
            "vcycle_ms": vcycle_s * 1e3,
            "vcycle_fp32_ms": m.get("vcycle_fp32_s", -1) * 1e3,
            "setup_s": setup_s,
            "setup_cold_s": setup_cold_s,
            "solve_to_1e-8_s": solve_s,
            "pcg_iterations": iters_total,
            "final_relres": final_relres,
            "cpu_core_dof_per_s": cpu_dofs,
            "device": str(dev),
            "kernel_check": kcheck,
            "configs": configs_detail,
            "algebraic": alg_detail,
            "alg128": alg128_detail,
            "device_setup": devsetup_detail,
            **extra,
        }
        try:
            import pathlib

            pathlib.Path(__file__).with_name("BENCH_DETAIL.json").write_text(
                json.dumps({"metric": "vcycle_dof_per_s_per_chip",
                            "value": dofs_per_s, "unit": "DOF/s",
                            "vs_baseline": vs_baseline,
                            "detail": full_detail}, indent=1))
        except OSError as e:
            log(f"BENCH_DETAIL.json write failed: {e}")
        c256 = extra.get("256", {})
        compact = {
            "metric": "vcycle_dof_per_s_per_chip",
            "value": dofs_per_s,
            "unit": "DOF/s",
            "vs_baseline": vs_baseline,
            "detail": _sig({
                "problem": f"3D Poisson {size}^3 AMG-PCG, structured engine, "
                           "bf16 ops/fp32 vectors",
                "vcycle_ms": vcycle_s * 1e3,
                "fp32_vcycle_ms": m.get("vcycle_fp32_s", -1) * 1e3,
                "setup_s": setup_s, "setup_cold_s": setup_cold_s,
                "solve_s": solve_s, "iters": iters_total,
                "relres": final_relres,
                "cpu_mdof_s": cpu_dofs / 1e6,
                "kcheck": ("pass" if kcheck.get("ran") else "skip"),
                "c256": ({k: c256.get(k) for k in
                          ("vcycle_ms", "dof_per_s", "per_dof_vs_headline",
                           "solve_to_tol_s", "pcg_iterations")}
                         if c256 and "error" not in c256
                         else c256.get("error", "skip")),
                "alg128": ({k: alg128_detail.get(k) for k in
                            ("vcycle_ms", "setup_warm_s",
                             "setup_cold_s", "solve_warm_s", "iterations")}
                           if alg128_detail and "error" not in alg128_detail
                           else alg128_detail.get("error", "skip")),
                "dev_setup": ({k: devsetup_detail.get(k) for k in
                               ("n", "setup_warm_s", "setup_rows_per_s",
                                "iterations_dev", "iterations_host")}
                              if devsetup_detail
                              and "error" not in devsetup_detail
                              else devsetup_detail.get("error", "skip")),
                "alg48": ({"setup_warm_s": alg_detail.get("setup_warm_s"),
                           "solve_dev_ms":
                               (alg_detail.get("banded_solve_warm_device_s",
                                               -1) or -1) * 1e3,
                           "iters": alg_detail.get("iterations")}
                          if alg_detail and "error" not in alg_detail
                          else alg_detail.get("error", "skip")),
                "cfg": _cfg_compact(configs_detail),
                "detail_file": "BENCH_DETAIL.json",
            }),
        }
        line = json.dumps(compact)
        if len(line) >= 1800:  # hard fence: never hand the driver a long line
            log(f"WARNING: compact line {len(line)} chars >= 1800; pruning")
            compact["detail"].pop("cfg", None)
            line = json.dumps(compact)
        if len(line) >= 1800:
            compact["detail"] = {"pruned": True}
            line = json.dumps(compact)
        print(line, flush=True)

    # headline is now safe: print it before anything else can fail or stall
    emit()

    # if the driver's kill signal lands mid-phase anyway, flush the current
    # state as the last stdout line before dying (SIGTERM precedes SIGKILL
    # under `timeout`; best-effort — the early emit above already banked
    # the headline)
    import signal

    def _flush_and_exit(signum, frame):
        log(f"signal {signum}: emitting current state and exiting")
        try:
            emit()
        finally:
            os._exit(0)

    signal.signal(signal.SIGTERM, _flush_and_exit)

    # detail phases run in FRESH subprocesses: the remote (axon) TPU backend
    # returns INVALID_ARGUMENT once too many programs accumulate in one
    # process, and a detail row must never cost the headline JSON.
    # min_s is the measured cold cost of the phase through the tunnel — a
    # phase is launched ONLY with a timeout it could actually survive
    # (BENCH_r04 burned 600 s on two doomed 300 s 256^3 attempts).
    def _sub_json(cli_args: list, label: str, min_s: float,
                  max_s: float) -> dict:
        import subprocess
        import sys as _sys

        # reserve 45 s for the final emission; a skipped row is
        # driver-visible, a killed bench is not
        timeout_s = min(max_s, _remaining() - 45)
        if timeout_s < min_s:
            log(f"[{label}] SKIPPED: {_remaining():.0f}s left < "
                f"{min_s:.0f}s cold cost")
            return {"error": f"skipped: {_remaining():.0f}s budget left, "
                             f"needs >={min_s:.0f}s"}
        try:
            p = subprocess.run(
                [_sys.executable, __file__, *cli_args], capture_output=True,
                text=True, timeout=timeout_s)
            if p.returncode != 0:
                raise RuntimeError(f"rc={p.returncode}: "
                                   f"{p.stderr.strip()[-400:]}")
            for ln in p.stderr.splitlines():
                if ln.startswith("["):
                    log(f"  {ln}")
            return json.loads(p.stdout.strip().splitlines()[-1])
        except Exception as e:
            log(f"[{label}] FAILED: {type(e).__name__}: {e}")
            return {"error": f"{type(e).__name__}: {e}"}

    # priority order under the budget (VERDICT r4 next #2): the five
    # acceptance-config rows are judge-checked every round and run FIRST;
    # then the algebraic-128^3 row, then 256^3, then the stable rows
    if not args.no_configs:
        configs_detail.update(
            _sub_json(["--configs-only"], "configs", min_s=240, max_s=700))
        emit()
    if on_tpu and not args.no_configs:
        alg128_detail.update(
            _sub_json(["--alg128-only"], "alg128", min_s=300, max_s=900))
        emit()

    # secondary size: config 5 names 256^3 (BASELINE.json:11).  The full
    # measure (setup + cycles + refined solve) costs ~300 s with a warm
    # compile cache but tens of minutes fully cold — run it only with a
    # timeout that covers the warm cost, degrade to --no-solve (setup +
    # V-cycle only) when the window is tighter, and skip visibly otherwise
    if on_tpu and not args.no_extra_sizes and size == 128:
        base256 = ["--size", "256", "--measure-only", "--tol",
                   str(args.tol), "--coarse-size", str(args.coarse_size)]
        rem = _remaining() - 45
        if rem >= 420:
            m2 = _sub_json(base256, "256^3 full", min_s=420, max_s=1200)
        elif rem >= 240:
            m2 = _sub_json(base256 + ["--no-solve"], "256^3 no-solve",
                           min_s=240, max_s=420)
            m2.setdefault("solve_note", "budget allowed --no-solve only")
        else:
            m2 = {"error": f"skipped: {rem:.0f}s budget left"}
            log(f"[256^3] SKIPPED: {rem:.0f}s left")
        if "error" not in m2:
            extra["256"] = {
                "vcycle_ms": m2["vcycle_s"] * 1e3,
                "vcycle_fp32_ms": m2.get("vcycle_fp32_s", -1) * 1e3,
                "dof_per_s": m2["dof_per_s"],
                "setup_s": m2["setup_s"],
                "solve_to_tol_s": m2["solve_s"],
                "pcg_iterations": m2["iters"],
                "final_relres": m2["relres"],
                "per_dof_vs_headline":
                    (m2["vcycle_s"] / 256**3) / (vcycle_s / n),
            }
            if "solve_note" in m2:
                extra["256"]["solve_note"] = m2["solve_note"]
        else:
            extra["256"] = m2
        emit()

    if on_tpu and not args.no_configs:
        devsetup_detail.update(
            _sub_json(["--devsetup-only"], "devsetup", min_s=300, max_s=900))
        emit()
    if not args.no_configs:
        alg_detail.update(
            _sub_json(["--alg-only"], "alg48", min_s=240, max_s=600))

    log("FULL DETAIL: see BENCH_DETAIL.json")
    emit()  # final enriched line, last-on-stdout in a completed run


if __name__ == "__main__":
    main()
