"""Command-line interface (SURVEY.md §2b C20): the five acceptance configs
as named presets plus ad-hoc solves.

  python -m raptor_tpu bench --preset config2
  python -m raptor_tpu solve --problem poisson3d --n 32 --method structured
  python -m raptor_tpu info

Bench output is JSON-lines (one object per run) with the BASELINE.json:2
metric fields: V-cycle DOF/s, setup seconds, solve-to-tol seconds,
iteration count (SURVEY.md §5.5).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _problem(name: str, n: int):
    from raptor_tpu import gallery

    if name == "poisson2d":
        return gallery.poisson_2d(n), None, (n, n)
    if name == "poisson3d":
        return gallery.poisson_3d(n), None, (n, n, n)
    if name == "anisotropic":
        return gallery.anisotropic_2d(n, epsilon=1e-3, theta=np.pi / 6), None, (n, n)
    if name == "convdiff":
        # nonsymmetric: pair with --krylov gmres / bicgstab
        return gallery.convection_diffusion_2d(n, epsilon=1e-2), None, (n, n)
    if name == "elasticity":
        A, B, _ = gallery.elasticity_3d(n)
        return A, B, None
    raise SystemExit(f"unknown problem: {name}")


# preset -> (gallery problem, default n); the AmgConfig itself always comes
# from the canonical raptor_tpu.config.PRESETS so the CLI can never bench a
# different configuration than the library ships (BASELINE.json:7-11)
PRESET_PROBLEMS = {
    "config1": ("poisson2d", 64),
    "config2": ("poisson3d", 32),
    "config3": ("anisotropic", 64),
    "config4": ("elasticity", 8),
    "config5": ("poisson3d", 256),
}


def cmd_solve(args):
    import jax
    import jax.numpy as jnp

    from raptor_tpu import AmgConfig, SolveConfig, solve
    from raptor_tpu.gallery import default_rhs

    if args.fp64:
        # a user asking for an fp64 solve must actually get fp64 — without
        # x64 enabled jnp.float64 silently downgrades to fp32 and a tol=1e-8
        # solve stalls at maxiter (ADVICE r1)
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        if jax.default_backend() in ("tpu", "axon"):
            # fp64 is not hardware-supported on TPU (observed: the XLA TPU
            # compiler can crash outright on f64 AMG programs).  The TPU way
            # to certify 1e-8 is the default df64 on-device refinement.
            raise SystemExit(
                "--fp64 is not supported on TPU backends; run on CPU "
                "(JAX_PLATFORMS=cpu) or drop --fp64 — the default solve "
                "certifies 1e-8 via on-device double-float32 refinement.")

    if args.matrix:
        from raptor_tpu.utils.io import read_matrix

        A = read_matrix(args.matrix)
        if A.shape[0] != A.shape[1]:
            raise SystemExit(f"--matrix must be square, got {A.shape}")
        B, dims = None, None
    else:
        A, B, dims = _problem(args.problem, args.n)
    if args.rhs:
        from raptor_tpu.utils.io import read_vector

        b = read_vector(args.rhs)
        if b.shape[0] != A.shape[0]:
            raise SystemExit(
                f"--rhs length {b.shape[0]} != matrix rows {A.shape[0]}")
    else:
        b = default_rhs(A.shape[0])
    if args.method == "structured":
        if dims is None:
            raise SystemExit("structured method needs a grid problem")
        from raptor_tpu.structured import (
            build_structured_hierarchy,
            dia_from_scipy,
            structured_solve,
        )

        D = dia_from_scipy(A, dims, dtype=jnp.float64 if args.fp64 else jnp.float32)
        cfg = AmgConfig(smoother=args.smoother or "mcgs")
        hier = build_structured_hierarchy(D, cfg)
        t0 = time.perf_counter()
        x, info = structured_solve(hier, jnp.asarray(
            b, D.dtype), tol=args.tol, maxiter=args.maxiter,
            krylov=args.krylov or "cg")
        out = {
            "iterations": int(info.iterations),
            "relres": float(info.relres),
            "seconds": time.perf_counter() - t0,
            "true_relres": float(
                np.linalg.norm(A @ np.asarray(x, np.float64) - b)
                / np.linalg.norm(b)
            ),
        }
    else:
        cfg = AmgConfig(splitting=args.splitting,
                        smoother=args.smoother or "jacobi",
                        fine_layout=args.layout)
        sc = SolveConfig(dtype="float64" if args.fp64 else "float32",
                         tol=args.tol, maxiter=args.maxiter,
                         refine=not args.fp64,
                         krylov=args.krylov or "cg")
        t0 = time.perf_counter()
        x, info = solve(A, b, cfg, sc)
        out = {
            "iterations": info["iterations"],
            "relres": info["relres"],
            "seconds": time.perf_counter() - t0,
            "stats": info["stats"],
        }
    if args.out:
        from raptor_tpu.utils.io import write_vector

        write_vector(args.out, np.asarray(x, np.float64)[: A.shape[0]])
        out["solution"] = args.out
    print(json.dumps(out))


def cmd_bench(args):
    import jax
    import jax.numpy as jnp

    from raptor_tpu import setup
    from raptor_tpu.api import solve_hier
    from raptor_tpu.core import pad_vector
    from raptor_tpu.gallery import default_rhs

    from raptor_tpu.config import PRESETS

    name, n = PRESET_PROBLEMS[args.preset]
    n = args.n or n

    if args.preset == "config5":
        # distributed structured path (BASELINE.json:11): plane-sharded
        # hierarchy + ppermute halos over all available devices; falls back
        # to the single-chip structured engine on one device
        return _bench_config5(n, args)

    A, B, dims = _problem(name, n)
    b = default_rhs(A.shape[0])
    cfg = PRESETS[args.preset]

    t0 = time.perf_counter()
    if B is not None:
        from raptor_tpu.setup.aggregation import build_sa_hierarchy

        hier = build_sa_hierarchy(A, cfg, dtype=jnp.float32, B=B)
    else:
        hier = setup(A, cfg, dtype=jnp.float32)
    jax.block_until_ready(hier.levels[-1].A.data)
    setup_s = time.perf_counter() - t0

    bd = pad_vector(b.astype(np.float32), hier.levels[0].A.n_rows_pad)
    solve_hier(hier, bd, tol=1e-6, maxiter=args.maxiter)  # warm
    t0 = time.perf_counter()
    x, info = solve_hier(hier, bd, tol=1e-6, maxiter=args.maxiter)
    relres = float(info.relres)
    solve_s = time.perf_counter() - t0
    from raptor_tpu.setup.hierarchy import hierarchy_stats

    print(json.dumps({
        "preset": args.preset,
        "problem": f"{name} n={n}",
        "setup_s": setup_s,
        "solve_s": solve_s,
        "iterations": int(info.iterations),
        "relres": relres,
        "stats": hierarchy_stats(hier),
    }))


def _bench_config5(n, args):
    import jax
    import jax.numpy as jnp

    from raptor_tpu.config import AmgConfig
    from raptor_tpu.gallery import default_rhs
    from raptor_tpu.structured import (
        build_structured_hierarchy,
        dia_from_stencil,
        structured_solve,
    )

    st = np.zeros((3, 3, 3))
    st[1, 1, 1] = 6.0
    for d in range(3):
        i = [1, 1, 1]
        for sgn in (0, 2):
            i[d] = sgn
            st[tuple(i)] = -1.0
        i[d] = 1
    cfg = AmgConfig(smoother="mcgs", coarse_size=512, max_levels=40)
    ndev = len(jax.devices())
    A = dia_from_stencil(st, (n, n, n), dtype=jnp.float32)
    b = jnp.asarray(default_rhs(n**3, dtype=np.float32))
    t0 = time.perf_counter()
    if ndev > 1 and n % ndev == 0:
        from raptor_tpu.structured.dist import sdist_solve
        from raptor_tpu.structured.dist_setup import sdist_build_hierarchy

        mesh = jax.make_mesh((ndev,), ("x",))
        hier = sdist_build_hierarchy(A, cfg, mesh, dim_policy="size")
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        x, info = sdist_solve(hier, b, mesh, tol=1e-6, maxiter=args.maxiter)
    else:
        hier = build_structured_hierarchy(A, cfg, dim_policy="size")
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        x, info = structured_solve(hier, b, tol=1e-6, maxiter=args.maxiter)
    jax.block_until_ready(x)
    print(json.dumps({
        "preset": "config5",
        "problem": f"poisson3d n={n} (structured, {ndev} device(s))",
        "setup_s": setup_s,
        "solve_s": time.perf_counter() - t0,
        "iterations": int(info.iterations),
        "relres": float(info.relres),
    }))


def cmd_info(args):
    import jax

    import raptor_tpu

    print(json.dumps({
        "version": raptor_tpu.__version__,
        "devices": [str(d) for d in jax.devices()],
        "backend": jax.default_backend(),
    }))


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even when a site hook pre-forces a platform list
        # (observed in images that inject jax_platforms="axon,cpu")
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # TPU compiles through the remote tunnel dominate every cold command
    # (e.g. `bench --preset config4` measured 98 s setup at n=1344, nearly
    # all of it compiles); share bench.py's persistent on-disk cache so
    # repeat CLI runs start warm
    from raptor_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser(prog="raptor_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("solve", help="solve a gallery problem or a matrix "
                                     "read from a file")
    s.add_argument("--problem", default="poisson3d",
                   choices=["poisson2d", "poisson3d", "anisotropic",
                            "convdiff", "elasticity"])
    s.add_argument("--matrix", default=None, metavar="PATH",
                   help="solve this operator instead of a gallery problem "
                        "(.mtx/.mtx.gz/.npz/.rbm, see utils/io.py)")
    s.add_argument("--rhs", default=None, metavar="PATH",
                   help="right-hand side (.npy or text; default: "
                        "deterministic unit-norm random)")
    s.add_argument("--out", default=None, metavar="PATH",
                   help="write the solution vector here (.npy or text)")
    s.add_argument("--krylov", default=None,
                   choices=["cg", "bicgstab", "gmres", "fgmres", "none"],
                   help="outer Krylov method (default: cg)")
    s.add_argument("--n", type=int, default=32)
    s.add_argument("--method", default="algebraic",
                   choices=["algebraic", "structured"])
    s.add_argument("--splitting", default="pmis",
                   choices=["rs", "pmis", "cljp", "aggregation"])
    s.add_argument("--smoother", default=None)
    s.add_argument("--tol", type=float, default=1e-8)
    s.add_argument("--maxiter", type=int, default=200)
    s.add_argument("--fp64", action="store_true")
    s.add_argument("--layout", default="ell", choices=["ell", "banded"],
                   help="operator layout for the algebraic solve path; "
                        "'banded' = RCM + paged dynamic-gather Pallas "
                        "kernel (the general-CSR fast path)")
    s.set_defaults(fn=cmd_solve)

    bench = sub.add_parser("bench", help="run an acceptance-config preset")
    bench.add_argument("--preset", default="config2",
                       choices=sorted(PRESET_PROBLEMS))
    bench.add_argument("--n", type=int, default=0)
    bench.add_argument("--maxiter", type=int, default=200)
    bench.set_defaults(fn=cmd_bench)

    info = sub.add_parser("info", help="device/version info")
    info.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
