"""Smoothers: weighted Jacobi, multicolor (red-black) Gauss-Seidel, Chebyshev.

Capability target (SURVEY.md §0 — the public RAPtor AMG
library named by BASELINE.json:5, not the mounted reference; convergence
spec = tests/oracle/amg_oracle.py): RAPtor's ``relax.cpp`` (jacobi / sor / gauss-seidel;
SURVEY.md §2b C15).  BASELINE.json:5 prescribes the parallel recast: "hybrid
Gauss-Seidel recast as red-black/Chebyshev for parallelism" — sequential GS
sweeps become (a) multicolor sweeps (one masked Jacobi-like update per color,
exactly red-black on 5-/7-point stencils) and (b) Chebyshev polynomial
smoothing (PAPERS.md:7,9), both fully parallel on the VPU.

All functions are jit-traceable and allocation-free in the solve loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raptor_tpu.core.ell import EllMatrix
from raptor_tpu.ops.sparse_ops import spmv

__all__ = ["jacobi", "multicolor_gs", "two_stage_gs", "triangular_apply",
           "chebyshev", "chebyshev4", "estimate_lmax", "greedy_coloring_host"]


@partial(jax.jit, static_argnames=("sweeps", "x0_zero"))
def jacobi(A: EllMatrix, dinv, b, x, omega: float = 2.0 / 3.0, sweeps: int = 1,
           x0_zero: bool = False):
    """x <- x + omega D^{-1} (b - A x), ``sweeps`` times.

    ``x0_zero`` (static) asserts x == 0 on entry so the first residual is
    just ``b`` — XLA does NOT fold ``A @ 0`` (verified on the optimized
    HLO), and every cycle's pre-smooth starts from zero, so this elides one
    full SpMV of HBM traffic per level per cycle.  Numerically identical
    (b - A@0 == b except for signs of zeros)."""
    def body(_, x):
        return x + omega * dinv * (b - spmv(A, x))

    if x0_zero and sweeps:
        x = omega * dinv * b
        return jax.lax.fori_loop(0, sweeps - 1, body, x)
    return jax.lax.fori_loop(0, sweeps, body, x)


@partial(jax.jit, static_argnames=("ncolors", "sweeps", "backward", "x0_zero"))
def multicolor_gs(
    A: EllMatrix,
    dinv,
    b,
    x,
    color,
    ncolors: int,
    sweeps: int = 1,
    backward: bool = False,
    x0_zero: bool = False,
):
    """Multicolor Gauss-Seidel: per color c, x_c <- x_c + (D^{-1}(b - Ax))_c.

    With 2 colors on a bipartite stencil graph this is exactly red-black GS
    (BASELINE.json:8).  ``backward`` reverses the color order so a
    forward-pre / backward-post pair keeps the V-cycle symmetric (required
    for CG preconditioning).
    """
    order = list(range(ncolors))
    if backward:
        order.reverse()

    def sweep(_, x):
        for c in order:
            r = b - spmv(A, x)
            x = x + jnp.where(color == c, dinv * r, 0)
        return x

    if x0_zero and sweeps:
        # first color of the first sweep sees r = b exactly (x == 0): one
        # SpMV of A@0 elided — see ``jacobi``'s docstring
        x = jnp.where(color == order[0], dinv * b, jnp.zeros_like(b))
        for c in order[1:]:
            r = b - spmv(A, x)
            x = x + jnp.where(color == c, dinv * r, 0)
        return jax.lax.fori_loop(0, sweeps - 1, sweep, x)
    return jax.lax.fori_loop(0, sweeps, sweep, x)


def triangular_apply(A: EllMatrix, x, upper: bool, col_bound: int | None = None):
    """y = L @ x (strict lower triangle) or U @ x (strict upper).

    A masked ELL SpMV: entries whose column fails the triangle test are
    zeroed at trace time (padding slots have ``col == row`` and are excluded
    by both strict inequalities).  ``col_bound`` additionally restricts to
    columns < bound — the distributed hybrid variant masks halo columns out
    of the triangle so only processor-local coupling enters the inner solve.
    """
    import dataclasses

    rows = A.row_index()
    mask = (A.cols > rows) if upper else (A.cols < rows)
    if col_bound is not None:
        mask = mask & (A.cols < col_bound)
    return spmv(dataclasses.replace(A, data=jnp.where(mask, A.data, 0)), x)


@partial(jax.jit, static_argnames=("sweeps", "inner", "backward", "x0_zero"))
def two_stage_gs(A: EllMatrix, dinv, b, x, sweeps: int = 1, inner: int = 2,
                 backward: bool = False, x0_zero: bool = False):
    """Two-stage Gauss-Seidel (PAPERS.md:9, Yamazaki et al.): the exact
    triangular solve of a GS sweep, x <- x + (D+L)^{-1} (b - A x), is
    replaced by ``inner`` Jacobi iterations on the triangular system —

        z_0 = D^{-1} r,   z_{j+1} = D^{-1} (r - L z_j)

    — a truncated Neumann series for (D+L)^{-1} built entirely from masked
    SpMVs, so the sweep is fully parallel on the VPU with no coloring and no
    sequential dependence.  ``backward=True`` uses the strict upper triangle;
    a forward-pre / backward-post pair keeps the V-cycle symmetric for CG
    (the inner series for (D+U)^{-1} is the transpose of the forward one on
    symmetric A).  inner=0 degenerates to unweighted Jacobi; inner -> inf
    recovers exact GS.
    """
    def inner_series(r):
        z = dinv * r
        for _j in range(inner):
            z = dinv * (r - triangular_apply(A, z, upper=backward))
        return z

    def sweep(_, x):
        return x + inner_series(b - spmv(A, x))

    if x0_zero and sweeps:
        x = inner_series(b)  # r = b - A@0 == b: outer SpMV elided
        return jax.lax.fori_loop(0, sweeps - 1, sweep, x)
    return jax.lax.fori_loop(0, sweeps, sweep, x)


@partial(jax.jit, static_argnames=("degree", "x0_zero"))
def chebyshev(A: EllMatrix, dinv, b, x, lmin, lmax, degree: int = 3,
              x0_zero: bool = False):
    """Chebyshev polynomial smoothing on D^{-1}A over [lmin, lmax].

    Standard three-term Chebyshev semi-iteration (Saad, Iterative Methods,
    Alg. 12.1), preconditioned by the diagonal; fully parallel — the
    polynomial replacement for Gauss-Seidel strength (PAPERS.md:7).
    """
    d = (lmax + lmin) / 2
    c = (lmax - lmin) / 2
    p = jnp.zeros_like(x)
    alpha = jnp.zeros_like(d)
    for i in range(degree):
        z = dinv * b if (x0_zero and i == 0) else dinv * (b - spmv(A, x))
        if i == 0:
            p = z
            alpha = 1.0 / d
        else:
            beta = (c * alpha / 2) ** 2
            alpha = 1.0 / (d - beta / alpha)
            p = z + beta * p
        x = x + alpha * p
    return x


@partial(jax.jit, static_argnames=("degree", "x0_zero"))
def chebyshev4(A: EllMatrix, dinv, b, x, lmax, degree: int = 3,
               x0_zero: bool = False):
    """Fourth-kind Chebyshev smoother (PAPERS.md:7, Lottes-style).

    Needs only the upper eigenvalue estimate (no lower-bound interval
    tuning), with provably better smoothing of the upper spectrum than the
    classical first-kind interval choice:

        d_1 = (4/3) / lmax * D^{-1} r
        d_k = (2k-3)/(2k+1) d_{k-1} + (8k-4)/((2k+1) lmax) D^{-1} r_k
    """
    r = b if x0_zero else b - spmv(A, x)
    d = (4.0 / 3.0) / lmax * (dinv * r)
    x = x + d
    for k in range(2, degree + 1):
        r = r - spmv(A, d)
        d = ((2 * k - 3) / (2 * k + 1)) * d + (
            (8 * k - 4) / ((2 * k + 1)) / lmax
        ) * (dinv * r)
        x = x + d
    return x


@partial(jax.jit, static_argnames=("iters",))
def estimate_lmax(A: EllMatrix, dinv, iters: int = 40, safety: float = 1.1):
    """Largest eigenvalue of D^{-1}A by power iteration (jitted, fixed trip
    count — runs at setup; BASELINE.json:10 Chebyshev needs the estimate)."""
    n = A.n_rows_pad
    i = jnp.arange(n, dtype=A.dtype)
    v = jnp.sin(i * 0.7511) + 0.01  # deterministic, non-degenerate start
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = dinv * spmv(A, v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * spmv(A, v)
    return safety * jnp.vdot(v, w) / jnp.vdot(v, v)


def greedy_coloring_host(indptr, indices, n) -> tuple:
    """Greedy graph coloring on host (setup-only; SURVEY.md §2b C15).

    Natural-order greedy gives exactly 2 colors (red-black) on bipartite
    stencil graphs.  Returns (color array, ncolors).  Dispatches to the
    native C++ kernel when available.
    """
    from raptor_tpu.utils.native import greedy_coloring_native

    out = greedy_coloring_native(indptr, indices, n)
    if out is not None:
        return out

    import numpy as np

    color = -np.ones(n, dtype=np.int32)
    for i in range(n):
        nbr = indices[indptr[i]: indptr[i + 1]]
        used = set(color[nbr[nbr < i]].tolist()) if nbr.size else set()
        c = 0
        while c in used:
            c += 1
        color[i] = c
    return color, int(color.max()) + 1
