"""Double-float32 ("df64") compensated arithmetic for on-device residuals.

TPU fp64 is software-emulated and slow; host-side fp64 refinement costs a
round trip per outer iteration.  Instead, error-free transformations
(Knuth two-sum, Dekker/Veltkamp two-product) represent values as unevaluated
fp32 pairs (hi, lo) with an effective ~48-bit mantissa (~1e-14 relative) —
ample to certify 1e-8 residuals, at pure-fp32 vector-op speed (the residual
is bandwidth-bound, so the ~4x flop overhead is free).

Used by raptor_tpu.structured.solver.structured_solve_refined: the whole
mixed-precision iterative refinement (fp32 inner AMG-PCG + df64 outer
residual) runs as ONE jitted program with zero host round-trips
(BASELINE.json:5), replacing the host-scipy refinement loop.

Caution: these identities require strict fp32 semantics.  XLA on TPU keeps
f32 arithmetic exact (no fma contraction across these ops after the
explicit splits); correctness is verified against numpy fp64 in
tests/unit/test_df64.py, including under jit on the CI backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "df_add", "df_add_single", "df_neg",
           "df_from", "df_to_f32"]

_SPLITTER = jnp.float32(4097.0)  # 2^12 + 1 for fp32 (24-bit mantissa)


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi having ~12 mantissa bits."""
    c = _SPLITTER * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl) -> normalized df64 pair."""
    sh, se = two_sum(xh, yh)
    te = se + (xl + yl)
    rh, rl = two_sum(sh, te)
    return rh, rl


def df_add_single(xh, xl, y):
    """(xh,xl) + fp32 y."""
    sh, se = two_sum(xh, y)
    rh, rl = two_sum(sh, se + xl)
    return rh, rl


def df_neg(xh, xl):
    return -xh, -xl


def df_from(x):
    return x, jnp.zeros_like(x)


def df_to_f32(xh, xl):
    return xh + xl
