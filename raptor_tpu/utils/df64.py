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

Caution: these identities require strict fp32 semantics, and FUSED
compilation is where they silently break (measured: a fused 81-slot
compensated residual lost 7 digits — 2.6e-8 max error vs 7.3e-15 for the
identical ops dispatched eagerly; root-caused by bisecting to a minimal
two_prod+two_sum fusion and reading the optimized HLO/IR).  Two distinct
backend rewrites were caught in the act:

1. fp contraction: when the ROUNDED product ``p = a*b`` flows into
   two_sum's subtractions inside one fusion, LLVM (XLA:CPU) contracts
   ``x - a*b`` into ``fma(-a, b, x)`` — the UNROUNDED product — voiding
   Knuth's identity at ~ulp(p).  Eager dispatch is immune only because p
   materializes between kernels.  ``lax.optimization_barrier`` does NOT
   survive the XLA:CPU pipeline (verified: absent from the optimized
   HLO), so every EFT seam value instead passes through ``_fence`` — a
   select on a data-dependent predicate (x == x, false only for NaN) that
   no pass can fold away and that breaks mul->add adjacency in the IR.
2. algebraic resimplification: with a CONSTANT operand, XLA rewrites
   ``(a + b) - a -> b`` (seen as ``subtract(%neg, %neg)`` in optimized
   HLO), zeroing the compensation.  Fencing ``s`` in two_sum hides the
   producer, killing the pattern.

The Veltkamp split uses integer bitmasking (exact, branch-free, cheaper
than the multiplicative ``4097*a`` split, and no float rewrite applies).
Verified against numpy fp64 in tests/unit/test_df64.py, including under
jit inside a deep fused chain with gathers (the shape that broke).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["two_sum", "two_prod", "df_add", "df_add_single", "df_neg",
           "df_from", "df_to_f32"]


def _fence(x):
    """Identity that compilers cannot see through: the predicate is
    data-dependent (false only for NaN), so the select survives every
    simplification pass, and it separates ``x``'s producer from its
    consumers so fp contraction cannot reach across (module docstring)."""
    return jnp.where(x == x, x, jnp.zeros_like(x))


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth)."""
    s = _fence(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


# numpy scalar (not jnp): stays a literal in the jaxpr, so Pallas kernel
# bodies can use _split without capturing a device constant
_HI_MASK = np.uint32(0xFFFFF000)  # sign + exp + high 11 explicit mantissa bits


def _split(a):
    """Bitmask split: a = hi + lo, each with <= 12 significand bits, so all
    cross products in two_prod are exact in fp32.  Integer masking instead
    of the multiplicative Veltkamp split — see module docstring."""
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.uint32) & _HI_MASK, jnp.float32)
    lo = a - hi  # exact: same exponent, low 12 mantissa bits
    return hi, lo


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker)."""
    p = _fence(a * b)
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
