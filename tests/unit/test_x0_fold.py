"""Zero-initial-guess SpMV elision (the ``x0_zero`` fold).

XLA does not fold ``A @ zeros`` out of a compiled program, so every cycle's
pre-smooth (which always starts from x = 0) used to pay one full wasted
SpMV per level.  These tests lock the two properties of the fold:

* **near-bit-identity**: smoothing with ``x0_zero=True`` from x = 0 equals
  the unfolded program to a few ulps (``b - A@0 == b`` exactly in IEEE
  terms, but XLA may contract multiply-adds into FMAs differently in the
  two program shapes, so compiled outputs can differ at the last bit);
* **program shrinkage**: the folded trace has strictly fewer jaxpr
  equations (the elided SpMV really is gone, not just rearranged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.config import AmgConfig
from raptor_tpu.core.ell import ell_from_csr, pad_vector
from raptor_tpu.gallery import poisson_2d


def _ell_problem():
    a = poisson_2d(12)
    A = ell_from_csr(a, dtype=np.float32)
    rng = np.random.default_rng(3)
    b = pad_vector(rng.standard_normal(a.shape[0]).astype(np.float32),
                   A.n_rows_pad)
    dinv = pad_vector(
        (1.0 / a.diagonal()).astype(np.float32), A.n_rows_pad)
    return A, dinv, b


@pytest.mark.parametrize("name", ["jacobi", "mcgs", "tsgs", "cheb", "cheb4"])
def test_smoother_fold_bit_identical(name):
    from raptor_tpu.solve import smoothers as sm

    A, dinv, b = _ell_problem()
    x0 = jnp.zeros_like(b)
    if name == "jacobi":
        f = lambda z: sm.jacobi(A, dinv, b, x0, sweeps=2, x0_zero=z)
    elif name == "mcgs":
        color = jnp.asarray(
            (np.arange(A.n_rows_pad) // 12 + np.arange(A.n_rows_pad)) % 2,
            jnp.int32)
        f = lambda z: sm.multicolor_gs(A, dinv, b, x0, color, ncolors=2,
                                       sweeps=2, x0_zero=z)
    elif name == "tsgs":
        f = lambda z: sm.two_stage_gs(A, dinv, b, x0, sweeps=2, inner=2,
                                      x0_zero=z)
    elif name == "cheb":
        f = lambda z: sm.chebyshev(A, dinv, b, x0, 0.1, 1.9, degree=3,
                                   x0_zero=z)
    else:
        f = lambda z: sm.chebyshev4(A, dinv, b, x0, jnp.float32(1.9),
                                    degree=3, x0_zero=z)
    ref = np.asarray(f(False))
    out = np.asarray(f(True))
    tol = 8 * np.finfo(np.float32).eps * max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - out).max() <= tol, np.abs(ref - out).max()


def test_structured_fold_bit_identical_and_smaller():
    from raptor_tpu.structured import dia_from_stencil
    from raptor_tpu.structured.solver import SLevel, _parity, _smooth

    st = np.zeros((3, 3))
    st[1, 1] = 4.0
    st[0, 1] = st[2, 1] = st[1, 0] = st[1, 2] = -1.0
    dims = (16, 16)
    A = dia_from_stencil(st, dims, dtype=jnp.float32)
    dinv = 1.0 / A.diagonal()
    lev = SLevel(A=A, Pt=None, Rt=None, dinv=dinv,
                 red=_parity(dims) == 0, cheb_lmax=jnp.float32(1.9),
                 dims=dims, cdim=-1)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(A.n).astype(np.float32))
    x0 = jnp.zeros_like(b)
    for name in ["jacobi", "mcgs", "tsgs", "cheb4", "chebyshev"]:
        cfg = AmgConfig(smoother=name)
        ref = np.asarray(_smooth(lev, cfg, b, x0, backward=False))
        out = np.asarray(_smooth(lev, cfg, b, x0, backward=False,
                                 x0_zero=True))
        tol = 8 * np.finfo(np.float32).eps * max(np.abs(ref).max(), 1.0)
        assert np.abs(ref - out).max() <= tol, (name,
                                                np.abs(ref - out).max())
        # the elided SpMV is really gone from the trace
        n_ref = len(jax.make_jaxpr(
            lambda b: _smooth(lev, cfg, b, jnp.zeros_like(b), False)
        )(b).eqns)
        n_fold = len(jax.make_jaxpr(
            lambda b: _smooth(lev, cfg, b, jnp.zeros_like(b), False,
                              x0_zero=True)
        )(b).eqns)
        assert n_fold < n_ref, (name, n_fold, n_ref)
