import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.core.bell import (
    bell_from_bsr,
    bell_spmv,
    bell_to_bsr,
    block_diag_inv,
    block_jacobi,
)
from raptor_tpu.gallery import elasticity_3d


def test_bell_roundtrip_and_spmv():
    A, B, _ = elasticity_3d(4)
    E = bell_from_bsr(A, bs=3, dtype=np.float64)
    back = bell_to_bsr(E)
    assert np.allclose(back.toarray(), A.toarray())

    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[1])
    xp = np.zeros(E.nb_pad * 3)
    xp[: A.shape[1]] = x
    y = np.asarray(bell_spmv(E, jnp.asarray(xp)))
    assert np.allclose(y[: A.shape[0]], A @ x)


def test_block_jacobi_smooths():
    A, B, _ = elasticity_3d(4)
    E = bell_from_bsr(A, bs=3, dtype=np.float64)
    dinv = block_diag_inv(E)
    # identity padding blocks invert to identity
    nb = A.shape[0] // 3
    assert np.allclose(np.asarray(dinv)[nb:], np.eye(3))

    rng = np.random.default_rng(1)
    n = E.nb_pad * 3
    e = np.zeros(n)
    e[: A.shape[0]] = rng.standard_normal(A.shape[0])
    b = jnp.zeros(n, jnp.float64)
    e1 = np.asarray(block_jacobi(E, dinv, b, jnp.asarray(e), sweeps=3))
    x0, x1 = e[: A.shape[0]], e1[: A.shape[0]]
    rq = lambda v: (v @ (A @ v)) / (v @ v)
    assert np.linalg.norm(x1) < np.linalg.norm(x0)
    assert rq(x1) < 0.6 * rq(x0)  # high frequencies damped
