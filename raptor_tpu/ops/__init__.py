from raptor_tpu.ops.sparse_ops import (
    spmv,
    spmv_t,
    ell_transpose,
    ell_transpose_fixed,
    spgemm,
    spgemm_fixed,
    ell_add,
    ell_add_fixed,
    ell_filter,
    rap,
)

__all__ = [
    "spmv",
    "spmv_t",
    "ell_transpose",
    "ell_transpose_fixed",
    "spgemm",
    "spgemm_fixed",
    "ell_add",
    "ell_add_fixed",
    "ell_filter",
    "rap",
]
