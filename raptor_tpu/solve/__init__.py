from raptor_tpu.solve.smoothers import (
    jacobi,
    multicolor_gs,
    chebyshev,
    estimate_lmax,
)
from raptor_tpu.solve.cycle import cycle, make_preconditioner
from raptor_tpu.solve.krylov import pcg, bicgstab, KrylovInfo

__all__ = [
    "jacobi",
    "multicolor_gs",
    "chebyshev",
    "estimate_lmax",
    "cycle",
    "make_preconditioner",
    "pcg",
    "bicgstab",
    "KrylovInfo",
]
