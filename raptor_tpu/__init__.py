"""raptor_tpu — a TPU-native parallel algebraic multigrid framework.

Built from scratch in JAX/Pallas to reproduce the capability surface of the
RAPtor parallel-AMG stack (see SURVEY.md and BASELINE.json:5): padded-ELL /
blocked-ELL sparse layouts, Pallas/XLA SpMV and gather/segment-sum SpGEMM,
classical (RS/PMIS/CLJP) and smoothed-aggregation setup under jit,
weighted-Jacobi / multicolor-GS / Chebyshev smoothers, preconditioned CG /
BiCGStab / restarted (F)GMRES with no host round-trips per iteration, and
distributed hierarchies sharded over a TPU mesh with ppermute halo exchange.
"""

__version__ = "0.1.0"

from raptor_tpu.core import EllMatrix, ell_from_csr, ell_to_csr
from raptor_tpu.core.bell import BlockEllMatrix, bell_spmv
from raptor_tpu.core.hybrid import (
    BandedMatrix,
    HybridMatrix,
    banded_from_csr,
    banded_spmv,
    hybrid_from_ell,
    hybrid_spmv,
)
from raptor_tpu.ops import spmv, spgemm, rap, ell_transpose
from raptor_tpu.config import AmgConfig, SolveConfig, PRESETS
from raptor_tpu.api import setup, solve, solve_hier
from raptor_tpu.utils.io import (
    read_matrix,
    read_vector,
    write_matrix,
    write_vector,
)
