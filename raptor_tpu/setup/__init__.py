from raptor_tpu.setup.strength import strength_mask, strong_transpose_counts
from raptor_tpu.setup.splitting import (
    pmis_splitting,
    rs_splitting_host,
    make_perm,
    C_PT,
    F_PT,
    UNDECIDED,
)
from raptor_tpu.setup.interp import direct_interpolation, classical_interpolation, tighten_coarse_space
from raptor_tpu.setup.hierarchy import (
    Level,
    Hierarchy,
    build_hierarchy,
    hierarchy_stats,
)

__all__ = [
    "strength_mask",
    "strong_transpose_counts",
    "pmis_splitting",
    "rs_splitting_host",
    "make_perm",
    "C_PT",
    "F_PT",
    "UNDECIDED",
    "direct_interpolation",
    "classical_interpolation",
    "tighten_coarse_space",
    "Level",
    "Hierarchy",
    "build_hierarchy",
    "hierarchy_stats",
]
