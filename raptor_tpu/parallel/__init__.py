from raptor_tpu.parallel.partition import (
    HaloPlan,
    DistMatrix,
    distribute_matrix,
    repartition_pad,
)
from raptor_tpu.parallel.halo import halo_exchange, dist_spmv, psum_dot
from raptor_tpu.parallel.dist import (
    DistLevel,
    DistHierarchy,
    distribute_hierarchy,
    dist_solve,
    make_solve_mesh,
)
from raptor_tpu.parallel.dist_sa import dist_build_sa_hierarchy
from raptor_tpu.parallel.dist_setup import dist_build_hierarchy
from raptor_tpu.parallel.dist_taps import (
    TapsDistHierarchy,
    distribute_hierarchy_taps,
    dist_solve_taps,
    make_taps_mesh,
)

__all__ = [
    "dist_build_hierarchy",
    "dist_build_sa_hierarchy",
    "TapsDistHierarchy",
    "distribute_hierarchy_taps",
    "dist_solve_taps",
    "make_taps_mesh",
    "HaloPlan",
    "DistMatrix",
    "distribute_matrix",
    "repartition_pad",
    "halo_exchange",
    "dist_spmv",
    "psum_dot",
    "DistLevel",
    "DistHierarchy",
    "distribute_hierarchy",
    "dist_solve",
    "make_solve_mesh",
]
