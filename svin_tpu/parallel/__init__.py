from .dist_ba import (
    GlobalMapProblem,
    ba_solve_local,
    make_sharded_ba,
    partition_problem,
)
from .dist_posegraph import make_sharded_posegraph, pad_edges_for_mesh
from .multisession import merge_sessions

__all__ = [
    "GlobalMapProblem",
    "ba_solve_local",
    "make_sharded_ba",
    "make_sharded_posegraph",
    "merge_sessions",
    "pad_edges_for_mesh",
    "partition_problem",
]
