from .dist_ba import (
    BucketedProblem,
    GlobalMapProblem,
    ba_solve_bucketed,
    ba_solve_local,
    bucket_problem,
    make_sharded_ba,
    make_sharded_ba_bucketed,
    partition_problem,
)
from .dist_posegraph import make_sharded_posegraph, pad_edges_for_mesh
from .multisession import merge_sessions

__all__ = [
    "BucketedProblem",
    "GlobalMapProblem",
    "ba_solve_bucketed",
    "ba_solve_local",
    "bucket_problem",
    "make_sharded_ba",
    "make_sharded_ba_bucketed",
    "make_sharded_posegraph",
    "merge_sessions",
    "pad_edges_for_mesh",
    "partition_problem",
]
