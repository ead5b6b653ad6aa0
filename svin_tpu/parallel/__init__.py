from .dist_ba import (
    GlobalMapProblem,
    ba_solve_local,
    make_sharded_ba,
    partition_problem,
)

__all__ = [
    "GlobalMapProblem",
    "ba_solve_local",
    "make_sharded_ba",
    "partition_problem",
]
