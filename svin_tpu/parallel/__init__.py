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
from .pcg import (
    ba_solve_pcg,
    make_sharded_ba_pcg,
    make_sharded_posegraph_pcg,
    optimize_4dof_pcg,
    pose_major_index,
    sharded_pose_major_index,
)
from .tracks import (
    TrackMeta,
    TrackProblem,
    ba_solve_tracks,
    make_sharded_ba_tracks,
    tracks_from_problem,
)
from .runtime import (
    exchange_keyframe_payloads,
    exchange_loop_edges,
    initialize_distributed,
    make_process_mesh,
    pack_keyframe,
)

__all__ = [
    "BucketedProblem",
    "GlobalMapProblem",
    "TrackMeta",
    "TrackProblem",
    "ba_solve_tracks",
    "make_sharded_ba_tracks",
    "tracks_from_problem",
    "ba_solve_bucketed",
    "ba_solve_local",
    "ba_solve_pcg",
    "bucket_problem",
    "make_sharded_ba",
    "make_sharded_ba_bucketed",
    "make_sharded_ba_pcg",
    "make_sharded_posegraph",
    "make_sharded_posegraph_pcg",
    "merge_sessions",
    "exchange_keyframe_payloads",
    "exchange_loop_edges",
    "initialize_distributed",
    "make_process_mesh",
    "optimize_4dof_pcg",
    "pack_keyframe",
    "pad_edges_for_mesh",
    "pose_major_index",
    "sharded_pose_major_index",
    "partition_problem",
]
