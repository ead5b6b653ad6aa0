"""Multi-host runtime scaffolding: process bootstrap, process-spanning
meshes, and the host-to-host keyframe/loop-edge exchange.

The reference's two processes talk over ROS 2 DDS topics with one
well-defined payload (the keyframe export of ``ThreadedKFVio.cpp:1147-1247``
consumed by ``pose_graph/Subscriber.cpp:116-193``). In the TPU-native
multi-host build that contract becomes:

- ``initialize_distributed`` — ``jax.distributed.initialize`` bootstrap
  (coordinator/rank from args or the standard env vars), idempotent.
- ``make_process_mesh`` — one named mesh over ALL processes' devices; the
  sharded solvers of ``dist_ba``/``pcg`` run on it unchanged (their
  collectives ride ICI within a host and DCN across hosts — XLA picks the
  transport per mesh axis).
- ``exchange_keyframe_payloads`` / ``exchange_loop_edges`` — all-gather of
  per-host packed arrays over DCN (``multihost_utils.process_allgather``),
  replacing the ROS topic stream. Single-process (the test/dev topology)
  degrades to identity, so the same pipeline code runs everywhere.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Bootstrap the JAX distributed runtime (idempotent).

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``);
    with none present this is a no-op single-process topology. Returns
    ``(process_id, num_processes)`` as seen by JAX afterwards."""
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1
    )
    if coord and nproc > 1 and pid >= 0:
        # NOTE: must run before anything touches the XLA backend
        # (jax.devices()/process_count() would lock in single-process);
        # a second call is tolerated for idempotency.
        try:
            jax.distributed.initialize(
                coordinator_address=coord, num_processes=nproc,
                process_id=pid,
            )
        except RuntimeError as e:  # already initialized → idempotent
            if "already" not in str(e) and "once" not in str(e):
                raise
    return jax.process_index(), jax.process_count()


def make_process_mesh(axis: str = "data") -> Mesh:
    """One 1-D mesh over every device of every process (the global device
    order), for the landmark/edge-sharded global solvers."""
    return Mesh(np.asarray(jax.devices()), (axis,))


# ------------------------------------------------ keyframe/loop exchange
# Packed keyframe payload schema — the array form of the reference's
# keyframe topic tuple (image omitted: place recognition across hosts works
# on descriptors; images stay host-local exactly like the reference's
# raw-image buffer stays inside pose_graph_node).

KEYFRAME_FIELDS = (
    ("kf_index", np.int32, ()),  # global keyframe id
    ("timestamp", np.float64, ()),
    ("T_WC_r", np.float64, (3,)),
    ("T_WC_q", np.float64, (4,)),
    ("points_W", np.float32, (-1, 3)),  # padded landmark positions
    ("point_valid", np.bool_, (-1,)),
    ("descriptors", np.uint32, (-1, 8)),
    ("landmark_ids", np.int64, (-1,)),  # sender-local landmark ids
    # (the reference's per-point lmId channel, ThreadedKFVio.cpp:1147+ —
    # what cross-session association resolves back to the sender's map)
)


def pack_keyframe(export: Dict, cap: int) -> Dict[str, np.ndarray]:
    """Keyframe-export dict → fixed-shape arrays (cap landmark slots)."""
    n = min(len(export["points_W"]), cap)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = np.asarray(export["points_W"])[:n]
    ok = np.zeros(cap, bool)
    ok[:n] = True
    desc = np.zeros((cap, 8), np.uint32)
    d = export.get("descriptors")
    if d is not None:
        m = min(len(d), cap)
        desc[:m] = np.asarray(d)[:m]
    lm_ids = np.full(cap, -1, np.int64)
    li = export.get("landmark_ids")
    if li is not None:
        m = min(len(li), cap)
        lm_ids[:m] = np.asarray(li)[:m]
    return {
        "kf_index": np.int32(export["kf_index"]),
        "timestamp": np.float64(export["timestamp"]),
        "T_WC_r": np.asarray(export["T_WC_r"], np.float64),
        "T_WC_q": np.asarray(export["T_WC_q"], np.float64),
        "points_W": pts,
        "point_valid": ok,
        "descriptors": desc,
        "landmark_ids": lm_ids,
    }


def _allgather_tree(tree):
    """All-gather a pytree of equal-shape host arrays across processes
    (leading axis = process). Single-process returns [local]."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(jnp.asarray(x))),
        tree,
    )


def exchange_keyframe_payloads(
    local: List[Dict[str, np.ndarray]], cap: int = 512,
    max_per_round: int = 4,
) -> List[Dict[str, np.ndarray]]:
    """Exchange each host's newest packed keyframes with every other host
    (the DCN replacement for the reference's keyframe topic). Every process
    MUST call this collectively with the same ``cap``/``max_per_round``.
    Returns the flat list of every process's payloads (including local),
    invalid slots dropped."""
    batch = {
        "kf_index": np.full(max_per_round, -1, np.int32),
        "timestamp": np.zeros(max_per_round, np.float64),
        "T_WC_r": np.zeros((max_per_round, 3), np.float64),
        "T_WC_q": np.zeros((max_per_round, 4), np.float64),
        "points_W": np.zeros((max_per_round, cap, 3), np.float32),
        "point_valid": np.zeros((max_per_round, cap), bool),
        "descriptors": np.zeros((max_per_round, cap, 8), np.uint32),
        "landmark_ids": np.full((max_per_round, cap), -1, np.int64),
    }
    for i, kf in enumerate(local[:max_per_round]):
        for k in batch:
            batch[k][i] = kf[k]
    gathered = _allgather_tree(batch)  # leading axis = process
    out: List[Dict[str, np.ndarray]] = []
    P = gathered["kf_index"].shape[0]
    for p in range(P):
        for i in range(max_per_round):
            if int(gathered["kf_index"][p, i]) < 0:
                continue
            out.append({k: gathered[k][p, i] for k in gathered})
    return out


def exchange_session_problems(prob) -> list:
    """All-gather each process's session ``GlobalMapProblem`` (equal
    shapes required across processes — pad sessions to a common K/L/O
    first). Returns the per-process list in process order, the input for
    ``merge_sessions``. Collective. This is the DCN bulk-map exchange of
    the cooperative-mapping flow; the solve that follows runs sharded over
    the PROCESS mesh, so compute distributes even though each host holds
    the merged problem's host copy."""
    from .dist_ba import GlobalMapProblem

    gathered = _allgather_tree(dict(prob._asdict()))
    P = gathered["pose_r"].shape[0]
    return [
        GlobalMapProblem(**{k: gathered[k][p] for k in gathered})
        for p in range(P)
    ]


def exchange_shared_pairs(
    local_pairs: np.ndarray, max_per_round: int = 256
) -> np.ndarray:
    """Exchange cross-session landmark associations (rows
    ``[session_a, lm_a, session_b, lm_b]``; the merge_sessions ``shared``
    input) across hosts; rows with session_a < 0 are padding.
    Collective."""
    batch = np.full((max_per_round, 4), -1, np.int64)
    n = min(len(local_pairs), max_per_round)
    if n:
        batch[:n] = np.asarray(local_pairs, np.int64)[:n]
    gathered = _allgather_tree(batch).reshape(-1, 4)
    return gathered[gathered[:, 0] >= 0]


def exchange_loop_edges(
    local_edges: np.ndarray, max_per_round: int = 16
) -> np.ndarray:
    """Exchange loop edges (rows ``[i, j, t_ij(3), yaw_ij, weight]``) across
    hosts; returns the concatenated global edge set. Rows with i < 0 are
    padding. Collective — every process must call with the same
    ``max_per_round``."""
    W = 7
    batch = np.full((max_per_round, W), -1.0, np.float64)
    n = min(len(local_edges), max_per_round)
    if n:
        batch[:n] = np.asarray(local_edges, np.float64)[:n]
    gathered = _allgather_tree(batch)  # (P, max, W)
    flat = gathered.reshape(-1, W)
    return flat[flat[:, 0] >= 0]
