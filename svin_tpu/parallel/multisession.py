"""Multi-session joint mapping: merge sessions into one sharded BA problem.

The BASELINE "Cave+Bus joint mapping" capability: each session contributes
poses + landmarks + observations in its own drift frame; cross-session
landmark correspondences (from place recognition) identify shared landmarks;
the merged problem — anchor session fixed, other sessions free — is solved
by the distributed Schur BA, which simultaneously aligns the sessions and
refines the joint map.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .dist_ba import GlobalMapProblem


def merge_sessions(
    sessions: List[GlobalMapProblem],
    shared: List[Tuple[int, int, int, int]],
    anchor: int = 0,
) -> Tuple[GlobalMapProblem, List[np.ndarray], List[np.ndarray]]:
    """Concatenate sessions into one problem.

    ``shared``: (session_a, lm_a, session_b, lm_b) — landmark ``lm_b`` of
    session_b is the same physical point as ``lm_a`` of session_a;
    session_b's observations are rewired onto session_a's landmark (union-
    find over pairs). Only the anchor session's gauge poses stay fixed.

    Returns (problem, pose_maps, lm_maps): per-session index maps into the
    merged problem.
    """
    n_poses = [int(s.pose_r.shape[0]) for s in sessions]
    n_lms = [int(s.lm.shape[0]) for s in sessions]
    pose_off = np.cumsum([0] + n_poses)[:-1]
    lm_off = np.cumsum([0] + n_lms)[:-1]
    L_tot = int(sum(n_lms))

    # union-find for shared landmarks (global index space)
    parent = np.arange(L_tot)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for sa, la, sb, lb in shared:
        a = find(lm_off[sa] + la)
        b = find(lm_off[sb] + lb)
        # root toward the anchor session's copy (its position wins)
        if b < a:
            a, b = b, a
        parent[b] = a

    lm_root = np.array([find(k) for k in range(L_tot)])

    pose_r = np.concatenate([np.asarray(s.pose_r) for s in sessions])
    pose_q = np.concatenate([np.asarray(s.pose_q) for s in sessions])
    fixed = np.concatenate(
        [
            np.asarray(s.pose_fixed) if i == anchor else np.zeros(n_poses[i], bool)
            for i, s in enumerate(sessions)
        ]
    )
    lm = np.concatenate([np.asarray(s.lm) for s in sessions])
    lm_valid = np.concatenate([np.asarray(s.lm_valid) for s in sessions])
    # merged landmarks: only roots stay valid; positions from the root copy
    lm_valid = lm_valid & (lm_root == np.arange(L_tot))

    obs_uv = np.concatenate([np.asarray(s.obs_uv) for s in sessions])
    obs_pose = np.concatenate(
        [np.asarray(s.obs_pose) + pose_off[i] for i, s in enumerate(sessions)]
    )
    obs_lm_raw = np.concatenate(
        [np.asarray(s.obs_lm) + lm_off[i] for i, s in enumerate(sessions)]
    )
    obs_lm = lm_root[obs_lm_raw]
    obs_cam = np.concatenate([np.asarray(s.obs_cam) for s in sessions])
    obs_valid = np.concatenate([np.asarray(s.obs_valid) for s in sessions])

    prob = GlobalMapProblem(
        pose_r=jnp.asarray(pose_r),
        pose_q=jnp.asarray(pose_q),
        pose_fixed=jnp.asarray(fixed),
        lm=jnp.asarray(lm),
        lm_valid=jnp.asarray(lm_valid),
        obs_uv=jnp.asarray(obs_uv),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_valid=jnp.asarray(obs_valid),
    )
    pose_maps = [pose_off[i] + np.arange(n_poses[i]) for i in range(len(sessions))]
    lm_maps = [lm_root[lm_off[i] + np.arange(n_lms[i])] for i in range(len(sessions))]
    return prob, pose_maps, lm_maps
