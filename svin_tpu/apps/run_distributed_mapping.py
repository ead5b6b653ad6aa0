"""Multi-host cooperative mapping — the composed distributed flow.

The reference's two-process topology (okvis_node → ROS topics →
pose_graph_node, ``Publisher.cpp:115-271`` / ``Subscriber.cpp:116-193``)
generalizes here to N mapping hosts (SURVEY §5 "Distributed communication
backend"): each process runs its own session intake, exchanges keyframe
payloads over DCN, associates shared landmarks by descriptor matching,
merges the sessions, and solves the JOINT bundle adjustment sharded over
the global process mesh (compute on every device of every process; the
per-CG-iteration collective is one (K,6) psum riding ICI within a host and
DCN across hosts).

Chain (each step is the exported API the driver's dryrun also exercises):
  initialize_distributed → make_process_mesh → per-process session intake
  → pack_keyframe/exchange_keyframe_payloads → descriptor association →
  exchange_shared_pairs → exchange_session_problems → merge_sessions →
  bucket_problem → make_sharded_ba_pcg solve → per-session trajectories.

Single-process it degrades to N=1 gracefully (every exchange returns the
local payloads), so ``python -m svin_tpu.apps.run_distributed_mapping``
runs anywhere; under ``jax.distributed`` (env
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID) it is a true
multi-host program — validated by the 2-process CPU harness in
``tests/test_runtime.py``.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


def build_session(
    rank: int, K: int = 12, L_window: int = 64, world_L: int = 160,
    seed: int = 7, drift_step: float = 0.25,
):
    """One synthetic mapping session over a SHARED world.

    All ranks share one landmark world (same seed) with one binary
    descriptor per world landmark; session ``rank`` observes a sliding
    window of that world (50% overlap with its neighbours) from a
    trajectory segment, with the whole session offset by an inter-session
    drift (rank > 0) that the joint solve must remove. Returns
    (GlobalMapProblem in LOCAL landmark indices, (L_window, 8) uint32
    descriptors, world landmark index per local landmark, drift offset).
    """
    import jax
    import jax.numpy as jnp

    from .. import sim
    from ..cameras import project
    from ..estimator.rig import rig_params
    from ..kinematics import compose, from_rq, inverse, transform_point
    from ..parallel import GlobalMapProblem
    from ..problems import euroc_like_rig

    rig = euroc_like_rig()
    rig_p = rig_params(rig, jnp.float32)
    C = rig.num_cameras
    world_lms = np.asarray(
        sim.landmark_grid(
            jax.random.PRNGKey(seed), world_L,
            jnp.array([0.5, 0.5, 5.0]), jnp.array([10.0, 10.0, 4.0]),
        )
    )
    world_desc = np.random.RandomState(seed).randint(
        0, 2**32, size=(world_L, 8)
    ).astype(np.uint32)

    lo = (rank * (L_window // 2)) % max(world_L - L_window, 1)
    sel = np.arange(lo, lo + L_window)
    drift = np.array([0.3, -0.2, 0.15]) * drift_step * rank

    traj = sim.default_trajectory()
    times = np.arange(K) * 0.3 + 0.2 + 0.15 * rank
    poses = [sim.pose(traj, float(t)) for t in times]
    pose_r = np.stack([np.asarray(T.r) for T in poses]) + drift
    pose_q = np.stack([np.asarray(T.q) for T in poses])
    lms = world_lms[sel] + drift

    obs = []
    for pi, T in enumerate(poses):
        T_shift = from_rq(jnp.asarray(pose_r[pi]), jnp.asarray(pose_q[pi]))
        for ci in range(C):
            T_WC = compose(
                T_shift,
                from_rq(rig_p.T_SC_r[ci], rig_p.T_SC_q[ci]),
            )
            p_C = np.asarray(
                transform_point(inverse(T_WC), jnp.asarray(lms))
            )
            uv, ok = jax.device_get(
                project(rig.cameras[ci], jnp.asarray(p_C))
            )
            for l in np.nonzero(np.asarray(ok) & (p_C[:, 2] > 0.5))[0]:
                obs.append((pi, int(l), ci, np.asarray(uv[l])))
    O = len(obs)
    prob = GlobalMapProblem(
        pose_r=jnp.asarray(pose_r, jnp.float32),
        pose_q=jnp.asarray(pose_q, jnp.float32),
        pose_fixed=jnp.arange(K) < 2,
        lm=jnp.asarray(lms, jnp.float32),
        lm_valid=jnp.ones(L_window, bool),
        obs_uv=jnp.asarray(np.stack([o[3] for o in obs]), jnp.float32),
        obs_pose=jnp.asarray([o[0] for o in obs], jnp.int32),
        obs_lm=jnp.asarray([o[1] for o in obs], jnp.int32),
        obs_cam=jnp.asarray([o[2] for o in obs], jnp.int32),
        obs_valid=jnp.ones(O, bool),
    ), rig_p
    return prob[0], prob[1], world_desc[sel], sel, drift


def _pad_obs(prob, O_cap: int):
    """Pad a session's observation axis to a fixed O_cap (exchange needs
    equal shapes across processes)."""
    import jax.numpy as jnp

    O = prob.obs_uv.shape[0]
    if O == O_cap:
        return prob
    assert O < O_cap, (O, O_cap)
    pad = O_cap - O
    return prob._replace(
        obs_uv=jnp.concatenate([prob.obs_uv, jnp.zeros((pad, 2), prob.obs_uv.dtype)]),
        obs_pose=jnp.concatenate([prob.obs_pose, jnp.zeros(pad, jnp.int32)]),
        obs_lm=jnp.concatenate([prob.obs_lm, jnp.zeros(pad, jnp.int32)]),
        obs_cam=jnp.concatenate([prob.obs_cam, jnp.zeros(pad, jnp.int32)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(pad, bool)]),
    )


def run(
    out_dir: Optional[str] = None,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    K: int = 12,
    L_window: int = 64,
    iters: int = 12,
    cg_iters: int = 48,
) -> dict:
    """Execute the full cooperative-mapping chain; returns a summary dict
    (and writes per-session TUM trajectories + summary.json under
    ``out_dir`` if given)."""
    import jax
    import jax.numpy as jnp

    from ..ops import hamming
    from ..parallel import (
        bucket_problem,
        exchange_keyframe_payloads,
        exchange_session_problems,
        exchange_shared_pairs,
        initialize_distributed,
        make_process_mesh,
        make_sharded_ba_pcg,
        merge_sessions,
        pack_keyframe,
    )

    rank, nproc = initialize_distributed(coordinator, num_processes, process_id)
    mesh = make_process_mesh()
    n_dev = len(mesh.devices.ravel())

    # ---- per-process session intake ----
    prob, rig_p, lm_desc, sel_world, drift = build_session(
        rank, K=K, L_window=L_window
    )

    # ---- keyframe payload exchange (DCN keyframe-topic analog) ----
    cap = L_window
    exports = [
        {
            "kf_index": rank * K + pi,
            "timestamp": float(pi),
            "T_WC_r": np.asarray(prob.pose_r[pi]),
            "T_WC_q": np.asarray(prob.pose_q[pi]),
            "points_W": np.asarray(prob.lm),
            "descriptors": lm_desc,
            "landmark_ids": np.arange(L_window),
        }
        for pi in range(min(2, K))
    ]
    payloads = exchange_keyframe_payloads(
        [pack_keyframe(e, cap) for e in exports], cap=cap, max_per_round=2
    )

    # ---- cross-session landmark association by descriptor matching ----
    pairs = []
    my_desc = jnp.asarray(lm_desc)
    my_valid = jnp.ones(L_window, bool)
    for p in payloads:
        src = int(p["kf_index"]) // K
        if src == rank:
            continue
        res = hamming.match_descriptors_jit(
            my_desc, jnp.asarray(p["descriptors"]),
            my_valid, jnp.asarray(p["point_valid"]),
            max_distance=10, mutual=True,
        )
        m, idx_b = jax.device_get((res.valid, res.idx_b))
        for la in np.nonzero(m)[0]:
            lb = int(p["landmark_ids"][idx_b[la]])
            if lb < 0:
                continue
            sa, sb = sorted((rank, src))
            pa, pb = (int(la), lb) if sa == rank else (lb, int(la))
            pairs.append((sa, pa, sb, pb))
    shared_rows = exchange_shared_pairs(
        np.asarray(sorted(set(pairs)), np.int64).reshape(-1, 4),
        max_per_round=4 * L_window,
    )
    shared = [tuple(int(x) for x in row) for row in shared_rows]
    shared = sorted(set(shared))

    # ---- session-problem exchange + merge ----
    O_cap = 4 * K * L_window
    sessions = exchange_session_problems(_pad_obs(prob, O_cap))
    merged, pose_maps, lm_maps = merge_sessions(sessions, shared, anchor=0)

    # ---- joint solve sharded over the process mesh ----
    bprob = bucket_problem(merged)
    Km, Lm = merged.pose_r.shape[0], bprob.lm.shape[0]
    if Lm % n_dev != 0:
        # pad landmark axis to the mesh (invalid slots are inert)
        pad = n_dev - Lm % n_dev
        bprob = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
            )
            if a.ndim >= 1 and a.shape[0] == Lm
            else a,
            bprob,
        )
        Lm += pad
    step, shardings = make_sharded_ba_pcg(
        mesh, rig_p, Km, Lm, iters=iters, cg_iters=cg_iters
    )
    out, cost = step(jax.device_put(bprob, shardings))
    out_r = np.asarray(jax.device_get(out.pose_r))

    # drift removed: my session's poses land on the anchor's (un-drifted)
    # trajectory
    my_rows = pose_maps[rank]
    residual_drift = float(
        np.median(
            np.linalg.norm(
                out_r[my_rows] - (np.asarray(prob.pose_r) - drift), axis=1
            )
        )
    )
    summary = {
        "rank": rank,
        "num_processes": nproc,
        "devices": n_dev,
        "merged_poses": int(Km),
        "merged_landmarks": int(Lm),
        "shared_pairs": len(shared),
        "joint_cost": float(cost),
        "residual_drift_m": residual_drift,
        "injected_drift_m": float(np.linalg.norm(drift)),
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(
            os.path.join(out_dir, f"session_{rank}.txt"), "w"
        ) as f:
            for k_, row in enumerate(my_rows):
                p_ = out_r[row]
                f.write(f"{k_:.6f} {p_[0]:.6f} {p_[1]:.6f} {p_[2]:.6f} "
                        f"0 0 0 1\n")
        with open(os.path.join(out_dir, f"summary_{rank}.json"), "w") as f:
            json.dump(summary, f, indent=1)
    return summary


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir", nargs="?", default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)
    summary = run(
        out_dir=args.out_dir, coordinator=args.coordinator,
        num_processes=args.num_processes, process_id=args.process_id,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
