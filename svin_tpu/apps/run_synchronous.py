"""Offline synchronous runner — the ``okvis_app_synchronous`` analog.

Usage:
  python -m svin_tpu.apps.run_synchronous <config.yaml> <dataset_dir> [out_dir]
  python -m svin_tpu.apps.run_synchronous <config.yaml> <rosbag2_dir> [out_dir]
  python -m svin_tpu.apps.run_synchronous <config.yaml> --synthetic [out_dir]

Reads a reference-format rig config (``config_fpga_p2_euroc.yaml`` /
``config_stereorig_v2.yaml`` load unchanged), streams an EuRoC-format folder,
a rosbag2 directory/.db3 file (the ``okvis_node_synchronous`` analog; topics
default to the reference's hard-coded ``/cam{i}/image_raw`` + ``/imu`` and
can be overridden with SVIN_CAM_TOPICS / SVIN_IMU_TOPIC / SVIN_DEPTH_TOPIC /
SVIN_SONAR_TOPIC), or a synthetic rendered sequence through the
deterministic blocking-mode pipeline with the loop closer attached, and
writes TUM trajectories, CSV state/landmark logs, and a global-map PLY
(reference: ``okvis_apps/src/okvis_app_synchronous.cpp:185-356`` +
pose_graph outputs).

``--save-checkpoint <prefix>`` persists the engine window + pose graph +
BoW database after the run; ``--resume <prefix>`` restores them before it
(the resumed run starts a NEW sequence, so the pose graph re-anchors via
its cross-sequence loop machinery instead of chaining a VIO relative
across the discontinuity) — checkpoint/resume is a capability the
reference lacks (SURVEY §5).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # optional checkpoint flags (resume a prior session / persist this one)
    resume_prefix = None
    checkpoint_prefix = None
    pos = []
    it = iter(argv)
    for a in it:
        if a == "--resume":
            resume_prefix = next(it)
        elif a == "--save-checkpoint":
            checkpoint_prefix = next(it)
        else:
            pos.append(a)
    argv = pos
    if len(argv) < 2:
        print(__doc__)
        return 2
    config_path, data = argv[0], argv[1]
    out_dir = argv[2] if len(argv) > 2 else None
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    import jax

    if os.environ.get("SVIN_COMPCACHE"):
        # persistent compile cache (safe on TPU; the CPU cache-read path
        # segfaults on this jaxlib — see tests/conftest.py)
        cache = os.path.expanduser("~/.cache/jax_compcache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() == "cpu" and not os.environ.get("SVIN_F32"):
        # f64 normal equations when the backend supports it (SVIN_F32=1
        # forces the shipped TPU precision for accuracy A/B runs —
        # tools/accuracy_f32.py)
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ..kinematics import Transformation
    from ..loopclosure import GlobalMap, LoopCloser, save_frustums_ply
    from ..pipeline import (
        VioEngine,
        events_from_source,
        load_config,
        run_events,
    )
    from ..pipeline.outputs import (
        CsvLandmarkWriter,
        CsvStateWriter,
        TopDownViewer,
    )
    from ..utils import Timing

    cfg = load_config(config_path)
    # output_params.output_dir is the default when no CLI out_dir is given
    # (reference Parameters.cpp:73-84)
    if out_dir is None:
        out_dir = cfg.output_dir or "svin_out"
        os.makedirs(out_dir, exist_ok=True)
    engine = VioEngine(cfg)
    closer = LoopCloser(engine.rig.cameras[0], cfg)
    if resume_prefix:
        # resume a prior session: restored pose graph + BoW database; the
        # engine window restarts as a NEW SEQUENCE so the pose graph never
        # chains a VIO relative across the discontinuity
        from ..pipeline.checkpoint import load_engine, load_loop_closer

        if os.path.exists(resume_prefix + ".engine.npz"):
            load_engine(engine, resume_prefix + ".engine.npz")
        if os.path.exists(resume_prefix + ".loop.npz"):
            load_loop_closer(closer, resume_prefix + ".loop.npz")
        engine.sequence = closer.sequence_cnt + 1
    n_restored_kf = len(closer.keyframes)
    gmap = GlobalMap(min_quality=cfg.global_map.min_landmark_quality)
    n_loops = [0]
    # debug-artifact tree (pose_graph_node.cpp:12-92) when
    # output_params.debug is on
    dbg = None
    if cfg.debug_mode:
        from ..pipeline.outputs import DebugOutputDirs

        dbg = DebugOutputDirs(os.path.join(out_dir, "debug_output"))
        # stage images (loop_candidates/, descriptor_matched/,
        # pnp_verified/) are written inside the closer at their stages
        closer.debug = dbg

    kf_key = {}  # closer keyframe index -> global-map keyframe key

    def on_kf(export):
        idx = len(closer.keyframes)
        loop = closer.add_keyframe(export)
        if len(closer.keyframes) > idx:
            kf_key[idx] = export["kf_index"]
        T = Transformation(
            r=np.asarray(export["T_WC_r"]), q=np.asarray(export["T_WC_q"])
        )
        gmap.add_observations(
            export["kf_index"], T, export["landmark_ids"],
            export["points_W"], export["quality"],
        )
        if loop is not None:
            n_loops[0] += 1
            if dbg is not None:
                dbg.log_loop(
                    loop.query_index, loop.match_index, loop.num_inliers,
                    loop.rel_t, loop.rel_yaw,
                )
                # PnP-inlier match visualization (Keyframe.cpp:527-535
                # writes pnp_verified/ and loop_closure/ images)
                kq = closer.keyframes[loop.query_index]
                km = closer.keyframes[loop.match_index]
                if (
                    kq.debug_image is not None
                    and km.debug_image is not None
                    and loop.uv_query is not None
                ):
                    from ..pipeline.outputs import draw_matches

                    M = len(loop.uv_query)
                    img = draw_matches(
                        kq.debug_image, loop.uv_query,
                        km.debug_image, loop.uv_match,
                        np.stack([np.arange(M), np.arange(M)], 1),
                    )
                    dbg.save_image(
                        "loop_closure",
                        f"loop_closure_{loop.query_index}_"
                        f"{loop.match_index}", img,
                        caption=(
                            f"current frame: {loop.query_index}  previous "
                            f"frame: {loop.match_index}  inliers "
                            f"{loop.num_inliers}"
                        ),
                    )
            # re-project the global map through loop-corrected poses
            # (LoopClosure::updateGlobalMap analog)
            corrected = {
                kf_key[k]: T_c
                for k, T_c in closer.corrected_keyframe_poses().items()
                if k in kf_key
            }
            gmap.update_after_loop(corrected)

    engine.keyframe_callback = on_kf
    state_csv = CsvStateWriter(os.path.join(out_dir, "state.csv"))
    viewer = TopDownViewer()

    def on_state(r):
        state_csv.write(r)
        viewer.add_result(r)

    engine.state_callback = on_state

    events = events_from_source(data, cfg, engine.rig)

    def route_primitive(evs):
        """Primitive-estimator odometry goes to the switching estimator
        (the reference's primitive topic → SwitchingEstimator), everything
        else to the engine."""
        for ev in evs:
            if ev.kind == "primitive":
                closer.add_primitive_pose(
                    ev.t,
                    Transformation(
                        r=np.asarray(ev.primitive[0]),
                        q=np.asarray(ev.primitive[1]),
                    ),
                )
                continue
            yield ev

    results = run_events(engine, route_primitive(events))

    closer.flush()  # run any fast-relocalization-deferred optimization
    engine.save_trajectory_tum(os.path.join(out_dir, "svin_vio.txt"))
    closer.save_trajectory_tum(os.path.join(out_dir, "svin_loop.txt"))
    gmap.save_ply(os.path.join(out_dir, "global_map.ply"))
    closer.save_switch_info(os.path.join(out_dir, "switch_info.txt"))
    # robust ("uber") trajectory from the switching estimator
    with open(os.path.join(out_dir, "svin_robust.txt"), "w") as f:
        for t, r, q in closer.robust_trajectory:
            f.write(
                f"{t:.6f} {r[0]:.6f} {r[1]:.6f} {r[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )
    lm_csv = CsvLandmarkWriter(os.path.join(out_dir, "landmarks.csv"))
    lv = np.asarray(engine.window.lm_valid)
    lm_csv.write_map(
        np.asarray(engine.window.lm_id)[lv],
        np.asarray(engine.window.hp_W[:, :3])[lv],
        np.asarray(engine.window.lm_quality)[lv],
    )
    lm_csv.close()
    state_csv.close()
    # top-down trajectory view (the reference app's PoseViewer window)
    viewer.save(os.path.join(out_dir, "top_view.png"))
    # keyframe frusta + loop edges (rviz MarkerArray analog -> PLY line set)
    save_frustums_ply(
        os.path.join(out_dir, "keyframes.ply"),
        closer.corrected_keyframe_poses(),
        [(lp.query_index, lp.match_index) for lp in closer.loops],
    )

    # loop-closure funnel counters + per-solve PGO log (the reference's
    # 10-second utils::Statistics printouts, persisted for artifacts)
    import json as _json

    with open(os.path.join(out_dir, "loop_stats.json"), "w") as f:
        _json.dump(
            {
                "stats": closer.stats,
                "pgo_log": closer.pgo_log,
                "n_keyframes": len(closer.keyframes),
                "n_restored": n_restored_kf,
                "n_loops": n_loops[0],
                "earliest_loop_index": int(closer.earliest_loop_index),
                # per-accepted-loop record: lets offline tools grade the
                # PnP relatives against ground truth
                "loops": [
                    {
                        "i": lp.match_index, "j": lp.query_index,
                        "t_i": closer.keyframes[lp.match_index].timestamp,
                        "t_j": closer.keyframes[lp.query_index].timestamp,
                        "rel_t": [round(float(x), 5) for x in lp.rel_t],
                        "rel_yaw": round(float(lp.rel_yaw), 5),
                        "inliers": int(lp.num_inliers),
                    }
                    for lp in closer.loops
                ],
            },
            f, indent=1,
        )

    if dbg is not None:
        dbg.close()
    if checkpoint_prefix:
        from ..pipeline.checkpoint import save_engine, save_loop_closer

        save_engine(engine, checkpoint_prefix + ".engine.npz")
        save_loop_closer(closer, checkpoint_prefix + ".loop.npz")

    print(
        f"frames: {len(results)}  keyframes: {len(closer.keyframes)}  "
        f"loops: {n_loops[0]}  outputs in {out_dir}/"
    )
    print(Timing.print_table())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
