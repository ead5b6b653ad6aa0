"""CLI app test: the okvis_app_synchronous analog end-to-end — config file →
engine + loop closer + global map → TUM/CSV/PLY outputs (reference
``okvis_apps/src/okvis_app_synchronous.cpp`` + pose_graph_node outputs).

Uses the shared vio_fixtures rig dimensions so the device programs compiled
here match the other engine modules' shapes.
"""
import os

import numpy as np

from vio_fixtures import IMG_W, IMG_H, MAX_KEYPOINTS

CONFIG_YAML = f"""%YAML:1.0
cameras:
  - T_SC: [1.0, 0.0, 0.0, 0.0,  0.0, 1.0, 0.0, 0.0,  0.0, 0.0, 1.0, 0.0,  0.0, 0.0, 0.0, 1.0]
    image_dimension: [{IMG_W}, {IMG_H}]
    focal_length: [160.0, 160.0]
    principal_point: [100.0, 75.0]
    distortion_coefficients: []
    distortion_type: none
  - T_SC: [1.0, 0.0, 0.0, 0.2,  0.0, 1.0, 0.0, 0.0,  0.0, 0.0, 1.0, 0.0,  0.0, 0.0, 0.0, 1.0]
    image_dimension: [{IMG_W}, {IMG_H}]
    focal_length: [160.0, 160.0]
    principal_point: [100.0, 75.0]
    distortion_coefficients: []
    distortion_type: none

camera_params:
    camera_rate: 6

imu_params:
    imu_rate: 100

numKeyframes: 4
numImuFrames: 2

ceres_options:
    maxIterations: 5

detection_options:
    threshold: 40.0
    octaves: 0
    maxNoKeypoints: {MAX_KEYPOINTS}
"""


def test_app_synchronous_synthetic(tmp_path, monkeypatch):
    cfg_path = tmp_path / "rig.yaml"
    cfg_path.write_text(CONFIG_YAML)
    out_dir = tmp_path / "out"
    monkeypatch.setenv("SVIN_SYNTH_DURATION", "2.2")

    from svin_tpu.apps.run_synchronous import main

    rc = main([str(cfg_path), "--synthetic", str(out_dir)])
    assert rc == 0
    files = set(os.listdir(out_dir))
    assert {"svin_vio.txt", "svin_loop.txt", "global_map.ply",
            "state.csv", "landmarks.csv", "top_view.png"} <= files
    # TUM trajectory is parseable and non-trivial
    traj = np.loadtxt(out_dir / "svin_vio.txt")
    assert traj.ndim == 2 and traj.shape[1] == 8 and traj.shape[0] >= 8
    # quaternions normalized
    qn = np.linalg.norm(traj[:, 4:8], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)


def test_app_checkpoint_resume_roundtrip(tmp_path, monkeypatch):
    """--save-checkpoint then --resume: the second run restores the pose
    graph + BoW database and starts a NEW sequence (no sequential edge can
    chain across the discontinuity)."""
    cfg_path = tmp_path / "rig.yaml"
    cfg_path.write_text(CONFIG_YAML)
    monkeypatch.setenv("SVIN_SYNTH_DURATION", "2.0")
    ckpt = str(tmp_path / "session")

    from svin_tpu.apps.run_synchronous import main

    rc = main([str(cfg_path), "--synthetic", str(tmp_path / "out1"),
               "--save-checkpoint", ckpt])
    assert rc == 0
    assert os.path.exists(ckpt + ".engine.npz")
    assert os.path.exists(ckpt + ".loop.npz")
    import numpy as _np
    n_kf_1 = _np.loadtxt(tmp_path / "out1" / "svin_loop.txt", ndmin=2).shape[0]
    assert n_kf_1 >= 2

    rc = main([str(cfg_path), "--synthetic", str(tmp_path / "out2"),
               "--resume", ckpt])
    assert rc == 0
    traj2 = _np.loadtxt(tmp_path / "out2" / "svin_loop.txt", ndmin=2)
    # resumed pose graph contains BOTH sessions' keyframes
    assert traj2.shape[0] > n_kf_1


def test_evaluate_cli(tmp_path, capsys):
    """ATE CLI recovers the injected Sim(3) and reports noise-level RMSE."""
    rng = np.random.RandomState(0)
    t = np.arange(200) * 0.05
    gt = np.cumsum(rng.randn(200, 3) * 0.05, axis=0)
    th = 0.4
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    est = (gt @ R.T) * 0.5 + np.array([1, 2, 3]) + rng.randn(200, 3) * 0.005

    def save(p, pos):
        with open(p, "w") as f:
            for i in range(200):
                f.write(
                    f"{t[i]:.6f} "
                    + " ".join(f"{v:.6f}" for v in pos[i])
                    + " 0 0 0 1\n"
                )

    save(tmp_path / "gt.txt", gt)
    save(tmp_path / "est.txt", est)
    from svin_tpu.apps.evaluate import main
    import json

    rc = main([str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out["scale"] - 2.0) < 0.01
    assert out["ate_rmse"] < 0.03
    assert out["n_pairs"] == 200


def test_app_live_synthetic(tmp_path, monkeypatch):
    """Live-mode CLI (okvis_node analog): threaded pipeline at unpaced
    speed, drop accounting, TUM outputs."""
    cfg_path = tmp_path / "rig.yaml"
    cfg_path.write_text(CONFIG_YAML)
    out_dir = tmp_path / "live_out"
    monkeypatch.setenv("SVIN_SYNTH_DURATION", "1.6")

    from svin_tpu.apps.run_live import main

    rc = main([str(cfg_path), "--synthetic", str(out_dir), "--speed", "0"])
    assert rc == 0
    traj = np.loadtxt(out_dir / "svin_vio.txt")
    # unpaced drop-oldest mode keeps only what the pipeline can sustain
    assert traj.ndim == 2 and traj.shape[1] == 8 and traj.shape[0] >= 2


def test_rpe_metric():
    """RPE: exact trajectories give 0; a constant velocity offset gives the
    expected per-second translational drift."""
    from svin_tpu.evaluation import rpe

    t = np.arange(0.0, 10.0, 0.1)
    p = np.stack([t, np.zeros_like(t), np.zeros_like(t)], axis=1)
    q = np.tile([0.0, 0.0, 0.0, 1.0], (len(t), 1))
    out0 = rpe(t, p, q, p, q, delta_s=1.0)
    assert out0["rpe_n_pairs"] > 0 and out0["rpe_trans_rmse"] < 1e-12
    # est drifts 0.05 m/s in +y
    p_est = p + np.outer(t, [0.0, 0.05, 0.0])
    out = rpe(t, p_est, q, p, q, delta_s=1.0)
    assert abs(out["rpe_trans_rmse"] - 0.05) < 1e-6
    assert out["rpe_rot_rmse_deg"] < 1e-2  # arccos noise near identity


def test_app_output_params_and_debug_mode(tmp_path, monkeypatch):
    """output_params (Parameters.cpp:73-92): output_dir is the default out
    directory and debug mode writes the pose_graph_node debug-artifact tree
    with a populated loop_closure.txt."""
    out_default = tmp_path / "cfg_out"
    cfg_path = tmp_path / "rig.yaml"
    cfg_path.write_text(CONFIG_YAML + f"""
loop_closure_params:
    enable: 1
    min_correspondences: 12

output_params:
    output_dir: "{out_default}"
    debug: 1
""")
    monkeypatch.setenv("SVIN_SYNTH_DURATION", "2.5")
    from svin_tpu.apps.run_synchronous import main

    rc = main([str(cfg_path), "--synthetic"])  # NO out_dir argument
    assert rc == 0
    assert (out_default / "svin_vio.txt").exists()
    dbg = out_default / "debug_output"
    assert (dbg / "loop_candidates").is_dir()
    assert (dbg / "pnp_verified").is_dir()
    assert (dbg / "loop_closure.txt").exists()
    # (loop-log CONTENT is covered by the gauntlet-length sequences —
    # loops only attempt past the 50-keyframe recency exclusion,
    # PoseGraph.cpp:197, which a short smoke run cannot reach)
