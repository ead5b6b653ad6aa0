"""Gauntlet variants (VERDICT r2 #10): the full-CLI accuracy chain in
(a) 6-DoF pose-graph mode with injected roll/pitch gyro drift — proving
the SE(3) drift correction the 4-DoF mode cannot perform
(PoseGraph.cpp:387-543), and (b) a mono rig — the temporal-bootstrap
landmark path end-to-end (SURVEY §3.6; no stereo pair to triangulate
from).
"""
import os

import numpy as np
import pytest

from vio_fixtures import IMG_H, IMG_W

MAXKP = 150
_CAM0 = f"""  - T_SC: [1.0, 0.0, 0.0, 0.0,  0.0, 1.0, 0.0, 0.0,  0.0, 0.0, 1.0, 0.0,  0.0, 0.0, 0.0, 1.0]
    image_dimension: [{IMG_W}, {IMG_H}]
    focal_length: [160.0, 160.0]
    principal_point: [100.0, 75.0]
    distortion_coefficients: []
    distortion_type: none
"""
_CAM1 = _CAM0.replace("1.0, 0.0, 0.0, 0.0,  0.0, 1.0",
                      "1.0, 0.0, 0.0, 0.2,  0.0, 1.0")

_COMMON = f"""
camera_params:
    camera_rate: 3

imu_params:
    imu_rate: 100

numKeyframes: 4
numImuFrames: 2

ceres_options:
    maxIterations: 5

detection_options:
    threshold: 40.0
    octaves: 0
    maxNoKeypoints: {MAXKP}
"""


def _run(tmp, yaml_text, env):
    cfg_path = tmp / "rig.yaml"
    cfg_path.write_text(yaml_text)
    out_dir = tmp / "out"
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        from svin_tpu.apps.run_synchronous import main

        rc = main([str(cfg_path), "--synthetic", str(out_dir)])
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    return out_dir


def _eval(out_dir, name):
    from svin_tpu import sim
    from svin_tpu.evaluation import ate_rmse, load_tum, rpe

    t, p, q = load_tum(str(out_dir / f"{name}.txt"))
    traj = sim.default_trajectory(scale=0.4, ramp_tau=0.8)
    traj = traj._replace(r_lin=traj.r_lin * 0.0)
    gt_p = np.stack([np.asarray(sim.position(traj, tt)) for tt in t])
    gt_q = np.stack([np.asarray(sim.pose(traj, tt).q) for tt in t])
    rmse, _ = ate_rmse(p, gt_p, with_scale=True)
    r = rpe(t, p, q, gt_p, gt_q, delta_s=5.0)
    return len(p), rmse, r


@pytest.fixture(scope="module")
def gauntlet_6dof(tmp_path_factory):
    yaml_text = (
        "%YAML:1.0\ncameras:\n" + _CAM0 + _CAM1 + _COMMON
        + """
loop_closure_params:
    enable: 1
    min_correspondences: 12
    pgo_mode: "6dof"
"""
    )
    return _run(
        tmp_path_factory.mktemp("g6dof"), yaml_text,
        {
            "SVIN_SYNTH_DURATION": "45",
            "SVIN_SYNTH_REVISIT": "1",
            # 5x gyro noise in the SIMULATOR only: the platform's real
            # rotation random-walks in roll/pitch/yaw while the engine's
            # model stays nominal — genuine full-rotation VIO drift
            # (higher scales destabilize the VIO itself rather than
            # producing clean drift)
            "SVIN_SYNTH_GYRO_NOISE_SCALE": "5",
        },
    )


def test_gauntlet_6dof_corrects_full_rotation_drift(gauntlet_6dof):
    """The SE(3) mode's distinguishing capability is ROTATION consistency:
    with the reference's edge informations (seq yaw 57.3, loop 100 +
    Huber — PoseGraph.cpp:402-423) the loop-corrected trajectory's
    rotation drift IMPROVES on raw VIO (calibrated 1.21° vs 1.34° per
    5 s; the 4-DoF mode on the same sequence yields 2.05°) while position
    ATE does not degrade (ratio ≈0.96)."""
    n_v, rmse_v, r_v = _eval(gauntlet_6dof, "svin_vio")
    n_l, rmse_l, r_l = _eval(gauntlet_6dof, "svin_loop")
    assert n_v >= 120 and n_l >= 40
    assert rmse_l < 1.05 * rmse_v, (rmse_l, rmse_v)
    assert r_l["rpe_rot_rmse_deg"] < r_v["rpe_rot_rmse_deg"], (r_l, r_v)


@pytest.fixture(scope="module")
def gauntlet_mono(tmp_path_factory):
    yaml_text = (
        "%YAML:1.0\ncameras:\n" + _CAM0 + _COMMON
        + """
loop_closure_params:
    enable: 1
    min_correspondences: 12
"""
    )
    return _run(
        tmp_path_factory.mktemp("gmono"), yaml_text,
        {"SVIN_SYNTH_DURATION": "40", "SVIN_SYNTH_REVISIT": "1"},
    )


def test_gauntlet_mono_end_to_end(gauntlet_mono):
    """Mono rig: every landmark comes from the temporal 2D-2D bootstrap
    (no stereo pair); ATE evaluated with Sim(3) alignment because mono
    scale is unobservable up to the IMU terms."""
    n_v, rmse_v, r_v = _eval(gauntlet_mono, "svin_vio")
    assert n_v >= 100
    assert rmse_v < 0.8, rmse_v
    n_l, rmse_l, _ = _eval(gauntlet_mono, "svin_loop")
    assert n_l >= 30
    assert rmse_l <= rmse_v * 1.05, (rmse_l, rmse_v)


def test_gauntlet_mono_outputs(gauntlet_mono):
    files = set(os.listdir(gauntlet_mono))
    assert {"svin_vio.txt", "svin_loop.txt", "state.csv"} <= files
