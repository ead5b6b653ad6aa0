"""Shared VIO engine test configuration.

Every engine-based test module uses THIS rig + config so the whole suite
compiles exactly one instantiation of the big device programs (optimize,
marginalize, detect/describe). Divergent per-module configs multiply
XLA/LLVM compile volume, which this toolchain cannot sustain in one process.
"""
import numpy as np

from svin_tpu import sim
from svin_tpu.cameras import NCameraSystem, make_camera
from svin_tpu.kinematics import from_rq
from svin_tpu.pipeline import VioConfig, VioEngine, run_events, synthetic_sequence

IMG_W, IMG_H = 200, 150
MAX_KEYPOINTS = 150


def small_rig() -> NCameraSystem:
    cam = make_camera(IMG_W, IMG_H, 160.0, 160.0, 100.0, 75.0, model="none")
    rig = NCameraSystem()
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [0, 0, 0, 1]), cam)
    rig.add_camera(from_rq([0.2, 0.0, 0.0], [0, 0, 0, 1]), cam)
    return rig


def small_config() -> VioConfig:
    cfg = VioConfig()
    cfg.num_keyframes = 4
    cfg.num_imu_frames = 2
    cfg.max_keypoints = MAX_KEYPOINTS
    cfg.max_iterations = 5
    return cfg


def standard_run(duration=2.6, cam_rate=6.0, depth=False, sonar=False,
                 sonar_T_SSo=None, seed=3, cfg=None, rig=None, traj=None,
                 sim_imu=None):
    """One standard synthetic engine run; returns (engine, renderer, results).

    ``sim_imu`` optionally gives the SIMULATOR different (e.g. noisier) IMU
    noise than the engine's model — extra IMU drift without recompiling the
    engine's device programs (ImuParameters are trace-time constants)."""
    rig = small_rig() if rig is None else rig
    cfg = small_config() if cfg is None else cfg
    engine = VioEngine(cfg, rig=rig)
    if traj is None:
        traj = sim.default_trajectory(scale=0.4, ramp_tau=0.8)
    events, renderer = synthetic_sequence(
        rig, duration=duration, cam_rate=cam_rate, imu_rate=100.0,
        imu_params=cfg.imu if sim_imu is None else sim_imu, seed=seed,
        n_points=300, traj=traj, spread=6.0,
        depth_offset=3.0, t_first_frame=0.12, depth_enabled=depth,
        sonar_enabled=sonar, sonar_T_SSo=sonar_T_SSo,
    )
    results = run_events(engine, events)
    return engine, renderer, results
