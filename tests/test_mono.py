"""Monocular VIO: temporal 2D-2D landmark bootstrap (the reference's
matchToKeyframes/matchToLastFrame 2D-2D + triangulation path,
Frontend.cpp:336-465) must create landmarks without a stereo pair and hold
the trajectory against ground truth (scale observable through the IMU).
"""
import numpy as np
import pytest

from svin_tpu.cameras import NCameraSystem, make_camera
from svin_tpu.kinematics import from_rq

from vio_fixtures import IMG_H, IMG_W, small_config, standard_run


def mono_rig() -> NCameraSystem:
    cam = make_camera(IMG_W, IMG_H, 160.0, 160.0, 100.0, 75.0, model="none")
    rig = NCameraSystem()
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [0, 0, 0, 1]), cam)
    return rig


@pytest.fixture(scope="module")
def mono_run():
    return standard_run(duration=2.6, cam_rate=6.0, rig=mono_rig())


def test_mono_creates_landmarks_and_tracks(mono_run):
    engine, renderer, results = mono_run
    created = sum(r.num_new_landmarks for r in results)
    assert created >= 20, created
    tracked = [r.num_tracked for r in results[2:]]
    assert np.median(tracked) >= 10, tracked


def test_mono_trajectory_bounded(mono_run):
    """Sim(3)-aligned ATE bound. Mono-inertial METRIC scale on a short,
    gently-excited bootstrap is famously ill-conditioned (the first
    landmarks triangulate from IMU-only predictions while gyro/accel biases
    are still unobservable, and FEJ pins that linearization) — a dedicated
    visual-inertial initializer (VINS-style alignment) is future work, so
    the scale is NOT asserted here; the visually-consistent shape is."""
    from svin_tpu.evaluation import ate_rmse

    engine, renderer, results = mono_run
    est = np.stack([np.asarray(r.T_WS.r) for r in results])
    gt = np.stack([np.asarray(renderer.pose(r.timestamp).r) for r in results])
    rmse, align = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.25, rmse
