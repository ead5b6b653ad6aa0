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
    # early mono landmarks triangulate from centimeter temporal baselines
    # (depth is noise-dominated) and are correctly pruned — steady tracking
    # is only expected once real parallax has accumulated, so assert on
    # the converged tail rather than the bootstrap churn
    tracked = [r.num_tracked for r in results[2:]]
    assert np.median(tracked[-5:]) >= 10, tracked


def test_pure_rotation_creates_no_garbage_landmarks():
    """Under pure rotation there is no parallax: the 2D-2D rotation-only
    RANSAC must beat the relative-pose model and the engine must NOT
    triangulate landmarks from the temporal path
    (Frontend::runRansac2d2d rotationOnly semantics,
    ``Frontend.cpp:893-906``) — even when IMU position drift makes the
    estimated baseline look nonzero."""
    import jax.numpy as jnp

    from svin_tpu import sim

    traj = sim.Trajectory(
        r_amp=jnp.zeros(3), r_freq=jnp.zeros(3), r_lin=jnp.zeros(3),
        w_amp=jnp.array([0.12, 0.15, 0.1]),
        w_freq=jnp.array([0.3, 0.4, 0.2]) * 2 * jnp.pi,
        ramp_tau=0.8,
    )
    # simulate a much noisier IMU than the engine's model so the IMU-only
    # position prediction drifts well past the temporal-init baseline gate
    # — the regime where only the rotation-only RANSAC stands between a
    # pure rotation and garbage triangulations
    from svin_tpu.imu import ImuParameters

    noisy = ImuParameters(sigma_a_c=0.12, sigma_g_c=6e-3)
    engine, renderer, results = standard_run(
        duration=2.6, cam_rate=6.0, rig=mono_rig(), traj=traj, seed=11,
        sim_imu=noisy,
    )
    created = sum(r.num_new_landmarks for r in results)
    assert created <= 3, created
    # the rotation-only detector must actually have fired (otherwise the
    # zero count is just the baseline gate doing the work)
    assert engine.rotation_only_detections >= 1


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
