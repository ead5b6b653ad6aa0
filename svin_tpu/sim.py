"""Synthetic trajectory + sensor simulation for tests and benchmarks.

The analog of the reference's synthetic test harness
(``okvis_ceres/test/TestEstimator.cpp:52-213``: 10 s trajectory, noisy
100 Hz IMU, landmark grid projected with pixel noise) — but analytic: the
trajectory is a smooth closed-form curve and exact angular velocity /
specific force are obtained by automatic differentiation, so ground truth is
exact to machine precision at any sample rate.

World convention: gravity g_W = +g ẑ enters propagation as v̇ = -g_W + C_WS f
(accelerometer measures specific force f = C_SW (v̇_W + g_W)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .imu import ImuParameters, gravity_vector
from .kinematics import Transformation, quaternion as quat


class Trajectory(NamedTuple):
    """Analytic trajectory coefficients; see ``pose(t)``.

    ``ramp_tau`` > 0 applies a smoothstep start-from-rest envelope (position,
    velocity and acceleration all zero at t = 0) — robots start static, and
    gravity-based attitude initialization assumes it.
    """

    r_amp: jnp.ndarray  # (3,)
    r_freq: jnp.ndarray  # (3,)
    r_lin: jnp.ndarray  # (3,) linear velocity component
    w_amp: jnp.ndarray  # (3,) orientation oscillation amplitude [rad]
    w_freq: jnp.ndarray  # (3,)
    ramp_tau: float = 0.0  # static (not traced)


def default_trajectory(scale: float = 1.0, ramp_tau: float = 0.0) -> Trajectory:
    return Trajectory(
        r_amp=jnp.array([1.0, 0.8, 0.4]) * scale,
        r_freq=jnp.array([0.4, 0.3, 0.5]) * 2 * jnp.pi,
        r_lin=jnp.array([0.15, 0.1, 0.0]) * scale,
        w_amp=jnp.array([0.2, 0.25, 0.3]),
        w_freq=jnp.array([0.3, 0.4, 0.2]) * 2 * jnp.pi,
        ramp_tau=ramp_tau,
    )


def _envelope(traj: Trajectory, t):
    if traj.ramp_tau <= 0.0:
        return 1.0
    s = jnp.clip(t / traj.ramp_tau, 0.0, 1.0)
    return s * s * s * (s * (6.0 * s - 15.0) + 10.0)  # C2 smoothstep


def position(traj: Trajectory, t) -> jnp.ndarray:
    return _envelope(traj, t) * (
        traj.r_amp * jnp.sin(traj.r_freq * t) + traj.r_lin * t
    )


def rotvec(traj: Trajectory, t) -> jnp.ndarray:
    return _envelope(traj, t) * traj.w_amp * jnp.sin(traj.w_freq * t)


def pose(traj: Trajectory, t) -> Transformation:
    return Transformation(r=position(traj, t), q=quat.exp(rotvec(traj, t)))


def velocity(traj: Trajectory, t) -> jnp.ndarray:
    return jax.jacfwd(lambda s: position(traj, s))(t)


def angular_velocity_body(traj: Trajectory, t) -> jnp.ndarray:
    """ω_S such that q̇ = 0.5 q ⊗ [ω_S, 0]."""
    q = quat.exp(rotvec(traj, t))
    qdot = jax.jacfwd(lambda s: quat.exp(rotvec(traj, s)))(t)
    w = 2.0 * quat.multiply(quat.conjugate(q), qdot)
    return w[:3]


def specific_force_body(traj: Trajectory, t, params: ImuParameters) -> jnp.ndarray:
    a_W = jax.jacfwd(lambda s: velocity(traj, s))(t)
    C_SW = quat.to_rotation_matrix(quat.exp(rotvec(traj, t))).T
    return C_SW @ (a_W + gravity_vector(params, a_W.dtype))


class ImuSeries(NamedTuple):
    t: jnp.ndarray  # (N,)
    gyro: jnp.ndarray  # (N,3)
    acc: jnp.ndarray  # (N,3)


def simulate_imu(
    traj: Trajectory,
    t_start: float,
    t_end: float,
    rate: float,
    params: ImuParameters,
    key=None,
    noisy: bool = False,
) -> ImuSeries:
    n = int(round((t_end - t_start) * rate)) + 1
    ts = t_start + jnp.arange(n) / rate
    gyro = jax.vmap(lambda s: angular_velocity_body(traj, s))(ts)
    acc = jax.vmap(lambda s: specific_force_body(traj, s, params))(ts)
    if noisy and key is not None:
        k1, k2 = jax.random.split(key)
        # discrete-time noise sigma = sigma_c * sqrt(rate)
        gyro = gyro + params.sigma_g_c * jnp.sqrt(rate) * jax.random.normal(k1, gyro.shape, gyro.dtype)
        acc = acc + params.sigma_a_c * jnp.sqrt(rate) * jax.random.normal(k2, acc.shape, acc.dtype)
    return ImuSeries(t=ts, gyro=gyro, acc=acc)


def landmark_grid(
    key, n: int, center: jnp.ndarray, extent: jnp.ndarray
) -> jnp.ndarray:
    """Uniform random landmarks in a box (reference grid analog)."""
    return center + (jax.random.uniform(key, (n, 3)) - 0.5) * extent
