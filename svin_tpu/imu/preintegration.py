"""IMU preintegration + propagation as one masked `lax.scan` kernel.

TPU-native re-design of the reference's trapezoidal on-manifold preintegration
(``okvis_ceres/src/ImuError.cpp:76-263`` redoPreintegration, ``:266-476``
propagation, ``:706-866`` factor evaluation): one scan produces the full
preintegral pytree — rotation increment, C/acc single and double integrals,
bias Jacobians (dalpha/db_g, dv/db_g, dp/db_g), and the 15x15 covariance —
from fixed-shape, mask-padded measurement arrays, so it jits once and vmaps
over factors. Both the "propagate state forward" and "two-state factor" uses
consume the same preintegral.

Error-state ordering (matches the reference): [δp, δα, δv, δb_g, δb_a].
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..kinematics import Transformation, quaternion as quat


class ImuParameters(NamedTuple):
    """Continuous-time IMU noise model (reference: ``okvis::ImuParameters``,
    ``okvis_common/include/okvis/Parameters.hpp:119-150``)."""

    sigma_g_c: float = 12.0e-4  # gyro noise density [rad/s/sqrt(Hz)]
    sigma_a_c: float = 8.0e-3  # accelerometer noise density [m/s^2/sqrt(Hz)]
    sigma_gw_c: float = 4.0e-6  # gyro bias random walk
    sigma_aw_c: float = 4.0e-5  # accel bias random walk
    g: float = 9.81007  # gravity magnitude
    g_max: float = 7.8  # gyro saturation [rad/s]
    a_max: float = 176.0  # accel saturation [m/s^2]
    rate: int = 100  # nominal rate [Hz]
    sigma_ba: float = 0.1  # prior accel bias sigma
    sigma_bg: float = 0.03  # prior gyro bias sigma


class Preintegral(NamedTuple):
    """Relative-motion preintegral between t0 and t1 at a reference bias."""

    Delta_q: jnp.ndarray  # (4,) rotation increment quaternion (xyzw)
    C_integral: jnp.ndarray  # (3,3) ∫C dt
    C_doubleintegral: jnp.ndarray  # (3,3) ∫∫C dt²
    acc_integral: jnp.ndarray  # (3,) ∫C a dt
    acc_doubleintegral: jnp.ndarray  # (3,) ∫∫C a dt²
    dalpha_db_g: jnp.ndarray  # (3,3)
    dv_db_g: jnp.ndarray  # (3,3)
    dp_db_g: jnp.ndarray  # (3,3)
    P_delta: jnp.ndarray  # (15,15) error-state covariance
    Delta_t: jnp.ndarray  # () total integrated time
    bias_ref: jnp.ndarray  # (6,) [b_g, b_a] linearization point


def gravity_vector(params: ImuParameters, dtype=jnp.float64) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, params.g], dtype=dtype)


def _interp(t, t0, v0, t1, v1):
    """Linear interpolation of a (3,) signal, safe for t1 == t0."""
    denom = jnp.where(jnp.abs(t1 - t0) < 1e-12, 1.0, t1 - t0)
    r = jnp.clip((t - t0) / denom, 0.0, 1.0)
    return (1.0 - r) * v0 + r * v1


def preintegrate(
    t: jnp.ndarray,  # (N,) measurement times [s]
    gyro: jnp.ndarray,  # (N,3)
    acc: jnp.ndarray,  # (N,3)
    valid: jnp.ndarray,  # (N,) bool padding mask
    t0: jnp.ndarray,  # () start time [s]
    t1: jnp.ndarray,  # () end time [s]
    bias: jnp.ndarray,  # (6,) [b_g, b_a] linearization bias
    params: ImuParameters,
) -> Preintegral:
    """Integrate all measurement intervals overlapping [t0, t1].

    The measurement window must bracket [t0, t1] (the host slices with the
    reference's 0.02 s temporal overlap). Intervals are clamped to [t0, t1]
    with endpoint interpolation — the generalization of the reference's
    first/last-segment interpolation.
    """
    dtype = gyro.dtype
    b_g, b_a = bias[:3], bias[3:6]
    eye3 = jnp.eye(3, dtype=dtype)

    class Carry(NamedTuple):
        Delta_q: jnp.ndarray
        C_integral: jnp.ndarray
        C_double: jnp.ndarray
        acc_integral: jnp.ndarray
        acc_double: jnp.ndarray
        cross: jnp.ndarray
        dalpha_db_g: jnp.ndarray
        dv_db_g: jnp.ndarray
        dp_db_g: jnp.ndarray
        P: jnp.ndarray
        Delta_t: jnp.ndarray

    init = Carry(
        Delta_q=quat.identity().astype(dtype),
        C_integral=jnp.zeros((3, 3), dtype),
        C_double=jnp.zeros((3, 3), dtype),
        acc_integral=jnp.zeros(3, dtype),
        acc_double=jnp.zeros(3, dtype),
        cross=jnp.zeros((3, 3), dtype),
        dalpha_db_g=jnp.zeros((3, 3), dtype),
        dv_db_g=jnp.zeros((3, 3), dtype),
        dp_db_g=jnp.zeros((3, 3), dtype),
        P=jnp.zeros((15, 15), dtype),
        Delta_t=jnp.zeros((), dtype),
    )

    # consecutive-pair inputs
    seg = (
        t[:-1], t[1:], gyro[:-1], gyro[1:], acc[:-1], acc[1:],
        valid[:-1] & valid[1:],
    )

    def step(c: Carry, x):
        ta, tb, w_a_raw, w_b_raw, a_a_raw, a_b_raw, seg_valid = x
        a = jnp.maximum(ta, t0)
        b = jnp.minimum(tb, t1)
        dt = b - a
        use = seg_valid & (dt > 0)
        dt = jnp.where(use, dt, 0.0)

        w0 = _interp(a, ta, w_a_raw, tb, w_b_raw)
        w1 = _interp(b, ta, w_a_raw, tb, w_b_raw)
        a0 = _interp(a, ta, a_a_raw, tb, a_b_raw)
        a1 = _interp(b, ta, a_a_raw, tb, a_b_raw)

        # saturation → noise inflation x100 (reference ImuError.cpp:155-171)
        gyr_sat = jnp.max(jnp.abs(jnp.stack([w0, w1]))) > params.g_max
        acc_sat = jnp.max(jnp.abs(jnp.stack([a0, a1]))) > params.a_max
        sigma_g_c = jnp.where(gyr_sat, params.sigma_g_c * 100.0, params.sigma_g_c)
        sigma_a_c = jnp.where(acc_sat, params.sigma_a_c * 100.0, params.sigma_a_c)

        omega_true = 0.5 * (w0 + w1) - b_g
        acc_true = 0.5 * (a0 + a1) - b_a

        dq = quat.exp(omega_true * dt)
        Delta_q_1 = quat.normalize(quat.multiply(c.Delta_q, dq))
        C = quat.to_rotation_matrix(c.Delta_q)
        C_1 = quat.to_rotation_matrix(Delta_q_1)
        C_integral_1 = c.C_integral + 0.5 * (C + C_1) * dt
        acc_integral_1 = c.acc_integral + 0.5 * (C + C_1) @ acc_true * dt
        C_double_1 = c.C_double + c.C_integral * dt + 0.25 * (C + C_1) * dt * dt
        acc_double_1 = (
            c.acc_double + c.acc_integral * dt + 0.25 * (C + C_1) @ acc_true * dt * dt
        )

        Jr = quat.right_jacobian(omega_true * dt)
        dalpha_db_g_1 = c.dalpha_db_g + C_1 @ Jr * dt
        cross_1 = quat.to_rotation_matrix(quat.conjugate(dq)) @ c.cross + Jr * dt
        acc_x = quat.cross_mx(acc_true)
        mix = C @ acc_x @ c.cross + C_1 @ acc_x @ cross_1
        dv_db_g_1 = c.dv_db_g + 0.5 * dt * mix
        dp_db_g_1 = c.dp_db_g + dt * c.dv_db_g + 0.25 * dt * dt * mix

        # covariance propagation P ← F P Fᵀ + Q (state order [p, α, v, bg, ba])
        F = jnp.eye(15, dtype=dtype)
        F = F.at[0:3, 3:6].set(
            -quat.cross_mx(c.acc_integral * dt + 0.25 * (C + C_1) @ acc_true * dt * dt)
        )
        F = F.at[0:3, 6:9].set(eye3 * dt)
        F = F.at[0:3, 9:12].set(dt * c.dv_db_g + 0.25 * dt * dt * mix)
        F = F.at[0:3, 12:15].set(-c.C_integral * dt - 0.25 * (C + C_1) * dt * dt)
        F = F.at[3:6, 9:12].set(-dt * C_1)
        F = F.at[6:9, 3:6].set(-quat.cross_mx(0.5 * (C + C_1) @ acc_true * dt))
        F = F.at[6:9, 9:12].set(0.5 * dt * mix)
        F = F.at[6:9, 12:15].set(-0.5 * (C + C_1) * dt)
        P1 = F @ c.P @ F.T
        s2_alpha = dt * sigma_g_c**2
        s2_v = dt * sigma_a_c**2
        s2_p = 0.5 * dt * dt * s2_v
        s2_bg = dt * params.sigma_gw_c**2
        s2_ba = dt * params.sigma_aw_c**2
        diag = jnp.concatenate(
            [
                jnp.full(3, s2_p, dtype), jnp.full(3, s2_alpha, dtype),
                jnp.full(3, s2_v, dtype), jnp.full(3, s2_bg, dtype),
                jnp.full(3, s2_ba, dtype),
            ]
        )
        P1 = P1 + jnp.diag(diag)

        new = Carry(
            Delta_q=Delta_q_1, C_integral=C_integral_1, C_double=C_double_1,
            acc_integral=acc_integral_1, acc_double=acc_double_1, cross=cross_1,
            dalpha_db_g=dalpha_db_g_1, dv_db_g=dv_db_g_1, dp_db_g=dp_db_g_1,
            P=P1, Delta_t=c.Delta_t + dt,
        )
        keep = jax.tree_util.tree_map(
            lambda n, o: jnp.where(use, n, o), new, c
        )
        return keep, None

    final, _ = jax.lax.scan(step, init, seg)
    P = 0.5 * (final.P + final.P.T)
    return Preintegral(
        Delta_q=final.Delta_q,
        C_integral=final.C_integral,
        C_doubleintegral=final.C_double,
        acc_integral=final.acc_integral,
        acc_doubleintegral=final.acc_double,
        dalpha_db_g=final.dalpha_db_g,
        dv_db_g=final.dv_db_g,
        dp_db_g=final.dp_db_g,
        P_delta=P,
        Delta_t=final.Delta_t,
        bias_ref=bias,
    )


def sqrt_information(pre: Preintegral) -> jnp.ndarray:
    """Square-root information W with Wᵀ W = P_delta⁻¹ (reference: LLT of the
    information, ImuError.cpp:250-258). Computed as W = L⁻¹ from P = L Lᵀ via
    triangular solve — avoids explicitly inverting the (very ill-conditioned)
    covariance. W is lower-triangular; any square root is a valid whitener.
    """
    P = pre.P_delta
    # Diagonal equilibration before the factorization: P's diagonal spans
    # ~rad² (1e-8) down to bias-random-walk (1e-13) scales, cond(P) ≥ 1e8 —
    # a raw f32 Cholesky of that loses every significant digit and the
    # whitener mis-weights the velocity/bias rows (measured: the shipped
    # f32 path drifted ~2 m/s on the 30 s gauntlet). Factoring the
    # correlation matrix P̂ = D⁻¹ P D⁻¹ (unit diagonal, cond ~ 1e2) and
    # un-scaling the triangular inverse is algebraically the same whitener
    # family (Ŵ D⁻¹ satisfies WᵀW = P⁻¹) at f32-safe conditioning.
    d = jnp.sqrt(jnp.clip(jnp.diagonal(P), 1e-30))
    Pn = P / (d[:, None] * d[None, :])
    L = jnp.linalg.cholesky(Pn)
    eye = jnp.eye(15, dtype=P.dtype)
    W = jax.scipy.linalg.solve_triangular(L, eye, lower=True) / d[None, :]
    # degenerate segment (no IMU samples between the states → P = 0):
    # Cholesky yields NaN; return a zero whitener instead of poisoning the
    # factor tables (0·NaN = NaN survives validity masks downstream). The
    # caller must also mark the factor invalid (vio checks Delta_t > 0).
    return jnp.where(jnp.isfinite(W), W, 0.0)


def propagate(
    T_WS: Transformation,
    speed_and_bias: jnp.ndarray,  # (9,) [v_W, b_g, b_a]
    pre: Preintegral,
    params: ImuParameters,
) -> Tuple[Transformation, jnp.ndarray]:
    """Forward state propagation using a preintegral computed at the state's
    own bias (reference: static ``ImuError::propagation``).
    """
    g_W = gravity_vector(params, pre.acc_integral.dtype)
    v0 = speed_and_bias[:3]
    Dt = pre.Delta_t
    C_WS = quat.to_rotation_matrix(T_WS.q)
    # first-order bias correction relative to the preintegral's reference bias
    db = speed_and_bias[3:9] - pre.bias_ref
    dp = pre.acc_doubleintegral + pre.dp_db_g @ db[:3] - pre.C_doubleintegral @ db[3:6]
    dv = pre.acc_integral + pre.dv_db_g @ db[:3] - pre.C_integral @ db[3:6]
    dq_corr = quat.exp(-pre.dalpha_db_g @ db[:3])
    Dq = quat.multiply(dq_corr, pre.Delta_q)
    r1 = T_WS.r + v0 * Dt - 0.5 * g_W * Dt * Dt + C_WS @ dp
    v1 = v0 - g_W * Dt + C_WS @ dv
    q1 = quat.normalize(quat.multiply(T_WS.q, Dq))
    sb1 = jnp.concatenate([v1, speed_and_bias[3:9]])
    return Transformation(r=r1, q=q1), sb1


def error_and_jacobians(
    T_WS_0: Transformation,
    sb0: jnp.ndarray,
    T_WS_1: Transformation,
    sb1: jnp.ndarray,
    pre: Preintegral,
    params: ImuParameters,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """15-dim IMU factor error + minimal Jacobians F0 (wrt state 0) and F1
    (wrt state 1), both 15x15 over [δp, δα, δv, δb_g, δb_a] — unweighted
    (apply ``sqrt_information`` outside).

    Mirrors the math of ``ImuError::EvaluateWithMinimalJacobians``
    (ImuError.cpp:706-866) with first-order bias correction around
    ``pre.bias_ref``.
    """
    dtype = pre.acc_integral.dtype
    g_W = gravity_vector(params, dtype)
    Dt = pre.Delta_t
    C_WS_0 = quat.to_rotation_matrix(T_WS_0.q)
    C_S0_W = C_WS_0.T
    v0, v1 = sb0[:3], sb1[:3]
    Delta_b = sb0[3:9] - pre.bias_ref

    delta_p_est_W = T_WS_0.r - T_WS_1.r + v0 * Dt - 0.5 * g_W * Dt * Dt
    delta_v_est_W = v0 - v1 - g_W * Dt
    Dq = quat.multiply(quat.exp(-pre.dalpha_db_g @ Delta_b[:3]), pre.Delta_q)

    q1_inv_q0 = quat.multiply(quat.conjugate(T_WS_1.q), T_WS_0.q)

    # error
    e_p = C_S0_W @ delta_p_est_W + pre.acc_doubleintegral + (
        pre.dp_db_g @ Delta_b[:3] - pre.C_doubleintegral @ Delta_b[3:6]
    )
    e_q = 2.0 * quat.multiply(Dq, q1_inv_q0)[:3]
    e_v = C_S0_W @ delta_v_est_W + pre.acc_integral + (
        pre.dv_db_g @ Delta_b[:3] - pre.C_integral @ Delta_b[3:6]
    )
    e_b = sb0[3:9] - sb1[3:9]
    error = jnp.concatenate([e_p, e_q, e_v, e_b])

    # Jacobian wrt state 0
    F0 = jnp.eye(15, dtype=dtype)
    F0 = F0.at[0:3, 0:3].set(C_S0_W)
    F0 = F0.at[0:3, 3:6].set(C_S0_W @ quat.cross_mx(delta_p_est_W))
    F0 = F0.at[0:3, 6:9].set(C_S0_W * Dt)
    F0 = F0.at[0:3, 9:12].set(pre.dp_db_g)
    F0 = F0.at[0:3, 12:15].set(-pre.C_doubleintegral)
    F0 = F0.at[3:6, 3:6].set(
        (
            quat.plus_matrix(quat.multiply(Dq, quat.conjugate(T_WS_1.q)))
            @ quat.oplus_matrix(T_WS_0.q)
        )[:3, :3]
    )
    F0 = F0.at[3:6, 9:12].set(
        (quat.oplus_matrix(q1_inv_q0) @ quat.oplus_matrix(Dq))[:3, :3]
        @ (-pre.dalpha_db_g)
    )
    F0 = F0.at[6:9, 3:6].set(C_S0_W @ quat.cross_mx(delta_v_est_W))
    F0 = F0.at[6:9, 6:9].set(C_S0_W)
    F0 = F0.at[6:9, 9:12].set(pre.dv_db_g)
    F0 = F0.at[6:9, 12:15].set(-pre.C_integral)

    # Jacobian wrt state 1
    F1 = -jnp.eye(15, dtype=dtype)
    F1 = F1.at[0:3, 0:3].set(-C_S0_W)
    F1 = F1.at[3:6, 3:6].set(
        -(
            quat.plus_matrix(Dq)
            @ quat.oplus_matrix(T_WS_0.q)
            @ quat.plus_matrix(quat.conjugate(T_WS_1.q))
        )[:3, :3]
    )
    F1 = F1.at[6:9, 6:9].set(-C_S0_W)

    return error, F0, F1


def init_pose_from_imu(acc_mean: jnp.ndarray) -> Transformation:
    """Gravity-aligned initial pose: choose q_WS so that the measured mean
    specific force maps to +z in world (reference: ``Estimator::initPoseFromImu``,
    Estimator.cpp:848-873).
    """
    dtype = acc_mean.dtype
    z_S = acc_mean / jnp.linalg.norm(acc_mean)  # "up" measured in sensor frame
    z_W = jnp.array([0.0, 0.0, 1.0], dtype)
    # rotation taking z_S to z_W (minimal rotation about their common normal)
    axis = jnp.cross(z_S, z_W)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(z_S, z_W)
    angle = jnp.arctan2(s, c)
    axis = jnp.where(s < 1e-8, jnp.array([1.0, 0.0, 0.0], dtype), axis / jnp.maximum(s, 1e-12))
    q = quat.exp(axis * angle)
    return Transformation(r=jnp.zeros(3, dtype), q=q)
