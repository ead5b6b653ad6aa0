"""IMU preintegration tests — mirrors ``okvis_ceres/test/TestImuError.cpp``:
propagation against an analytic trajectory, factor residual ≈ 0 at ground
truth, analytic-vs-numeric Jacobians, first-order bias correction, and
mask/padding invariance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu import sim
from svin_tpu.imu import (
    ImuParameters,
    error_and_jacobians,
    init_pose_from_imu,
    preintegrate,
    propagate,
    sqrt_information,
)
from svin_tpu.kinematics import Transformation, oplus, quaternion as quat

PARAMS = ImuParameters()
TRAJ = sim.default_trajectory()


def _ground_truth_state(t):
    T = sim.pose(TRAJ, jnp.asarray(t, jnp.float64))
    v = sim.velocity(TRAJ, jnp.asarray(t, jnp.float64))
    sb = jnp.concatenate([v, jnp.zeros(6)])
    return T, sb


def _preint(t0, t1, bias=None, rate=200.0):
    series = sim.simulate_imu(TRAJ, t0 - 0.02, t1 + 0.02, rate, PARAMS)
    bias = jnp.zeros(6) if bias is None else bias
    return preintegrate(
        series.t, series.gyro, series.acc,
        jnp.ones(series.t.shape, bool),
        jnp.asarray(t0, jnp.float64), jnp.asarray(t1, jnp.float64),
        bias, PARAMS,
    )


def test_propagation_matches_trajectory():
    t0, t1 = 0.3, 1.3
    T0, sb0 = _ground_truth_state(t0)
    T1_gt, sb1_gt = _ground_truth_state(t1)
    pre = _preint(t0, t1)
    T1, sb1 = propagate(T0, sb0, pre, PARAMS)
    assert float(jnp.linalg.norm(T1.r - T1_gt.r)) < 2e-4
    assert float(jnp.linalg.norm(sb1[:3] - sb1_gt[:3])) < 5e-4
    dq = quat.multiply(quat.conjugate(T1.q), T1_gt.q)
    assert float(jnp.linalg.norm(quat.log(dq))) < 1e-4


def test_factor_residual_zero_at_ground_truth():
    t0, t1 = 0.5, 1.0
    T0, sb0 = _ground_truth_state(t0)
    T1, sb1 = _ground_truth_state(t1)
    pre = _preint(t0, t1)
    err, _, _ = error_and_jacobians(T0, sb0, T1, sb1, pre, PARAMS)
    assert float(jnp.max(jnp.abs(err))) < 1e-3


def test_factor_jacobians_vs_numeric():
    t0, t1 = 0.2, 0.7
    T0, sb0 = _ground_truth_state(t0)
    T1, sb1 = _ground_truth_state(t1)
    # evaluate at a slightly wrong state so the error is nonzero
    T0 = oplus(T0, jnp.array([0.01, -0.02, 0.03, 0.02, -0.01, 0.015]))
    sb0 = sb0 + 0.01
    pre = _preint(t0, t1, bias=jnp.zeros(6))
    _, F0, F1 = error_and_jacobians(T0, sb0, T1, sb1, pre, PARAMS)

    def err_of_delta0(d):
        e, _, _ = error_and_jacobians(
            oplus(T0, d[:6]), sb0 + d[6:15], T1, sb1, pre, PARAMS
        )
        return e

    def err_of_delta1(d):
        e, _, _ = error_and_jacobians(
            T0, sb0, oplus(T1, d[:6]), sb1 + d[6:15], pre, PARAMS
        )
        return e

    F0_num = jax.jacfwd(err_of_delta0)(jnp.zeros(15))
    F1_num = jax.jacfwd(err_of_delta1)(jnp.zeros(15))
    np.testing.assert_allclose(F0, F0_num, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(F1, F1_num, atol=2e-3, rtol=1e-3)


def test_first_order_bias_correction():
    t0, t1 = 0.4, 0.9
    T0, sb0 = _ground_truth_state(t0)
    T1, sb1 = _ground_truth_state(t1)
    db = jnp.array([2e-3, -1e-3, 1.5e-3, 5e-3, -4e-3, 3e-3])
    sb0_b = sb0.at[3:9].set(db)
    sb1_b = sb1.at[3:9].set(db)
    # sensor with true bias db: measurements are shifted by +db
    series = sim.simulate_imu(TRAJ, t0 - 0.02, t1 + 0.02, 200.0, PARAMS)
    kw = dict(
        valid=jnp.ones(series.t.shape, bool),
        t0=jnp.asarray(t0, jnp.float64), t1=jnp.asarray(t1, jnp.float64),
        params=PARAMS,
    )
    # stale preintegral at ref bias 0 → first-order correction inside the error
    pre0 = preintegrate(
        series.t, series.gyro + db[:3], series.acc + db[3:6],
        bias=jnp.zeros(6), **kw,
    )
    err_corr, _, _ = error_and_jacobians(T0, sb0_b, T1, sb1_b, pre0, PARAMS)
    # re-preintegrated at the true bias (the reference's redoPreintegration path)
    pre_b = preintegrate(
        series.t, series.gyro + db[:3], series.acc + db[3:6],
        bias=db, **kw,
    )
    err_exact, _, _ = error_and_jacobians(T0, sb0_b, T1, sb1_b, pre_b, PARAMS)
    # exact path must be near machine-clean; corrected path within O(|db|^2)
    assert float(jnp.max(jnp.abs(err_exact))) < 1e-3
    np.testing.assert_allclose(err_corr, err_exact, atol=5e-5)


def test_padding_mask_invariance():
    t0, t1 = 0.1, 0.6
    series = sim.simulate_imu(TRAJ, t0 - 0.02, t1 + 0.02, 100.0, PARAMS)
    n = series.t.shape[0]
    pre = preintegrate(
        series.t, series.gyro, series.acc, jnp.ones(n, bool),
        jnp.asarray(t0, jnp.float64), jnp.asarray(t1, jnp.float64),
        jnp.zeros(6), PARAMS,
    )
    # pad with garbage rows marked invalid
    pad = 17
    t_p = jnp.concatenate([series.t, jnp.full(pad, 1e9)])
    g_p = jnp.concatenate([series.gyro, jnp.full((pad, 3), 99.0)])
    a_p = jnp.concatenate([series.acc, jnp.full((pad, 3), -99.0)])
    m_p = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    pre_p = preintegrate(
        t_p, g_p, a_p, m_p,
        jnp.asarray(t0, jnp.float64), jnp.asarray(t1, jnp.float64),
        jnp.zeros(6), PARAMS,
    )
    for a, b in zip(pre, pre_p):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_sqrt_information_shape_and_weighting():
    pre = _preint(0.0, 0.5)
    W = sqrt_information(pre)
    # Wᵀ W must invert P (P is ill-conditioned — var spans 1e-12..1e-2)
    np.testing.assert_allclose(
        (W.T @ W) @ pre.P_delta, np.eye(15), atol=1e-6
    )


def test_covariance_consistency_monte_carlo():
    """Noisy preintegrals scatter consistently with the propagated P_delta
    (coarse 3-sigma sanity on the diagonal, position/orientation blocks)."""
    t0, t1 = 0.0, 0.5
    pre_clean = _preint(t0, t1, rate=100.0)
    errs = []
    for i in range(24):
        series = sim.simulate_imu(
            TRAJ, t0 - 0.02, t1 + 0.02, 100.0, PARAMS,
            key=jax.random.PRNGKey(i), noisy=True,
        )
        pre_n = preintegrate(
            series.t, series.gyro, series.acc, jnp.ones(series.t.shape, bool),
            jnp.asarray(t0, jnp.float64), jnp.asarray(t1, jnp.float64),
            jnp.zeros(6), PARAMS,
        )
        dp = pre_n.acc_doubleintegral - pre_clean.acc_doubleintegral
        da = quat.log(
            quat.multiply(quat.conjugate(pre_clean.Delta_q), pre_n.Delta_q)
        )
        errs.append(np.concatenate([np.array(dp), np.array(da)]))
    scatter = np.std(np.stack(errs), axis=0)
    pred = np.sqrt(np.diag(np.array(pre_clean.P_delta))[[0, 1, 2, 3, 4, 5]])
    # same order of magnitude (MC with 24 samples): within factor 3
    ratio = scatter / np.maximum(pred, 1e-12)
    assert np.all(ratio < 3.0) and np.all(ratio > 1 / 3.0), ratio


def test_init_pose_from_imu():
    # static body rolled 30° about x: accelerometer reads C_SW @ g ẑ
    q_WS = quat.exp(jnp.array([jnp.pi / 6, 0.0, 0.0]))
    f = quat.to_rotation_matrix(q_WS).T @ jnp.array([0.0, 0.0, 9.81])
    T = init_pose_from_imu(f)
    # gravity must map to +z in world under the estimated orientation
    up_W = quat.rotate(T.q, f / jnp.linalg.norm(f))
    np.testing.assert_allclose(up_W, jnp.array([0.0, 0.0, 1.0]), atol=1e-7)


def test_sqrt_information_degenerate_segment_is_finite():
    """IMU dropout: a preintegral with no covered samples (P = 0) must yield
    a finite (zero) whitener, not NaN — NaN would poison the factor tables
    through 0*NaN even where validity masks are False."""
    import jax.numpy as jnp
    from svin_tpu.imu import ImuParameters, preintegrate, sqrt_information

    params = ImuParameters()
    ts = jnp.array([0.0, 0.01, 0.02])
    gyro = jnp.zeros((3, 3))
    acc = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (3, 1))
    mask = jnp.zeros(3, bool)  # nothing covered
    pre = preintegrate(ts, gyro, acc, mask, 0.5, 0.5, jnp.zeros(6), params)
    assert float(pre.Delta_t) == 0.0
    W = sqrt_information(pre)
    assert bool(jnp.isfinite(W).all())
    assert float(jnp.abs(W).max()) == 0.0
