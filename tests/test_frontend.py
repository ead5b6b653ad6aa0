"""Triangulation + RANSAC tests (reference analogs: stereo_triangulation
checks in ProbabilisticStereoTriangulator, OpenGV sac problem usage in
Frontend.cpp:617-980)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.frontend import (
    absolute_pose_ransac,
    point_from_homogeneous,
    rotation_only_ransac,
    triangulate_fast,
)
from svin_tpu.kinematics import Transformation, oplus, quaternion as quat
from svin_tpu.kinematics.transformation import random as random_T


def test_triangulation_covariance_monte_carlo():
    """The closed-form Schur covariance of ``triangulation_covariance``
    (ProbabilisticStereoTriangulator::getUncertainty analog) must match the
    Monte-Carlo scatter of midpoint triangulations under ray noise + camera
    -center noise, and be depth-elongated for a narrow baseline."""
    from svin_tpu.frontend import triangulation_covariance

    rng = np.random.RandomState(0)
    p = np.array([0.3, -0.2, 6.0])
    c1 = np.zeros(3)
    c2 = np.array([0.4, 0.0, 0.0])
    sigma = 2e-3
    pose_sigma = 5e-3
    cov = np.asarray(
        triangulation_covariance(
            jnp.asarray(p), jnp.asarray(c1), jnp.asarray(c2),
            jnp.asarray(sigma), jnp.asarray(sigma),
            jnp.asarray(pose_sigma ** 2),
        )
    )
    # depth (z) must dominate lateral for a 0.4 m baseline at 6 m
    assert cov[2, 2] > 5 * cov[0, 0]
    assert cov[2, 2] > 5 * cov[1, 1]

    # Monte-Carlo: perturb rays (angular) and camera-2 center, re-triangulate
    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    N = 4000
    pts = []
    e1_0 = unit(p - c1)
    for _ in range(N):
        dc2 = c2 + pose_sigma * rng.randn(3)
        e1 = unit(e1_0 + sigma * rng.randn(3))
        e2 = unit(unit(p - dc2) + sigma * rng.randn(3))
        res = triangulate_fast(
            jnp.asarray(c1), jnp.asarray(e1), jnp.asarray(dc2),
            jnp.asarray(e2), jnp.asarray(1e-3),
        )
        pts.append(np.asarray(point_from_homogeneous(res.hp)))
    pts = np.stack(pts)
    emp = np.cov((pts - p).T)
    # factors ~2 agreement on the dominant (depth) axis
    assert 0.3 < cov[2, 2] / emp[2, 2] < 3.0, (cov[2, 2], emp[2, 2])


def test_triangulate_exact():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (50, 3), minval=-2, maxval=2) + jnp.array([0, 0, 5.0])
    p1 = jnp.zeros((50, 3))
    p2 = jnp.tile(jnp.array([0.2, 0.0, 0.0]), (50, 1))
    e1 = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    d2 = pts - p2
    e2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    res = triangulate_fast(p1, e1, p2, e2, jnp.full(50, 1e-3))
    assert bool(jnp.all(res.valid))
    assert not bool(jnp.any(res.parallel))
    np.testing.assert_allclose(point_from_homogeneous(res.hp), pts, atol=1e-5)


def test_triangulate_parallel_rays():
    e = jnp.array([[0.0, 0.0, 1.0]])
    res = triangulate_fast(
        jnp.zeros((1, 3)), e, jnp.array([[0.2, 0, 0]]), e, jnp.full(1, 1e-3)
    )
    assert bool(res.parallel[0])
    # same direction → still "valid" far point
    assert bool(res.valid[0])
    p = point_from_homogeneous(res.hp)[0]
    assert float(p[2]) > 1e4


def test_triangulate_diverging_invalid():
    res = triangulate_fast(
        jnp.zeros((1, 3)),
        jnp.array([[0.0, 0.0, 1.0]]),
        jnp.array([[0.2, 0.0, 0.0]]),
        jnp.array([[0.5, 0.0, -0.866]]),  # pointing backwards
        jnp.full(1, 1e-3),
    )
    assert not bool(res.valid[0])


def _bearing(T_WC, p_W):
    q_inv = quat.conjugate(T_WC.q)
    p_C = quat.rotate(q_inv, p_W - T_WC.r)
    return p_C / jnp.linalg.norm(p_C, axis=-1, keepdims=True)


def test_absolute_pose_ransac_with_outliers():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 60
    p_W = jax.random.uniform(k1, (N, 3), minval=-3, maxval=3) + jnp.array([0, 0, 6.0])
    T_true = Transformation(
        r=jnp.array([0.3, -0.2, 0.5]),
        q=quat.exp(jnp.array([0.05, 0.1, -0.08])),
    )
    bearings = _bearing(T_true, p_W)
    # 30% outliers: random directions
    n_out = 18
    rnd = jax.random.normal(k2, (n_out, 3))
    bearings = bearings.at[:n_out].set(rnd / jnp.linalg.norm(rnd, axis=-1, keepdims=True))
    prior = oplus(T_true, jnp.array([0.1, -0.1, 0.08, 0.05, -0.04, 0.06]))
    res = absolute_pose_ransac(
        k3, p_W, bearings, jnp.ones(N, bool), prior, num_hypotheses=50
    )
    assert bool(res.success)
    # outliers rejected, inliers kept
    inl = np.array(res.inliers)
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].sum() >= 0.9 * (N - n_out)
    assert float(jnp.linalg.norm(res.T.r - T_true.r)) < 0.02
    dq = quat.log(quat.multiply(quat.conjugate(res.T.q), T_true.q))
    assert float(jnp.linalg.norm(dq)) < 0.01


def test_absolute_pose_ransac_degenerate_returns_prior():
    key = jax.random.PRNGKey(4)
    N = 20
    p_W = jnp.zeros((N, 3))
    bearings = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
    prior = Transformation(r=jnp.array([1.0, 2.0, 3.0]), q=quat.identity())
    res = absolute_pose_ransac(
        key, p_W, bearings, jnp.zeros(N, bool), prior, num_hypotheses=8
    )
    assert not bool(res.success)
    np.testing.assert_allclose(res.T.r, prior.r)


def test_p3p_ransac_seed_free_recovery():
    """Closed-form P3P RANSAC (Grunert quartic via Durand–Kerner) recovers
    an arbitrary pose with 30% outliers and NO prior — the property loop
    verification needs under large drift (reference: unseeded
    cv::solvePnPRansac, Keyframe.cpp:308-380)."""
    from svin_tpu.frontend import absolute_pose_ransac_p3p

    rng = np.random.RandomState(7)
    N = 80
    q = quat.normalize(jnp.asarray(rng.randn(4)))
    t = jnp.asarray([3.0, -2.0, 1.0])
    P = jnp.asarray(rng.randn(N, 3) * 3 + np.array([0, 0, 8.0]))
    p_C = quat.rotate(quat.conjugate(q), P - t)
    f = p_C / jnp.linalg.norm(p_C, axis=-1, keepdims=True)
    f = f + 0.002 * rng.randn(N, 3)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    out = rng.randn(24, 3)
    f = f.at[:24].set(
        jnp.asarray(out / np.linalg.norm(out, axis=-1, keepdims=True))
    )
    rr = absolute_pose_ransac_p3p(
        jax.random.PRNGKey(1), P, f, jnp.ones(N, bool), 450.0
    )
    assert bool(rr.success)
    assert int(rr.num_inliers) >= 45
    assert float(jnp.linalg.norm(rr.T.r - t)) < 0.05
    dq = quat.log(quat.multiply(quat.conjugate(rr.T.q), q))
    assert float(jnp.linalg.norm(dq)) < 0.01
    # outliers must not be inliers of the recovered model
    assert np.asarray(rr.inliers)[:24].sum() <= 2


def test_rotation_only_ransac():
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 40
    dirs = jax.random.normal(k1, (N, 3))
    b_b = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    q_ab = quat.exp(jnp.array([0.1, -0.2, 0.3]))
    b_a = quat.rotate(q_ab, b_b)
    out = jax.random.normal(k2, (8, 3))
    b_a = b_a.at[:8].set(out / jnp.linalg.norm(out, axis=-1, keepdims=True))
    res = rotation_only_ransac(k3, b_a, b_b, jnp.ones(N, bool))
    assert bool(res.success)
    dq = quat.log(quat.multiply(quat.conjugate(res.T.q), q_ab))
    assert float(jnp.linalg.norm(dq)) < 5e-3
    assert np.array(res.inliers)[:8].sum() <= 1


def test_scale_refinement_recovers_scale():
    """Visual positions shrunk by 1/s_true must yield scale ≈ s_true and a
    gravity vector of ≈ 9.81 magnitude (Frontend.cpp:469-614 analog)."""
    from svin_tpu import sim
    from svin_tpu.frontend import ScaleRefiner
    from svin_tpu.imu import ImuParameters, preintegrate

    params = ImuParameters()
    traj = sim.default_trajectory()
    times = [0.3 + 0.35 * k for k in range(7)]
    series = sim.simulate_imu(
        traj, times[0] - 0.05, times[-1] + 0.05, 200.0, params,
        key=jax.random.PRNGKey(3), noisy=False,
    )
    s_true = 1.7
    r_SC = np.array([0.04, -0.01, 0.02])
    sr = ScaleRefiner(min_states=7, r_SC=r_SC)
    last_t = None
    for t in times:
        T = sim.pose(traj, t)
        C = np.asarray(quat.to_rotation_matrix(T.q))
        p_cam_metric = np.asarray(T.r) + C @ r_SC
        p_vis = p_cam_metric / s_true  # up-to-scale visual position
        if last_t is None:
            sr.add_state(C, p_vis)
        else:
            pre = preintegrate(
                series.t, series.gyro, series.acc,
                jnp.ones(series.t.shape, bool),
                jnp.asarray(last_t), jnp.asarray(t),
                jnp.zeros(6), params,
            )
            sr.add_state(
                C, p_vis,
                delta_p=np.asarray(pre.acc_doubleintegral),
                delta_v=np.asarray(pre.acc_integral),
                dt=float(pre.Delta_t),
            )
        last_t = t
    assert sr.refined
    est = sr.result
    assert abs(est.scale - s_true) < 0.05 * s_true, est.scale
    assert abs(est.gravity_norm - 9.81) < 0.15, est.gravity_norm


# ---------------------------------------------------------------------------
# Convex-hull keyframe heuristic (Frontend::doWeNeedANewKeyframe geometry,
# Frontend.cpp:265-332)
# ---------------------------------------------------------------------------


def test_convex_hull_square_with_interior():
    from svin_tpu.frontend.hull import convex_hull, polygon_area

    pts = np.array(
        [[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [3, 1]], float
    )
    hull = convex_hull(pts)
    assert hull.shape[0] == 4
    assert abs(polygon_area(hull) - 16.0) < 1e-12
    # collinear boundary point is dropped
    hull2 = convex_hull(np.vstack([pts, [[2, 0]]]))
    assert hull2.shape[0] == 4


def test_points_strictly_inside_excludes_boundary():
    from svin_tpu.frontend.hull import convex_hull, points_strictly_inside

    hull = convex_hull(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float))
    probe = np.array([[2, 2], [0, 0], [2, 0], [4.5, 2], [3.999, 3.999]])
    inside = points_strictly_inside(hull, probe)
    assert inside.tolist() == [True, False, False, False, True]


def test_keyframe_overlap_ratio_reference_semantics():
    from svin_tpu.frontend.hull import keyframe_overlap_ratio

    rng = np.random.default_rng(3)
    # all keypoints cover [0,100]^2; matches cover the central quarter
    pts_all = rng.uniform(0, 100, (200, 2))
    corners = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    pts_all = np.vstack([pts_all, corners])
    m = (np.abs(pts_all - 50.0) < 25.0).all(axis=1)
    overlap, ratio = keyframe_overlap_ratio([pts_all], [pts_all[m]])
    assert 0.15 < overlap < 0.35  # ~ (50/100)^2 with hull shrinkage
    # every point inside the matched hull IS a match here -> ratio ~ 1
    assert 0.8 < ratio <= 1.5
    # fewer than 3 matches -> camera skipped -> zeros
    overlap0, ratio0 = keyframe_overlap_ratio([pts_all], [pts_all[:2]])
    assert overlap0 == 0.0 and ratio0 == 0.0


def test_relative_pose_ransac_recovers_epipolar_geometry():
    """Prior-seeded relative-pose RANSAC (the Stewenius-5pt analog,
    Frontend.cpp:832-980): recover rotation + unit translation direction
    from bearing pairs with 30% outliers, seeded from a perturbed prior."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from svin_tpu.frontend import relative_pose_ransac
    from svin_tpu.kinematics import Transformation, quaternion as quat

    rng = np.random.RandomState(0)
    N = 120
    # scene points in frame A, depth 2-8
    p_A = np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(2, 8, (N, 1))], axis=1
    )
    # true relative pose A→B: p_B = R_BA (p_A - t_AB_inA)?  use convention
    # p_A = R_AB p_B + t_AB  (T_AB maps B-frame coords into A)
    q_true = np.asarray(quat.exp(jnp.asarray([0.06, -0.11, 0.18])))
    t_true = np.array([0.4, 0.15, -0.1])
    R_AB = np.asarray(quat.to_rotation_matrix(jnp.asarray(q_true)))
    p_B = (p_A - t_true) @ R_AB  # R_ABᵀ (p_A - t)
    bA = p_A / np.linalg.norm(p_A, axis=1, keepdims=True)
    bB = p_B / np.linalg.norm(p_B, axis=1, keepdims=True)
    # 30% outliers: scramble bB
    n_out = N * 3 // 10
    out_idx = rng.choice(N, n_out, replace=False)
    bB[out_idx] = rng.randn(n_out, 3)
    bB[out_idx] /= np.linalg.norm(bB[out_idx], axis=1, keepdims=True)
    # perturbed prior
    q_prior = np.asarray(
        quat.normalize(
            quat.multiply(quat.exp(jnp.asarray([0.03, 0.02, -0.04])), jnp.asarray(q_true))
        )
    )
    rr = relative_pose_ransac(
        jax.random.PRNGKey(1),
        jnp.asarray(bA), jnp.asarray(bB), jnp.ones(N, bool),
        Transformation(r=jnp.asarray(t_true + [0.1, -0.05, 0.1]), q=jnp.asarray(q_prior)),
        threshold_px=2.0, focal_px=450.0, num_hypotheses=32,
        min_inliers=30,
    )
    assert bool(rr.success)
    assert int(rr.num_inliers) >= N - n_out - 10
    # rotation error < 0.5 degree
    dq = np.asarray(quat.multiply(quat.conjugate(rr.T.q), jnp.asarray(q_true)))
    ang = 2 * np.arccos(min(1.0, abs(dq[3])))
    assert np.degrees(ang) < 0.5, np.degrees(ang)
    # translation direction error < 1.5 degree
    t_dir = np.asarray(rr.T.r)
    cosang = abs(t_dir @ (t_true / np.linalg.norm(t_true)))
    assert np.degrees(np.arccos(min(1.0, cosang))) < 1.5
