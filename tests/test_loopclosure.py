"""Loop-closure tests: BoW retrieval discrimination, 4-DoF/6-DoF pose-graph
optimization removing injected drift, health checks + switching state
machine, global-map re-projection, and loop detection on rendered revisits.

(The reference ships no pose_graph tests at all — SURVEY.md §4 — this is
new coverage.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.cameras import make_camera, NCameraSystem
from svin_tpu.kinematics import Transformation, from_rq, compose, quaternion as quat
from svin_tpu.loopclosure import (
    GlobalMap,
    KeyframeDatabase,
    LoopCloser,
    PoseGraphEdges,
    PoseGraphNodes,
    PoseGraph6Edges,
    PoseGraph6Nodes,
    SwitchingEstimator,
    TrackingState,
    check_health,
    matrix_to_ypr,
    normalize_angle,
    optimize_4dof,
    optimize_6dof,
    ypr_to_matrix,
)
from svin_tpu.ops import descriptor as desc_ops, detection
from svin_tpu.pipeline.config import HealthConfig, VioConfig
from svin_tpu.pipeline.dataset import SyntheticRenderer
from svin_tpu import sim


def _render_setup():
    cam = make_camera(200, 150, 160.0, 160.0, 100.0, 75.0, model="none")
    rig = NCameraSystem()
    rig.add_camera(from_rq([0, 0, 0], [0, 0, 0, 1]), cam)
    renderer = SyntheticRenderer(
        rig, n_points=300, seed=5, spread=6.0, depth_offset=3.0
    )
    return cam, rig, renderer


def _describe_frame(img):
    kp = detection.detect(img, max_keypoints=200)
    d = desc_ops.describe(img, kp.uv, kp.angle, kp.valid)
    return kp, d


def test_retrieval_same_place_scores_higher():
    cam, rig, renderer = _render_setup()
    db = KeyframeDatabase()
    poses = [sim.pose(renderer.traj, jnp.float64(t)) for t in (0.0, 0.9, 1.7)]
    for T in poses:
        img = jnp.asarray(renderer._render_jit(T, 0))
        kp, d = _describe_frame(img)
        db.add(d, kp.valid)
    # query with a slightly perturbed revisit of pose 0
    T_re = Transformation(
        r=poses[0].r + jnp.array([0.03, -0.02, 0.01]), q=poses[0].q
    )
    img = jnp.asarray(renderer._render_jit(T_re, 0))
    kp, d = _describe_frame(img)
    idx, scores = db.query(d, kp.valid, top_k=3, exclude_after=3)
    assert idx[0] == 0, (idx, scores)
    assert scores[0] > 1.5 * scores[-1], scores


def _make_drifted_graph(N=40, drift_per_step=np.array([0.02, 0.01, 0.0]), yaw_drift=0.004):
    """Ground truth: circle; odometry: accumulating drift; one loop edge."""
    dtype = jnp.float64
    t_gt = np.stack([
        np.array([np.cos(2 * np.pi * k / N), np.sin(2 * np.pi * k / N), 0.1 * np.sin(4 * np.pi * k / N)])
        for k in range(N)
    ]) * 3.0
    yaw_gt = np.array([2 * np.pi * k / N + np.pi / 2 for k in range(N)])
    # drifted odometry poses
    p_od = t_gt + np.arange(N)[:, None] * drift_per_step
    yaw_od = yaw_gt + np.arange(N) * yaw_drift
    cap = 64
    nodes = PoseGraphNodes(
        p=jnp.zeros((cap, 3), dtype).at[:N].set(jnp.asarray(p_od)),
        yaw=jnp.zeros(cap, dtype).at[:N].set(jnp.asarray(yaw_od)),
        pitch=jnp.zeros(cap, dtype),
        roll=jnp.zeros(cap, dtype),
        valid=jnp.zeros(cap, bool).at[:N].set(True),
    )
    # edges: sequential from ODOMETRY rel (drift ~ what VIO would give);
    # for a fair test use GT relatives + one exact loop edge
    E = cap * 3
    ii, jj, ts, ys, ws, il, va = [], [], [], [], [], [], []

    def rel(i, j, p, yaw):
        R_i = np.asarray(ypr_to_matrix(jnp.float64(yaw[i]), 0.0, 0.0))
        return R_i.T @ (p[j] - p[i]), yaw[j] - yaw[i]

    for k in range(1, N):
        t_ij, y_ij = rel(k - 1, k, p_od, yaw_od)  # odometry constraints
        ii.append(k - 1); jj.append(k); ts.append(t_ij); ys.append(y_ij)
        ws.append(1.0); il.append(False); va.append(True)
    # loop edge 0 → N-1 with TRUE relative
    t_ij, y_ij = rel(0, N - 1, t_gt, yaw_gt)
    ii.append(0); jj.append(N - 1); ts.append(t_ij); ys.append(y_ij)
    ws.append(5.0); il.append(True); va.append(True)
    ne = len(ii)
    pad = E - ne
    edges = PoseGraphEdges(
        i=jnp.asarray(ii + [0] * pad, jnp.int32),
        j=jnp.asarray(jj + [0] * pad, jnp.int32),
        t_ij=jnp.asarray(np.concatenate([np.stack(ts), np.zeros((pad, 3))]), dtype),
        yaw_ij=jnp.asarray(np.array(ys + [0] * pad), dtype),
        weight=jnp.asarray(np.array(ws + [1] * pad), dtype),
        is_loop=jnp.asarray(il + [False] * pad),
        valid=jnp.asarray(va + [False] * pad),
    )
    return nodes, edges, t_gt, yaw_gt, N


def test_optimize_4dof_removes_drift():
    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    err_before = np.linalg.norm(np.asarray(nodes.p[N - 1]) - t_gt[N - 1])
    out = optimize_4dof(nodes, edges, jnp.int32(1), iters=10)  # node 0 fixed
    err_after = np.linalg.norm(np.asarray(out.p[N - 1]) - t_gt[N - 1])
    assert err_before > 0.5
    # node 0 anchored by damping; loop edge closes the gap at the far end
    assert err_after < 0.15 * err_before, (err_before, err_after)
    yaw_err = abs(normalize_angle(jnp.asarray(float(out.yaw[N - 1]) - yaw_gt[N - 1])))
    assert float(yaw_err) < 0.05


def test_optimize_6dof_removes_drift():
    dtype = jnp.float64
    N, cap = 30, 32
    t_gt = np.stack([
        np.array([np.cos(2 * np.pi * k / N), np.sin(2 * np.pi * k / N), 0.0])
        for k in range(N)
    ]) * 2.0
    q_gt = np.stack([
        np.asarray(quat.exp(jnp.array([0.0, 0.0, 2 * np.pi * k / N])))
        for k in range(N)
    ])
    drift = np.arange(N)[:, None] * np.array([0.015, -0.01, 0.005])
    p_od = t_gt + drift
    nodes = PoseGraph6Nodes(
        r=jnp.zeros((cap, 3), dtype).at[:N].set(jnp.asarray(p_od)),
        q=jnp.zeros((cap, 4), dtype).at[:, 3].set(1.0).at[:N].set(jnp.asarray(q_gt)),
        valid=jnp.zeros(cap, bool).at[:N].set(True),
    )
    ii, jj, ts, qs, va = [], [], [], [], []

    def rel(i, j, p, q):
        C_i = np.asarray(quat.to_rotation_matrix(jnp.asarray(q[i])))
        t = C_i.T @ (p[j] - p[i])
        qr = np.asarray(quat.multiply(quat.conjugate(jnp.asarray(q[i])), jnp.asarray(q[j])))
        return t, qr

    for k in range(1, N):
        t, qr = rel(k - 1, k, p_od, q_gt)
        ii.append(k - 1); jj.append(k); ts.append(t); qs.append(qr); va.append(True)
    t, qr = rel(0, N - 1, t_gt, q_gt)
    ii.append(0); jj.append(N - 1); ts.append(t); qs.append(qr); va.append(True)
    E = cap * 3
    pad = E - len(ii)
    W = jnp.tile(jnp.diag(jnp.asarray([20.0, 20, 20, 100, 100, 100], dtype)), (E, 1, 1))
    edges = PoseGraph6Edges(
        i=jnp.asarray(ii + [0] * pad, jnp.int32),
        j=jnp.asarray(jj + [0] * pad, jnp.int32),
        t_ij=jnp.asarray(np.concatenate([np.stack(ts), np.zeros((pad, 3))]), dtype),
        q_ij=jnp.asarray(
            np.concatenate([np.stack(qs), np.tile([0, 0, 0, 1.0], (pad, 1))]), dtype
        ),
        sqrt_info=W,
        valid=jnp.asarray(va + [False] * pad),
    )
    err_before = np.linalg.norm(np.asarray(nodes.r[N - 1]) - t_gt[N - 1])
    out = optimize_6dof(nodes, edges, jnp.int32(1), iters=8)
    err_after = np.linalg.norm(np.asarray(out.r[N - 1]) - t_gt[N - 1])
    assert err_after < 0.15 * err_before, (err_before, err_after)


def test_health_check_gates():
    cfg = HealthConfig(enable=True, min_keypoints=15, kps_per_quadrant=2)
    good = check_health(cfg, 40, np.array([10, 10, 10, 10]), 10, np.ones(40))
    assert good.healthy
    assert not check_health(cfg, 5, np.array([2, 1, 1, 1]), 0, np.ones(5)).healthy
    assert not check_health(cfg, 20, np.array([20, 0, 0, 0]), 0, np.ones(20)).healthy
    assert not check_health(cfg, 20, np.array([5, 5, 5, 5]), 80, np.ones(20)).healthy


def test_switching_estimator_state_machine():
    cfg = HealthConfig(enable=True, consecutive_keyframes=2)
    sw = SwitchingEstimator(cfg=cfg)
    from svin_tpu.loopclosure.switching import HealthStatus

    T_vio = Transformation(r=jnp.array([1.0, 0, 0]), q=quat.identity())
    T_prim = Transformation(r=jnp.array([5.0, 5, 0]), q=quat.identity())
    sw.add_primitive_pose(0.0, T_prim)
    # healthy keyframes → VIO
    for k in range(3):
        out = sw.add_keyframe(float(k), T_vio, HealthStatus(True))
    assert sw.state == TrackingState.TRACKING_VIO
    np.testing.assert_allclose(np.asarray(out.r), [1, 0, 0])
    # sustained failures → switch to primitive, re-anchored at the VIO pose
    for k in range(5):
        out = sw.add_keyframe(3.0 + k, T_vio, HealthStatus(False, "test"))
    assert sw.state == TrackingState.TRACKING_PRIMITIVE
    np.testing.assert_allclose(np.asarray(out.r), [1, 0, 0], atol=1e-9)
    # primitive moves 1m → robust pose follows
    sw.add_primitive_pose(9.0, Transformation(r=jnp.array([6.0, 5, 0]), q=quat.identity()))
    out = sw.robust_pose()
    np.testing.assert_allclose(np.asarray(out.r), [2, 0, 0], atol=1e-9)
    # recovery
    for k in range(3):
        out = sw.add_keyframe(10.0 + k, T_vio, HealthStatus(True))
    assert sw.state == TrackingState.TRACKING_VIO


def test_switching_on_vio_silence_timeout():
    """keyframe_wait_time (SwitchingEstimator.cpp:196-214): VIO keyframes
    going silent for longer than the wait time while primitive odometry
    keeps arriving must trigger the switch WITHOUT any unhealthy keyframe."""
    from svin_tpu.loopclosure.switching import HealthStatus

    cfg = HealthConfig(enable=True, consecutive_keyframes=2,
                       keyframe_wait_time=1.5)
    sw = SwitchingEstimator(cfg=cfg)
    T_vio = Transformation(r=jnp.array([1.0, 0, 0]), q=quat.identity())
    T_prim = Transformation(r=jnp.array([5.0, 5, 0]), q=quat.identity())
    sw.add_keyframe(0.0, T_vio, HealthStatus(True))
    assert sw.state == TrackingState.TRACKING_VIO
    # primitive poses within the wait window: no switch
    sw.add_primitive_pose(1.0, T_prim)
    assert sw.state == TrackingState.TRACKING_VIO
    # silence exceeds keyframe_wait_time → primitive takes over, re-anchored
    sw.add_primitive_pose(2.0, T_prim)
    assert sw.state == TrackingState.TRACKING_PRIMITIVE
    np.testing.assert_allclose(np.asarray(sw.robust_pose().r), [1, 0, 0],
                               atol=1e-9)
    # primitive moves; robust pose follows in the anchored frame
    sw.add_primitive_pose(
        2.5, Transformation(r=jnp.array([5.0, 6, 0]), q=quat.identity())
    )
    np.testing.assert_allclose(np.asarray(sw.robust_pose().r), [1, 1, 0],
                               atol=1e-9)


def test_global_map_update_after_loop():
    gm = GlobalMap()
    T0 = Transformation(r=jnp.zeros(3), q=quat.identity())
    pts = np.array([[0.0, 0.0, 3.0], [1.0, 0.5, 4.0]])
    gm.add_observations(0, T0, np.array([10, 11]), pts, np.array([0.5, 0.5]))
    # keyframe pose corrected by +1m in x → landmarks must follow
    T0c = Transformation(r=jnp.array([1.0, 0, 0]), q=quat.identity())
    n = gm.update_after_loop({0: T0c})
    assert n == 2
    out, _ = gm.point_cloud()
    np.testing.assert_allclose(out, pts + np.array([1.0, 0, 0]), atol=1e-9)


def test_loop_closer_detects_rendered_revisit(tmp_path):
    """Two passes over the same rendered scene: the second pass keyframes
    must retrieve + verify the first pass (end-to-end place recognition).
    Debug mode is on: every verification stage must write its viewable
    artifact (reference Keyframe.cpp:396-489 writes loop_candidates/,
    descriptor_matched/, pnp_verified/ pngs)."""
    from svin_tpu.pipeline.outputs import DebugOutputDirs

    cam, rig, renderer = _render_setup()
    cfg = VioConfig()
    cfg.loop_closure.min_correspondences = 12
    cfg.debug_mode = True
    closer = LoopCloser(cam, cfg)
    closer.debug = DebugOutputDirs(str(tmp_path / "dbg"))
    # monkeypatch recency exclusion (sequence is short)
    import svin_tpu.loopclosure.loop_closure as lc_mod

    old_excl = lc_mod.RECENCY_EXCLUSION
    lc_mod.RECENCY_EXCLUSION = 5
    try:
        poses = []
        for k in range(8):
            t = 0.25 * k
            poses.append(sim.pose(renderer.traj, jnp.float64(t)))
        # revisit pose 0 (slightly moved) at the end
        revisit = Transformation(
            r=poses[0].r + jnp.array([0.05, -0.03, 0.02]), q=poses[0].q
        )
        poses.append(revisit)
        found = []
        lms = np.asarray(renderer.points_W, float)
        for k, T in enumerate(poses):
            img = np.asarray(renderer._render_jit(T, 0))
            kp, d = _describe_frame(jnp.asarray(img))
            # keyframe export with TRUE 3D points observed (project + select)
            from svin_tpu.cameras import project
            from svin_tpu.kinematics import inverse, transform_point

            p_C = transform_point(inverse(T), jnp.asarray(lms))
            uv, ok = project(cam, p_C)
            okn = np.asarray(ok)
            # associate detected keypoints to nearest projected landmark
            uvn = np.asarray(uv)
            kuv = np.asarray(kp.uv)
            ids, pts3, uv2 = [], [], []
            for q in np.nonzero(np.asarray(kp.valid))[0]:
                d2 = np.sum((uvn - kuv[q]) ** 2, axis=1)
                d2[~okn] = 1e9
                j = int(np.argmin(d2))
                if d2[j] < 4.0:
                    ids.append(j)
                    pts3.append(lms[j])
                    uv2.append(kuv[q])
            export = {
                "kf_index": k,
                "timestamp": 0.25 * k,
                "image": img,
                "T_WC_r": np.asarray(T.r),
                "T_WC_q": np.asarray(T.q),
                "points_W": np.stack(pts3),
                "landmark_ids": np.asarray(ids),
                "keypoints_uv": np.stack(uv2),
                "quality": np.full(len(ids), 0.5),
                "num_tracked": len(ids),
                "quadrant_counts": np.array([5, 5, 5, 5]),
                "response_strengths": np.ones(len(ids)),
            }
            loop = closer.add_keyframe(export)
            if loop is not None:
                found.append(loop)
        assert found, "no loop detected on revisit"
        assert found[-1].match_index <= 2
        assert found[-1].num_inliers >= 12
        # rel_t should be small (revisit is ~6 cm away)
        assert np.linalg.norm(found[-1].rel_t) < 0.5
        # every debug stage wrote a viewable png at its stage
        for sub, prefix in (
            ("loop_candidates", "loop_candidate"),
            ("descriptor_matched", "descriptor_match"),
            ("pnp_verified", "pnp_verified"),
        ):
            pngs = list((tmp_path / "dbg" / sub).glob(f"{prefix}_*.png"))
            assert pngs, f"no {sub} artifacts written"
    finally:
        lc_mod.RECENCY_EXCLUSION = old_excl


def test_loop_closes_under_90deg_5m_drift():
    """Loop verification must work under ARBITRARY drift: the revisit
    keyframe arrives with 90° yaw + ~5 m of injected VIO drift (its pose
    AND its landmark map are drifted together, as real drift does). The
    seed-free P3P RANSAC solves the old camera's pose in the drifted frame
    with no prior, the drift cancels out of the relative transform, and
    the drift correction recovers the true pose. The reference can do this
    because cv::solvePnPRansac needs no seed (Keyframe.cpp:308-380) — a
    prior-seeded GN solver would start 90° outside its basin."""
    cam, rig, renderer = _render_setup()
    cfg = VioConfig()
    cfg.loop_closure.min_correspondences = 12
    # large abrupt drift is exactly what the reference's fast_relocalization
    # exists for (PoseGraph::updateKeyFrameLoop): the verified loop edge
    # re-anchors the drift IMMEDIATELY instead of waiting for the Huber-
    # weighted graph equilibrium to absorb 5 m through sequential edges
    cfg.fast_relocalization = True
    closer = LoopCloser(cam, cfg)
    import svin_tpu.loopclosure.loop_closure as lc_mod
    from svin_tpu.cameras import project
    from svin_tpu.kinematics import inverse, transform_point, npq

    old_excl = lc_mod.RECENCY_EXCLUSION
    lc_mod.RECENCY_EXCLUSION = 5
    try:
        poses = [
            sim.pose(renderer.traj, jnp.float64(0.25 * k)) for k in range(8)
        ]
        revisit_true = Transformation(
            r=poses[0].r + jnp.array([0.05, -0.03, 0.02]), q=poses[0].q
        )
        # drift ACCUMULATES along the sequence (as real VIO drift does):
        # keyframe k carries k/8 of the full 90° yaw + 5 m drift, so each
        # sequential pose-graph edge inherits a small error while the
        # loop pair (kf 8 vs kf 0) faces the full 90°/5 m offset.
        yaw_full = np.pi / 2
        td_full = np.array([3.0, -3.0, 2.0])
        lms = np.asarray(renderer.points_W, float)
        found = []
        for k, T in enumerate(poses + [revisit_true]):
            img = np.asarray(renderer._render_jit(T, 0))
            kp, d = _describe_frame(jnp.asarray(img))
            p_C = transform_point(inverse(T), jnp.asarray(lms))
            uv, ok = project(cam, p_C)
            okn, uvn, kuv = np.asarray(ok), np.asarray(uv), np.asarray(kp.uv)
            ids, pts3, uv2 = [], [], []
            for q in np.nonzero(np.asarray(kp.valid))[0]:
                d2 = np.sum((uvn - kuv[q]) ** 2, axis=1)
                d2[~okn] = 1e9
                j = int(np.argmin(d2))
                if d2[j] < 4.0:
                    ids.append(j)
                    pts3.append(lms[j])
                    uv2.append(kuv[q])
            pts3 = np.stack(pts3)
            T_r, T_q = np.asarray(T.r), np.asarray(T.q)
            frac = k / 8.0
            yawk = yaw_full * frac
            Rk = np.array(
                [
                    [np.cos(yawk), -np.sin(yawk), 0.0],
                    [np.sin(yawk), np.cos(yawk), 0.0],
                    [0.0, 0.0, 1.0],
                ]
            )
            tk = td_full * frac
            if k > 0:  # drifted pose + locally-consistent drifted map
                pts3 = pts3 @ Rk.T + tk
                T_r = Rk @ T_r + tk
                T_q = npq.normalize(
                    npq.multiply(npq.from_rotation_matrix(Rk), T_q)
                )
            if k == 8:
                Rd, td = Rk, tk  # full drift (for the final assertion)
            export = {
                "kf_index": k,
                "timestamp": 0.25 * k,
                "image": img,
                "T_WC_r": T_r,
                "T_WC_q": T_q,
                "points_W": pts3,
                "landmark_ids": np.asarray(ids),
                "keypoints_uv": np.stack(uv2),
                "quality": np.full(len(ids), 0.5),
                "num_tracked": len(ids),
                "quadrant_counts": np.array([5, 5, 5, 5]),
                "response_strengths": np.ones(len(ids)),
            }
            loop = closer.add_keyframe(export)
            if loop is not None:
                found.append((k, loop))
        assert found, "no loop detected on the drifted revisit"
        k_loop, loop = found[-1]
        assert k_loop == 8
        assert loop.num_inliers >= 12
        # drift cancels from the relative transform: rel pose ≈ the true
        # (small) revisit offset, NOT the 90°/5 m drift
        assert abs(np.degrees(loop.rel_yaw)) < 15.0, loop.rel_yaw
        assert np.linalg.norm(loop.rel_t) < 1.0, loop.rel_t
        # and the drift correction recovers the true revisit pose
        T_dr = Transformation(
            r=Rd @ np.asarray(revisit_true.r) + td,
            q=npq.normalize(
                npq.multiply(
                    npq.from_rotation_matrix(Rd), np.asarray(revisit_true.q)
                )
            ),
        )
        T_cor = closer.apply_drift(T_dr)
        err_cor = np.linalg.norm(
            np.asarray(T_cor.r) - np.asarray(revisit_true.r)
        )
        # the injected drift was ~5.2 m; fast relocalization re-anchors on
        # the verified loop, so the correction recovers the true pose
        assert err_cor < 1.0, err_cor
    finally:
        lc_mod.RECENCY_EXCLUSION = old_excl


def test_product_retrieval_recall():
    """Recall benchmark (VERDICT r1 missing #4): recall@4 of the 65k-word
    product-quantized database on rendered revisits, against brute-force
    descriptor-set ground truth. The PQ database must match or beat the
    1024-word flat codebook, and the device scoring path must agree with
    the host path."""
    from svin_tpu.loopclosure.retrieval import (
        KeyframeDatabase,
        ProductKeyframeDatabase,
        score_packed_device,
    )
    from svin_tpu.ops import hamming

    cam, rig, renderer = _render_setup()
    n_base = 10
    times = [0.21 * k for k in range(n_base)]
    base = []
    for t in times:
        T = sim.pose(renderer.traj, jnp.float64(t))
        img = jnp.asarray(renderer._render_jit(T, 0))
        kp, d = _describe_frame(img)
        base.append((d, kp.valid))
    queries = []
    for t in times:
        T = sim.pose(renderer.traj, jnp.float64(t))
        T = Transformation(
            r=T.r + jnp.array([0.05, -0.03, 0.02]), q=T.q
        )
        img = jnp.asarray(renderer._render_jit(T, 0))
        kp, d = _describe_frame(img)
        queries.append((d, kp.valid))

    # brute-force ground truth: the base frame with the most mutual
    # low-Hamming descriptor matches
    def brute_best(qd, qv):
        best, best_n = -1, -1
        for i, (bd, bv) in enumerate(base):
            res = hamming.match_descriptors_jit(
                qd, bd, qv, bv, max_distance=60, mutual=True
            )
            n = int(jax.device_get(res.valid).sum())
            if n > best_n:
                best, best_n = i, n
        return best

    gt = [brute_best(qd, qv) for qd, qv in queries]
    # sanity: the rendered revisit really is most similar to its source
    assert sum(int(g == k) for k, g in enumerate(gt)) >= n_base - 2

    pq_db = ProductKeyframeDatabase()
    flat_db = KeyframeDatabase()
    for d, v in base:
        pq_db.add(d, v)
        flat_db.add(d, v)

    def recall_at4(db):
        hits = 0
        for (qd, qv), g in zip(queries, gt):
            idx, _ = db.query(qd, qv, top_k=4, exclude_after=n_base)
            hits += int(g in set(int(i) for i in idx))
        return hits / len(queries)

    r_pq = recall_at4(pq_db)
    r_flat = recall_at4(flat_db)
    assert r_pq >= 0.8, (r_pq, r_flat)
    assert r_pq >= r_flat - 1e-9, (r_pq, r_flat)

    # device scoring path == host scoring path
    qd, qv = queries[0]
    q_ids, q_w = pq_db.bow(qd, qv)
    db_ids, db_w = pq_db.packed_device()
    s_dev = np.asarray(
        score_packed_device(
            jnp.asarray(q_ids), jnp.asarray(q_w), db_ids, db_w
        )
    )
    s_host = pq_db.scores_range((q_ids, q_w), 0, pq_db.count)
    np.testing.assert_allclose(s_dev, s_host, atol=1e-5)


def test_trained_vocabulary_improves_quantization():
    """k-medoids refinement must reduce mean descriptor→centroid Hamming
    distance vs the random codebook (better words → better BoW)."""
    from svin_tpu.loopclosure.retrieval import make_vocabulary, train_vocabulary
    from svin_tpu.ops import hamming as H

    cam, rig, renderer = _render_setup()
    descs = []
    for t in (0.0, 0.7, 1.4):
        img = jnp.asarray(renderer._render_jit(sim.pose(renderer.traj, jnp.float64(t)), 0))
        kp, d = _describe_frame(img)
        descs.append(np.asarray(d)[np.asarray(kp.valid)])
    train = jnp.asarray(np.concatenate(descs))
    vocab0 = make_vocabulary(size=128)
    vocab1 = train_vocabulary(train, size=128, iters=6)
    d0 = np.asarray(H.hamming_matrix_ref(train, vocab0)).min(axis=1).mean()
    d1 = np.asarray(H.hamming_matrix_ref(train, vocab1)).min(axis=1).mean()
    assert d1 < d0 * 0.8, (d0, d1)
    # trained vocab plugs into the database unchanged
    from svin_tpu.loopclosure import KeyframeDatabase

    db = KeyframeDatabase(vocab=vocab1)
    idx = db.add(train[:100], jnp.ones(100, bool))
    assert idx == 0


def test_fast_relocalization_drift_update():
    """PoseGraph::updateKeyFrameLoop analog: one verified loop constraint
    immediately re-anchors the drift so the current pose lands at the old
    keyframe's corrected pose composed with the relative transform."""
    from svin_tpu.loopclosure.loop_closure import LoopInfo, LoopKeyframe

    cam = make_camera(200, 150, 160.0, 160.0, 100.0, 75.0, model="none")
    cfg = VioConfig()
    cfg.fast_relocalization = True
    closer = LoopCloser(cam, cfg)
    dtype = closer._dtype

    # old keyframe node at its corrected ("world") pose
    p_old = np.array([1.0, 2.0, 0.5])
    yaw_old = 0.3
    closer.nodes.p[0] = p_old
    closer.nodes.yaw[0] = yaw_old
    closer.nodes.valid[0] = True
    z8 = jnp.zeros((8, 8), jnp.uint32)

    def mk_kf(idx, r, yaw):
        q = quat.from_rotation_matrix(ypr_to_matrix(jnp.asarray(yaw), 0.0, 0.0))
        return LoopKeyframe(
            index=idx, timestamp=float(idx),
            T_WC_vio=Transformation(r=jnp.asarray(r, dtype), q=q),
            points_W=np.zeros((0, 3)), point_uv=np.zeros((0, 2)),
            window_desc=z8, window_valid=jnp.zeros(8, bool),
            extra_uv=jnp.zeros((8, 2)), extra_desc=z8,
            extra_valid=jnp.zeros(8, bool),
        )

    # current keyframe: drifted VIO pose (true pose differs by dyaw + dt)
    closer.keyframes = [
        mk_kf(0, [9.0, 9.0, 9.0], 0.0),  # VIO pose of old kf (unused here)
        mk_kf(1, [4.0, 1.0, 0.2], 0.1),  # drifted VIO pose of current kf
    ]
    rel_t = np.array([0.5, -0.2, 0.1])  # old→cur in old's ypr frame
    rel_yaw = 0.15
    loop = LoopInfo(
        query_index=1, match_index=0, num_inliers=30,
        rel_t=rel_t, rel_yaw=rel_yaw,
    )
    closer._fast_relocalize(loop)
    # expected corrected current pose
    R_old = np.asarray(ypr_to_matrix(jnp.asarray(yaw_old), 0.0, 0.0))
    p_expect = R_old @ rel_t + p_old
    T_cor = closer.apply_drift(closer.keyframes[1].T_WC_vio)
    np.testing.assert_allclose(np.asarray(T_cor.r), p_expect, atol=1e-9)
    yaw_cor = float(matrix_to_ypr(quat.to_rotation_matrix(T_cor.q))[0])
    assert abs(normalize_angle(yaw_cor - (yaw_old + rel_yaw))) < 1e-9

    # out-of-gate loops must not touch the drift
    yaw_before, t_before = closer.yaw_drift, closer.t_drift.copy()
    bad = LoopInfo(
        query_index=1, match_index=0, num_inliers=30,
        rel_t=np.array([25.0, 0.0, 0.0]), rel_yaw=0.0,
    )
    closer._fast_relocalize(bad)
    assert closer.yaw_drift == yaw_before
    np.testing.assert_array_equal(closer.t_drift, t_before)


def test_loopcloser_health_gate_and_switching():
    """LoopClosure::run analog: unhealthy keyframes feed the switching
    estimator but are not processed for loop closure; sustained failures
    switch the robust pose to re-anchored primitive odometry."""
    cam = make_camera(200, 150, 160.0, 160.0, 100.0, 75.0, model="none")
    cfg = VioConfig()
    cfg.health.enable = True
    cfg.health.min_keypoints = 10
    cfg.health.consecutive_keyframes = 1  # switch after 1+3 failures
    closer = LoopCloser(cam, cfg)
    rng = np.random.RandomState(0)
    img = rng.rand(150, 200).astype(np.float32)

    def export(t, tracked, r):
        n = max(tracked, 1)
        return {
            "kf_index": int(t * 10),
            "timestamp": t,
            "image": img,
            "T_WC_r": np.asarray(r, float),
            "T_WC_q": np.array([0.0, 0.0, 0.0, 1.0]),
            "points_W": rng.rand(n, 3) + np.array([0, 0, 3.0]),
            "landmark_ids": np.arange(n),
            "keypoints_uv": rng.rand(n, 2) * [200, 150],
            "quality": np.ones(n),
            "num_tracked": tracked,
            "num_new": 3,
            "quadrant_counts": np.array([9, 9, 9, 9]),
            "response_strengths": np.ones(n),
            "covisibilities": {},
        }

    from svin_tpu.kinematics import Transformation as T

    ident = np.array([0.0, 0.0, 0.0, 1.0])
    closer.add_primitive_pose(0.0, T(r=jnp.array([5.0, 0, 0]), q=jnp.asarray(ident)))
    closer.add_keyframe(export(0.0, tracked=50, r=[0, 0, 0]))
    assert len(closer.keyframes) == 1
    assert closer.switching.state == TrackingState.TRACKING_VIO

    # 4 consecutive unhealthy keyframes -> gated out + switch to primitive
    for k in range(1, 5):
        closer.add_primitive_pose(
            float(k), T(r=jnp.array([5.0 + 0.1 * k, 0, 0]), q=jnp.asarray(ident))
        )
        closer.add_keyframe(export(float(k), tracked=2, r=[0.01 * k, 0, 0]))
    assert len(closer.keyframes) == 1  # all gated
    assert closer.switching.state == TrackingState.TRACKING_PRIMITIVE
    assert any("VIO->PRIMITIVE" in m for _, m in closer.switching.switch_log)

    # robust pose = anchored primitive: continuous at the switch, then
    # following primitive increments
    t0, r0, q0 = closer.robust_trajectory[-1]
    closer.add_primitive_pose(5.0, T(r=jnp.array([5.6, 0, 0]), q=jnp.asarray(ident)))
    rp = closer.switching.robust_pose()
    # primitive advanced 0.2 beyond the switch-time primitive (5.4 -> 5.6)
    assert abs(float(rp.r[0]) - (r0[0] + 0.2)) < 1e-9

    # recovery: healthy keyframes switch back to VIO
    for k in range(6, 8):
        closer.add_keyframe(export(float(k), tracked=50, r=[0.05 * k, 0, 0]))
    assert closer.switching.state == TrackingState.TRACKING_VIO
    assert len(closer.keyframes) == 3


def test_frustum_ply_export(tmp_path):
    """Frustum + loop-edge line-set export (CameraPoseVisualization analog)."""
    import jax.numpy as jnp

    from svin_tpu.kinematics import Transformation
    from svin_tpu.loopclosure import frustum_lines, save_frustums_ply

    poses = {
        i: Transformation(
            r=jnp.array([float(i), 0.0, 0.0]), q=jnp.array([0, 0, 0, 1.0])
        )
        for i in range(3)
    }
    lines = frustum_lines(poses[1], scale=0.5)
    assert len(lines) == 8
    # optical-center connector starts at the camera center
    np.testing.assert_allclose(lines[4][0], [1.0, 0.0, 0.0], atol=1e-12)
    out = tmp_path / "kf.ply"
    save_frustums_ply(str(out), poses, loop_edges=[(0, 2), (0, 99)])
    text = out.read_text().splitlines()
    n_vert = int(next(l for l in text if l.startswith("element vertex")).split()[-1])
    n_edge = int(next(l for l in text if l.startswith("element edge")).split()[-1])
    # 3 frusta x 8 segments + 1 valid loop edge (edge to missing kf 99 dropped)
    assert n_edge == 3 * 8 + 1
    assert n_vert == 2 * n_edge
    assert len(text) == text.index("end_header") + 1 + n_vert + n_edge


def test_loopcloser_6dof_mode_corrects_pitch_drift():
    """pgo_mode="6dof" runs the full-SE(3) pose graph
    (optimize6DoFPoseGraph analog) and extracts a full-rotation drift —
    a pitch error the 4-DoF mode cannot represent must be corrected."""
    from svin_tpu.loopclosure.loop_closure import LoopInfo, LoopKeyframe

    cam = make_camera(200, 150, 160.0, 160.0, 100.0, 75.0, model="none")
    cfg = VioConfig()
    cfg.loop_closure.pgo_mode = "6dof"
    closer = LoopCloser(cam, cfg)
    dtype = closer._dtype
    z8 = jnp.zeros((8, 8), jnp.uint32)

    def mk_kf(idx, r, q):
        return LoopKeyframe(
            index=idx, timestamp=float(idx),
            T_WC_vio=Transformation(
                r=jnp.asarray(r, dtype), q=jnp.asarray(q, dtype)
            ),
            points_W=np.zeros((0, 3)), point_uv=np.zeros((0, 2)),
            window_desc=z8, window_valid=jnp.zeros(8, bool),
            extra_uv=jnp.zeros((8, 2)), extra_desc=z8,
            extra_valid=jnp.zeros(8, bool),
        )

    # ground truth: kf0 at a generic pose, kf1 offset with full 3D rotation
    R0 = np.asarray(ypr_to_matrix(jnp.asarray(0.3), jnp.asarray(0.1), jnp.asarray(-0.05)))
    q0 = np.asarray(quat.from_rotation_matrix(jnp.asarray(R0)))
    p0 = np.array([1.0, 2.0, 0.5])
    R1 = np.asarray(ypr_to_matrix(jnp.asarray(0.5), jnp.asarray(0.3), jnp.asarray(0.1)))
    q1 = np.asarray(quat.from_rotation_matrix(jnp.asarray(R1)))
    p1 = np.array([2.0, 1.5, 0.8])

    # VIO pose of kf1 is drifted by a PITCH rotation + translation
    Rd = np.asarray(ypr_to_matrix(jnp.asarray(0.0), jnp.asarray(0.15), jnp.asarray(0.0)))
    p1_vio = Rd @ p1 + np.array([0.4, -0.3, 0.25])
    q1_vio = np.asarray(
        quat.multiply(quat.from_rotation_matrix(jnp.asarray(Rd)), jnp.asarray(q1))
    )

    closer.keyframes = [mk_kf(0, p0, q0), mk_kf(1, p1_vio, q1_vio)]
    y0, pi0, ro0 = matrix_to_ypr(jnp.asarray(R0))
    R1v = np.asarray(quat.to_rotation_matrix(jnp.asarray(q1_vio)))
    y1, pi1, ro1 = matrix_to_ypr(jnp.asarray(R1v))
    closer.nodes.p[0] = p0
    closer.nodes.p[1] = p1_vio
    closer.nodes.yaw[0], closer.nodes.yaw[1] = float(y0), float(y1)
    closer.nodes.pitch[0], closer.nodes.pitch[1] = float(pi0), float(pi1)
    closer.nodes.roll[0], closer.nodes.roll[1] = float(ro0), float(ro1)
    closer.nodes.valid[0] = closer.nodes.valid[1] = True
    # verified loop with the TRUE full relative (old frame 0 → cur 1)
    rel_t_full = R0.T @ (p1 - p0)
    rel_q_full = np.asarray(
        quat.multiply(quat.conjugate(jnp.asarray(q0)), jnp.asarray(q1))
    )
    loop = LoopInfo(
        query_index=1, match_index=0, num_inliers=30,
        rel_t=rel_t_full, rel_yaw=0.2,
        rel_t_full=rel_t_full, rel_q_full=rel_q_full,
    )
    closer.earliest_loop_index = 0
    closer._add_loop_edge(loop)
    closer._optimize_and_update_drift()

    # node 1 must land on the ground truth (zero-residual single-edge solve)
    np.testing.assert_allclose(np.asarray(closer.nodes.p[1]), p1, atol=5e-3)
    R1_opt = np.asarray(
        ypr_to_matrix(closer.nodes.yaw[1], closer.nodes.pitch[1], closer.nodes.roll[1])
    )
    np.testing.assert_allclose(R1_opt, R1, atol=5e-3)
    # drift rotation must be non-yaw-only (pitch corrected)
    assert abs(closer.R_drift[2, 0]) > 0.05 or abs(closer.R_drift[2, 1]) > 0.05
    # applying the drift to the drifted VIO pose recovers ground truth
    T_cor = closer.apply_drift(closer.keyframes[1].T_WC_vio)
    np.testing.assert_allclose(np.asarray(T_cor.r), p1, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(quat.to_rotation_matrix(T_cor.q)), R1, atol=5e-3
    )


def test_vocabulary_save_load_roundtrip(tmp_path):
    """VocabularyBinary analog: persisted codebooks reload bit-identical and
    plug into the database."""
    from svin_tpu.loopclosure import load_vocabulary, make_vocabulary, save_vocabulary

    vocab = make_vocabulary(seed=3, size=256)
    path = str(tmp_path / "vocab.npy")
    save_vocabulary(path, vocab)
    back, w = load_vocabulary(path)
    assert w is None
    np.testing.assert_array_equal(np.asarray(vocab), np.asarray(back))
    db = KeyframeDatabase(vocab=back)
    db.add(vocab[:50], jnp.ones(50, bool))
    idx, scores = db.query(vocab[:50], jnp.ones(50, bool), top_k=1, exclude_after=1)
    assert idx[0] == 0 and scores[0] > 0.9


def test_vocabulary_idf_weights_roundtrip_and_scoring(tmp_path):
    """TF_IDF analog (DBoW2 default weighting): idf weights persist through
    save/load and change scoring so that a query dominated by a common word
    scores higher against a frame sharing its RARE word."""
    from svin_tpu.loopclosure import load_vocabulary, make_vocabulary, save_vocabulary
    from svin_tpu.loopclosure.retrieval import compute_idf

    vocab = make_vocabulary(seed=5, size=64)
    # corpus: word 0 appears in every document (common), word 1 in one (rare)
    docs = [
        (vocab[jnp.asarray([0, i + 2])], jnp.ones(2, bool)) for i in range(10)
    ] + [(vocab[jnp.asarray([0, 1])], jnp.ones(2, bool))]
    idf = compute_idf(docs, vocab)
    assert float(idf[1]) > float(idf[0])  # rare word weighs more

    path = str(tmp_path / "vocab_idf.npz")
    save_vocabulary(path, vocab, weights=idf)
    v2, w2 = load_vocabulary(path)
    np.testing.assert_array_equal(np.asarray(vocab), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(idf), np.asarray(w2))

    db = KeyframeDatabase(vocab=v2, weights=w2)
    db.add(vocab[jnp.asarray([0, 1])], jnp.ones(2, bool))  # shares rare word 1
    db.add(vocab[jnp.asarray([0, 2])], jnp.ones(2, bool))
    idx, scores = db.query(
        vocab[jnp.asarray([1, 3])], jnp.ones(2, bool), top_k=2, exclude_after=2
    )
    assert idx[0] == 0  # the rare-word match outranks the common-word one


def test_loop_closure_reduces_trajectory_error_e2e():
    """Full chain on rendered imagery: retrieval → Hamming match → PnP
    verification → 4-DoF pose graph → drift update. VIO poses carry
    synthetic accumulated translation drift; the revisit's loop edges carry
    the (GT-consistent) PnP relative, so the optimized keyframe path must be
    substantially closer to ground truth than the drifted VIO path."""
    cam, rig, renderer = _render_setup()
    cfg = VioConfig()
    cfg.loop_closure.min_correspondences = 12
    closer = LoopCloser(cam, cfg)
    import svin_tpu.loopclosure.loop_closure as lc_mod

    old_excl = lc_mod.RECENCY_EXCLUSION
    lc_mod.RECENCY_EXCLUSION = 5
    try:
        from svin_tpu.cameras import project
        from svin_tpu.kinematics import inverse, transform_point

        # 8 traverse keyframes + 3 revisits of the first three
        times = [0.25 * k for k in range(8)] + [0.0, 0.25, 0.5]
        lms = np.asarray(renderer.points_W, float)
        gt_p, vio_p = [], []
        drift_step = np.array([0.03, -0.02, 0.01])
        found = []
        for k, t in enumerate(times):
            T_gt = sim.pose(renderer.traj, jnp.float64(t))
            if k >= 8:  # revisit slightly offset
                T_gt = Transformation(
                    r=T_gt.r + jnp.array([0.04, -0.02, 0.01]), q=T_gt.q
                )
            d_k = k * drift_step
            T_vio = Transformation(r=T_gt.r + d_k, q=T_gt.q)
            img = np.asarray(renderer._render_jit(T_gt, 0))
            kp, dsc = _describe_frame(jnp.asarray(img))
            p_C = transform_point(inverse(T_gt), jnp.asarray(lms))
            uv, ok = project(cam, p_C)
            okn, uvn, kuv = np.asarray(ok), np.asarray(uv), np.asarray(kp.uv)
            ids, pts3, uv2 = [], [], []
            for q in np.nonzero(np.asarray(kp.valid))[0]:
                d2 = np.sum((uvn - kuv[q]) ** 2, axis=1)
                d2[~okn] = 1e9
                j = int(np.argmin(d2))
                if d2[j] < 4.0:
                    ids.append(j)
                    pts3.append(lms[j] + d_k)  # VIO's drifted map
                    uv2.append(kuv[q])
            export = {
                "kf_index": k,
                "timestamp": t + (10.0 if k >= 8 else 0.0),
                "image": img,
                "T_WC_r": np.asarray(T_vio.r),
                "T_WC_q": np.asarray(T_vio.q),
                "points_W": np.stack(pts3),
                "landmark_ids": np.asarray(ids),
                "keypoints_uv": np.stack(uv2),
                "quality": np.full(len(ids), 0.5),
                "num_tracked": len(ids),
                "quadrant_counts": np.array([5, 5, 5, 5]),
                "response_strengths": np.ones(len(ids)),
            }
            loop = closer.add_keyframe(export)
            if loop is not None:
                found.append(loop)
            gt_p.append(np.asarray(T_gt.r))
            vio_p.append(np.asarray(T_vio.r))
        assert found, "revisit did not close a loop"
        gt_p = np.stack(gt_p)
        vio_p = np.stack(vio_p)
        opt_p = closer.optimized_path()
        rmse_vio = np.sqrt(np.mean(np.sum((vio_p - gt_p) ** 2, axis=1)))
        rmse_opt = np.sqrt(np.mean(np.sum((opt_p - gt_p) ** 2, axis=1)))
        assert rmse_opt < 0.6 * rmse_vio, (rmse_vio, rmse_opt)
        # the drift correction must also pull NEW poses toward truth
        T_new = closer.apply_drift(
            Transformation(
                r=jnp.asarray(gt_p[-1] + len(times) * drift_step),
                q=sim.pose(renderer.traj, jnp.float64(0.5)).q,
            )
        )
        err_corr = np.linalg.norm(np.asarray(T_new.r) - gt_p[-1])
        err_raw = np.linalg.norm(len(times) * drift_step)
        assert err_corr < err_raw
    finally:
        lc_mod.RECENCY_EXCLUSION = old_excl


def test_train_vocabulary_cli(tmp_path):
    """apps.train_vocabulary end-to-end: EuRoC tree in → trained .npz
    vocabulary with idf weights out, loadable by LoopCloser via config."""
    root = tmp_path / "seq" / "mav0"
    (root / "imu0").mkdir(parents=True)
    (root / "cam0" / "data").mkdir(parents=True)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        f.write(f"{int(1e9)},0.0,0.0,0.0,0.0,0.0,9.81\n")
    rng = np.random.RandomState(1)
    for k in range(4):
        img = (rng.rand(96, 128) * 255).astype(np.uint8)
        np.save(root / "cam0" / "data" / f"{int(1e9 * (1 + 0.1 * k))}.npy", img)

    from svin_tpu.apps.train_vocabulary import main

    out = str(tmp_path / "vocab.npz")
    rc = main([str(tmp_path / "seq"), out, "--size", "64", "--stride", "1",
               "--iters", "2", "--max-keypoints", "64"])
    assert rc == 0

    from svin_tpu.loopclosure import load_vocabulary

    vocab, weights = load_vocabulary(out)
    assert vocab.shape == (64, 8) and weights.shape == (64,)

    from svin_tpu.pipeline.config import VioConfig

    cfg = VioConfig()
    cfg.loop_closure.vocabulary_file = out
    cam, _, _ = _render_setup()
    closer = LoopCloser(cam, cfg)
    assert closer.db.weights is not None


def test_capacity_growth_unbounded_keyframes():
    """The pose-graph arrays grow past the initial capacity (the reference's
    keyframe list is unbounded); nodes/edges stay consistent across growth."""
    cam, _, _ = _render_setup()
    cfg = VioConfig()
    closer = LoopCloser(cam, cfg, capacity=4)
    rng = np.random.RandomState(0)
    img = rng.rand(96, 128).astype(np.float32)
    for k in range(10):
        export = {
            "timestamp": 0.1 * k,
            "T_WC_r": np.array([0.1 * k, 0.0, 0.0]),
            "T_WC_q": np.array([0.0, 0.0, 0.0, 1.0]),
            "image": img,
            "keypoints_uv": rng.rand(20, 2) * [127, 95],
            "points_W": rng.rand(20, 3) * 4.0,
            "ids": np.arange(20),
            "quality": np.full(20, 0.5),
            "num_tracked": 20,
            "quadrant_counts": np.array([5, 5, 5, 5]),
            "response_strengths": np.ones(20),
        }
        closer.add_keyframe(export)
    assert len(closer.keyframes) == 10
    assert closer.capacity >= 10
    assert closer.nodes.valid[:10].all()
    assert not closer.nodes.valid[10:].any()
    # sequential edges: 1 + 2*(n-2) for back in (1,2)
    assert closer.n_edges == 1 + 2 * 8
    path = closer.optimized_path()
    assert path.shape == (10, 3)


def test_product_db_query_paths_agree():
    """Past DEVICE_QUERY_AT entries query_vector scores via the inverted
    file (DBoW2 IFRow analog); the dense host scan and the packed DEVICE
    program (query_vector_device) must agree rank-for-rank (VERDICT
    r2 #9)."""
    from svin_tpu.loopclosure.retrieval import ProductKeyframeDatabase

    rs = np.random.RandomState(1)
    N = ProductKeyframeDatabase.DEVICE_QUERY_AT + 200
    db = ProductKeyframeDatabase(capacity=2 * N)
    # rows carry UNIQUE word ids (the _sparse_bow invariant — np.unique):
    # random offset + coprime stride over the 65536-word ring
    off = rs.randint(0, 65536, (N, 1))
    db.word_ids[:N] = (off + np.arange(db.M)[None, :] * 127) % 65536
    w = rs.rand(N, db.M).astype(np.float32)
    db.word_w[:N] = w / w.sum(1, keepdims=True)
    db.count = N
    db.rebuild_index()
    q = (db.word_ids[3].copy(), db.word_w[3].copy())
    idx_inv, s_inv = db.query_vector(q, top_k=4, exclude_after=N - 60)
    idx_dev, s_dev = db.query_vector_device(q, top_k=4, exclude_after=N - 60)
    assert db._dev_ids is not None  # device path actually ran
    host = ProductKeyframeDatabase(capacity=2 * N)
    host.word_ids[:N] = db.word_ids[:N]
    host.word_w[:N] = db.word_w[:N]
    host.count = N
    host.DEVICE_QUERY_AT = 10**9  # force the dense host scan
    idx_h, s_h = host.query_vector(q, top_k=4, exclude_after=N - 60)
    assert list(idx_inv) == list(idx_h) == list(idx_dev)
    np.testing.assert_allclose(s_inv, s_h, atol=1e-5)
    np.testing.assert_allclose(s_dev, s_h, atol=1e-5)
    # incremental adds keep the inverted file coherent
    desc = rs.randint(0, 2**32, (40, 8)).astype(np.uint32)
    db.add(desc, np.ones(40, bool))
    idx2, s2 = db.query_vector(q, top_k=4, exclude_after=db.count)
    host.word_ids[: db.count] = db.word_ids[: db.count]
    host.word_w[: db.count] = db.word_w[: db.count]
    host.count = db.count
    idx2h, s2h = host.query_vector(q, top_k=4, exclude_after=host.count)
    assert list(idx2) == list(idx2h)
    np.testing.assert_allclose(s2, s2h, atol=1e-5)
