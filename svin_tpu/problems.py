"""Representative problem builders shared by tests, benchmarks, and the
driver entry points: a filled sliding-window estimation problem and a global
BA problem, both synthetic (analytic trajectory + landmark field).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import sim
from .cameras import NCameraSystem, make_camera, project
from .estimator import (
    WindowConfig,
    empty_factors,
    empty_window,
    rig_params,
)
from .imu import ImuParameters, preintegrate, sqrt_information
from .kinematics import compose, from_rq, inverse, transform_point, quaternion as quat

IMU_PARAMS = ImuParameters()


def euroc_like_rig() -> NCameraSystem:
    cam = make_camera(
        752, 480, 458.654, 457.296, 367.215, 248.375,
        dist_params=[-0.2834, 0.0739, 0.00019, 1.76e-05],
    )
    rig = NCameraSystem()
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [0, 0, 0, 1]), cam)
    rig.add_camera(from_rq([0.11, 0.0, 0.0], [0, 0, 0, 1]), cam)
    return rig


def build_window_problem(
    key,
    cfg: WindowConfig,
    n_landmarks: int = 64,
    dt_state: float = 0.4,
    pix_noise: float = 0.4,
    lm_perturb: float = 0.05,
    state_perturb: float = 0.02,
    imu_rate: float = 200.0,
    imu_noisy: bool = True,
    dtype=jnp.float64,
):
    """Synthetic filled (window, factors, rig_params, truth) — the
    TestEstimator.cpp analog problem."""
    S = cfg.num_states
    traj = sim.default_trajectory()
    rig = euroc_like_rig()
    rig_p = rig_params(rig, dtype)
    keys = jax.random.split(key, 8)

    times = jnp.arange(S) * dt_state + 0.3
    T_gt = [sim.pose(traj, t) for t in times]
    v_gt = [sim.velocity(traj, t) for t in times]

    center = transform_point(T_gt[S // 2], jnp.array([0.0, 0.0, 4.0]))
    lms = sim.landmark_grid(keys[0], n_landmarks, center, jnp.array([8.0, 8.0, 4.0]))

    window = empty_window(cfg, dtype, rig=rig_p)
    factors = empty_factors(cfg, dtype)

    r0 = jnp.stack([T.r for T in T_gt]).astype(dtype)
    q0 = jnp.stack([T.q for T in T_gt]).astype(dtype)
    sb0 = jnp.stack(
        [jnp.concatenate([v, jnp.zeros(6)]) for v in v_gt]
    ).astype(dtype)
    dp = state_perturb * jax.random.normal(keys[1], (S, 3), dtype)
    da = state_perturb * jax.random.normal(keys[2], (S, 3), dtype)
    dp = dp.at[0].set(0.0)
    da = da.at[0].set(0.0)
    window = window._replace(
        r=r0 + dp,
        q=quat.normalize(quat.multiply(quat.exp(da), q0)),
        speed_bias=sb0,
        state_valid=jnp.ones(S, bool),
        is_keyframe=jnp.ones(S, bool),
        timestamp=times.astype(dtype),
        state_id=jnp.arange(S, dtype=jnp.int32),
    )

    L = cfg.num_landmarks
    n_lm = min(n_landmarks, L)
    lm_noise = lm_perturb * jax.random.normal(keys[3], (n_lm, 3), dtype)
    window = window._replace(
        hp_W=window.hp_W.at[:n_lm, :3].set(lms[:n_lm] + lm_noise),
        lm_valid=window.lm_valid.at[:n_lm].set(True),
        lm_id=window.lm_id.at[:n_lm].set(jnp.arange(n_lm, dtype=jnp.int32)),
    )

    obs = []
    for s in range(S):
        for c in range(rig.num_cameras):
            T_WC = compose(T_gt[s], rig.T_SC[c])
            p_C = transform_point(inverse(T_WC), lms[:n_lm])
            uv, valid = project(rig.cameras[c], p_C)
            uvn = np.asarray(uv)
            for l in np.nonzero(np.asarray(valid))[0]:
                obs.append((s, int(l), c, uvn[l]))
    noise = pix_noise * jax.random.normal(keys[4], (len(obs), 2), dtype)
    f = factors.reproj
    n_obs = min(len(obs), cfg.num_obs)
    uv_arr = jnp.asarray(np.stack([o[3] for o in obs[:n_obs]]), dtype) + noise[:n_obs]
    f = f._replace(
        uv=f.uv.at[:n_obs].set(uv_arr),
        state_idx=f.state_idx.at[:n_obs].set(
            jnp.asarray([o[0] for o in obs[:n_obs]], jnp.int32)
        ),
        lm_idx=f.lm_idx.at[:n_obs].set(
            jnp.asarray([o[1] for o in obs[:n_obs]], jnp.int32)
        ),
        cam_idx=f.cam_idx.at[:n_obs].set(
            jnp.asarray([o[2] for o in obs[:n_obs]], jnp.int32)
        ),
        sqrt_info=f.sqrt_info.at[:n_obs].set(1.0 / max(pix_noise, 0.3)),
        valid=f.valid.at[:n_obs].set(True),
    )

    series = sim.simulate_imu(
        traj, float(times[0]) - 0.05, float(times[-1]) + 0.05, imu_rate,
        IMU_PARAMS, key=keys[5], noisy=imu_noisy,
    )
    imu = factors.imu
    pres = []
    for k in range(S - 1):
        pres.append(
            preintegrate(
                series.t.astype(dtype), series.gyro.astype(dtype),
                series.acc.astype(dtype),
                jnp.ones(series.t.shape, bool),
                times[k].astype(dtype), times[k + 1].astype(dtype),
                jnp.zeros(6, dtype), IMU_PARAMS,
            )
        )
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    sq = jax.vmap(sqrt_information)(pre_b)
    imu = imu._replace(
        pre=pre_b, sqrt_info=sq, valid=jnp.ones(S - 1, bool)
    )

    pr = factors.priors
    pr = pr._replace(
        pose_mean_r=pr.pose_mean_r.at[0].set(r0[0]),
        pose_mean_q=pr.pose_mean_q.at[0].set(q0[0]),
        pose_sqrt_info=pr.pose_sqrt_info.at[0].set(
            jnp.diag(jnp.asarray([1e4, 1e4, 1e4, 5.0, 5.0, 1e4], dtype))
        ),
        pose_valid=pr.pose_valid.at[0].set(True),
        sb_mean=pr.sb_mean.at[0].set(sb0[0]),
        sb_sqrt_info=pr.sb_sqrt_info.at[0].set(
            jnp.diag(
                jnp.concatenate([
                    jnp.full(3, 10.0, dtype),
                    jnp.full(3, 1.0 / IMU_PARAMS.sigma_bg, dtype),
                    jnp.full(3, 1.0 / IMU_PARAMS.sigma_ba, dtype),
                ])
            )
        ),
        sb_valid=pr.sb_valid.at[0].set(True),
    )

    factors = factors._replace(reproj=f, imu=imu, priors=pr)
    truth = {"r": r0, "q": q0, "sb": sb0, "lms": lms[:n_lm], "times": times, "rig": rig}
    return window, factors, rig_p, truth


def build_global_ba_problem(key, K: int = 64, L: int = 4096, O: int = 16384,
                            dtype=jnp.float32):
    """Synthetic global bundle-adjustment problem (fixed shapes, vectorized):
    K poses on a loop trajectory, L landmarks in a box, O observation slots
    (obs o → pose o % K, camera (o // K) % C, random landmark; invalid where
    the projection misses). Feeds the distributed-BA benchmarks and the
    "BA iters/s" headline of BASELINE.json."""
    from .parallel import GlobalMapProblem

    rig = euroc_like_rig()
    rig_p = rig_params(rig, dtype)
    C = rig.num_cameras
    traj = sim.default_trajectory()
    times = jnp.arange(K) * (4.0 / K) + 0.1

    def pose_at(t):
        T = sim.pose(traj, t)
        return T.r.astype(dtype), T.q.astype(dtype)

    pose_r, pose_q = jax.vmap(pose_at)(times)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    lms = sim.landmark_grid(
        k1, L, jnp.array([0.5, 0.5, 5.0]), jnp.array([10.0, 10.0, 4.0])
    ).astype(dtype)

    o = jnp.arange(O)
    obs_pose = (o % K).astype(jnp.int32)
    obs_cam = ((o // K) % C).astype(jnp.int32)
    obs_lm = jax.random.randint(k2, (O,), 0, L, dtype=jnp.int32)

    def project_one(pi, li, ci):
        T_WS = from_rq(pose_r[pi], pose_q[pi])
        T_WC = compose(T_WS, from_rq(rig_p.T_SC_r[ci], rig_p.T_SC_q[ci]))
        p_C = transform_point(inverse(T_WC), lms[li])
        uv, ok = project(rig.cameras[0], p_C)  # same intrinsics both cams
        return uv.astype(dtype), ok & (p_C[2] > 0.5)

    obs_uv, obs_valid = jax.vmap(project_one)(obs_pose, obs_lm, obs_cam)
    # observed-at-least-twice landmarks only (others stay but are damped)
    prob = GlobalMapProblem(
        pose_r=pose_r, pose_q=pose_q,
        pose_fixed=jnp.arange(K) < 2,
        lm=lms, lm_valid=jnp.ones(L, bool),
        obs_uv=jnp.where(obs_valid[:, None], obs_uv, 0.0),
        obs_pose=obs_pose, obs_lm=obs_lm, obs_cam=obs_cam,
        obs_valid=obs_valid,
    )
    return prob, rig_p


def build_global_ba_tracks(key, K: int = 2048, L: int = 65536,
                           span: int = 8, revisit_frac: float = 0.02,
                           dtype=jnp.float32):
    """Synthetic global BA problem with REALISTIC track structure: each
    landmark is born at a pose and observed by a contiguous run of up to
    ``span`` consecutive keyframes from every camera (how SLAM tracks
    actually look — the random-pose assignment of
    ``build_global_ba_problem`` has no temporal locality). A
    ``revisit_frac`` fraction of landmarks additionally gets one
    loop-closure re-observation from a much later pose (exercising the
    overflow path of ``parallel.tracks``). Observation count O =
    L * span * C slots, masked by projection validity."""
    from .parallel import GlobalMapProblem

    rig = euroc_like_rig()
    rig_p = rig_params(rig, dtype)
    C = rig.num_cameras
    traj = sim.default_trajectory()
    times = jnp.arange(K) * (4.0 / K) + 0.1

    def pose_at(t):
        T = sim.pose(traj, t)
        return T.r.astype(dtype), T.q.astype(dtype)

    pose_r, pose_q = jax.vmap(pose_at)(times)
    k1, k2, k3, k4 = jax.random.split(
        jax.random.PRNGKey(0) if key is None else key, 4)
    lms = sim.landmark_grid(
        k1, L, jnp.array([0.5, 0.5, 5.0]), jnp.array([10.0, 10.0, 4.0])
    ).astype(dtype)

    birth = jax.random.randint(k2, (L,), 0, K, dtype=jnp.int32)
    length = jax.random.randint(k3, (L,), 2, span + 1, dtype=jnp.int32)

    # slot grid (L, span, C)
    r_off = jnp.arange(span, dtype=jnp.int32)
    obs_pose = jnp.minimum(birth[:, None] + r_off[None, :], K - 1)  # (L,span)
    obs_pose = jnp.broadcast_to(obs_pose[:, :, None], (L, span, C))
    obs_lm = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[:, None, None], (L, span, C))
    obs_cam = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, None, :], (L, span, C))
    in_run = (r_off[None, :] < length[:, None]) & (
        birth[:, None] + r_off[None, :] < K)
    in_run = jnp.broadcast_to(in_run[:, :, None], (L, span, C))

    def project_one(pi, li, ci):
        T_WS = from_rq(pose_r[pi], pose_q[pi])
        T_WC = compose(T_WS, from_rq(rig_p.T_SC_r[ci], rig_p.T_SC_q[ci]))
        p_C = transform_point(inverse(T_WC), lms[li])
        uv, ok = project(rig.cameras[0], p_C)
        return uv.astype(dtype), ok & (p_C[2] > 0.5)

    flat = lambda a: a.reshape(-1)
    obs_uv, obs_valid = jax.vmap(project_one)(
        flat(obs_pose), flat(obs_lm), flat(obs_cam))
    obs_valid = obs_valid & flat(in_run)

    # loop-closure revisits: a later pose re-observes the landmark (cam 0)
    n_rev = max(1, int(L * revisit_frac))
    kr1, kr2 = jax.random.split(k4)
    rev_lm = jax.random.randint(kr1, (n_rev,), 0, L, dtype=jnp.int32)
    rev_pose = jnp.minimum(
        birth[rev_lm] + jax.random.randint(kr2, (n_rev,), K // 4, K // 2,
                                           dtype=jnp.int32), K - 1)
    rev_uv, rev_ok = jax.vmap(project_one)(
        rev_pose, rev_lm, jnp.zeros(n_rev, jnp.int32))

    prob = GlobalMapProblem(
        pose_r=pose_r, pose_q=pose_q,
        pose_fixed=jnp.arange(K) < 2,
        lm=lms, lm_valid=jnp.ones(L, bool),
        obs_uv=jnp.concatenate(
            [jnp.where(obs_valid[:, None], obs_uv, 0.0),
             jnp.where(rev_ok[:, None], rev_uv, 0.0)]),
        obs_pose=jnp.concatenate([flat(obs_pose), rev_pose]),
        obs_lm=jnp.concatenate([flat(obs_lm), rev_lm]),
        obs_cam=jnp.concatenate([flat(obs_cam), jnp.zeros(n_rev, jnp.int32)]),
        obs_valid=jnp.concatenate([obs_valid, rev_ok]),
    )
    return prob, rig_p
