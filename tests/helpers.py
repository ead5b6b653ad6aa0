"""Shared synthetic window-problem builder for estimator tests.

Builds the analog of the reference's ``TestEstimator.cpp`` setup as a filled
WindowState + Factors: S states along the analytic trajectory, a stereo rig,
a landmark field projected through ground-truth poses with pixel noise, noisy
IMU preintegrals between consecutive states, and gauge priors on state 0.
"""
import jax
import jax.numpy as jnp
import numpy as np

from svin_tpu import sim
from svin_tpu.cameras import NCameraSystem, make_camera, project
from svin_tpu.estimator import (
    WindowConfig,
    empty_factors,
    empty_window,
    rig_params,
)
from svin_tpu.imu import ImuParameters, preintegrate, sqrt_information
from svin_tpu.kinematics import (
    Transformation,
    compose,
    from_rq,
    inverse,
    transform_point,
    quaternion as quat,
)

IMU_PARAMS = ImuParameters()


def make_rig():
    cam = make_camera(
        752, 480, 458.654, 457.296, 367.215, 248.375,
        dist_params=[-0.2834, 0.0739, 0.00019, 1.76e-05],
    )
    rig = NCameraSystem()
    rig.add_camera(from_rq([0.0, 0.0, 0.0], [0, 0, 0, 1]), cam)
    rig.add_camera(from_rq([0.11, 0.0, 0.0], [0, 0, 0, 1]), cam)
    return rig


def build_problem(
    key,
    cfg: WindowConfig,
    n_landmarks: int = 64,
    n_states: int = None,
    dt_state: float = 0.4,
    pix_noise: float = 0.4,
    lm_perturb: float = 0.05,
    state_perturb: float = 0.02,
    imu_rate: float = 200.0,
    imu_noisy: bool = True,
):
    """Returns (window_init, factors, rig_p, truth dict)."""
    S = cfg.num_states if n_states is None else n_states
    traj = sim.default_trajectory()
    rig = make_rig()
    rig_p = rig_params(rig)
    keys = jax.random.split(key, 8)

    times = jnp.arange(S) * dt_state + 0.3
    T_gt = [sim.pose(traj, t) for t in times]
    v_gt = [sim.velocity(traj, t) for t in times]

    # landmarks in front of the rig (cameras look +z in body frame)
    center = transform_point(T_gt[S // 2], jnp.array([0.0, 0.0, 4.0]))
    lms = sim.landmark_grid(keys[0], n_landmarks, center, jnp.array([8.0, 8.0, 4.0]))

    window = empty_window(cfg, rig=rig_p)
    factors = empty_factors(cfg)

    # states: ground truth + perturbation
    r0 = jnp.stack([T.r for T in T_gt])
    q0 = jnp.stack([T.q for T in T_gt])
    sb0 = jnp.stack([jnp.concatenate([v, jnp.zeros(6)]) for v in v_gt])
    dp = state_perturb * jax.random.normal(keys[1], (S, 3))
    da = state_perturb * jax.random.normal(keys[2], (S, 3))
    # keep state 0 at ground truth (gauge)
    dp = dp.at[0].set(0.0)
    da = da.at[0].set(0.0)
    window = window._replace(
        r=window.r.at[:S].set(r0 + dp),
        q=window.q.at[:S].set(quat.normalize(quat.multiply(quat.exp(da), q0))),
        speed_bias=window.speed_bias.at[:S].set(sb0),
        state_valid=window.state_valid.at[:S].set(True),
        is_keyframe=window.is_keyframe.at[:S].set(True),
        timestamp=window.timestamp.at[:S].set(times),
        state_id=window.state_id.at[:S].set(jnp.arange(S, dtype=jnp.int32)),
    )

    # landmarks: perturbed ground truth
    L = cfg.num_landmarks
    n_lm = min(n_landmarks, L)
    lm_noise = lm_perturb * jax.random.normal(keys[3], (n_lm, 3))
    window = window._replace(
        hp_W=window.hp_W.at[:n_lm, :3].set(lms[:n_lm] + lm_noise),
        lm_valid=window.lm_valid.at[:n_lm].set(True),
        lm_id=window.lm_id.at[:n_lm].set(jnp.arange(n_lm, dtype=jnp.int32)),
    )

    # observations: every landmark through every state and camera, with noise
    obs = []
    for s in range(S):
        for c in range(rig.num_cameras):
            T_WC = compose(T_gt[s], rig.T_SC[c])
            p_C = transform_point(inverse(T_WC), lms[:n_lm])
            uv, valid = project(rig.cameras[c], p_C)
            for l in range(n_lm):
                if bool(valid[l]):
                    obs.append((s, l, c, np.array(uv[l])))
    noise = pix_noise * jax.random.normal(keys[4], (len(obs), 2))
    f = factors.reproj
    n_obs = min(len(obs), cfg.num_obs)
    uv_arr = jnp.asarray(np.stack([o[3] for o in obs[:n_obs]])) + noise[:n_obs]
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

    # IMU factors between consecutive states
    traj_series = sim.simulate_imu(
        traj, float(times[0]) - 0.05, float(times[-1]) + 0.05, imu_rate,
        IMU_PARAMS, key=keys[5], noisy=imu_noisy,
    )
    imu = factors.imu
    pres = []
    for k in range(S - 1):
        pre = preintegrate(
            traj_series.t, traj_series.gyro, traj_series.acc,
            jnp.ones(traj_series.t.shape, bool),
            times[k], times[k + 1], jnp.zeros(6), IMU_PARAMS,
        )
        pres.append(pre)
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    sq = jax.vmap(sqrt_information)(pre_b)
    imu = imu._replace(
        pre=jax.tree_util.tree_map(
            lambda full, new: full.at[: S - 1].set(new), imu.pre, pre_b
        ),
        sqrt_info=imu.sqrt_info.at[: S - 1].set(sq),
        valid=imu.valid.at[: S - 1].set(True),
    )

    # gauge priors on state 0 (reference: information 1e8 pose, sb prior)
    pr = factors.priors
    pr = pr._replace(
        pose_mean_r=pr.pose_mean_r.at[0].set(r0[0]),
        pose_mean_q=pr.pose_mean_q.at[0].set(q0[0]),
        pose_sqrt_info=pr.pose_sqrt_info.at[0].set(1e4 * jnp.eye(6)),
        pose_valid=pr.pose_valid.at[0].set(True),
        sb_mean=pr.sb_mean.at[0].set(sb0[0]),
        sb_sqrt_info=pr.sb_sqrt_info.at[0].set(
            jnp.diag(jnp.concatenate([
                jnp.full(3, 10.0),
                jnp.full(3, 1.0 / IMU_PARAMS.sigma_bg),
                jnp.full(3, 1.0 / IMU_PARAMS.sigma_ba),
            ]))
        ),
        sb_valid=pr.sb_valid.at[0].set(True),
    )

    factors = factors._replace(reproj=f, imu=imu, priors=pr)
    truth = {
        "r": r0, "q": q0, "sb": sb0, "lms": lms[:n_lm],
        "times": times, "rig": rig,
    }
    return window, factors, rig_p, truth


def pose_errors(window, truth, S):
    dr = np.linalg.norm(np.array(window.r[:S]) - np.array(truth["r"]), axis=1)
    dq = [
        float(np.linalg.norm(np.array(quat.log(
            quat.multiply(quat.conjugate(window.q[s]), truth["q"][s])
        ))))
        for s in range(S)
    ]
    return dr, np.array(dq)
