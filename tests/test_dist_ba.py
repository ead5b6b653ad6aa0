"""Distributed BA tests on the virtual 8-device CPU mesh: sharded-vs-local
equivalence (the multi-host test the reference lacks, SURVEY.md §4) and
convergence from perturbed initialization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from svin_tpu import sim
from svin_tpu.cameras import project
from svin_tpu.estimator import rig_params
from svin_tpu.kinematics import compose, inverse, transform_point, quaternion as quat
from svin_tpu.parallel import (
    GlobalMapProblem,
    ba_solve_local,
    make_sharded_ba,
    partition_problem,
)

from helpers import make_rig


def build_global_problem(key, K=12, L=64, pix_noise=0.3, perturb=0.05):
    rig = make_rig()
    rig_p = rig_params(rig)
    traj = sim.default_trajectory()
    times = jnp.arange(K) * 0.35 + 0.2
    poses = [sim.pose(traj, t) for t in times]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lms = sim.landmark_grid(k1, L, jnp.array([0.5, 0.5, 5.0]), jnp.array([10.0, 10.0, 4.0]))

    obs = []
    for pi, T in enumerate(poses):
        for ci in range(rig.num_cameras):
            T_WC = compose(T, rig.T_SC[ci])
            p_C = transform_point(inverse(T_WC), lms)
            uv, ok = project(rig.cameras[ci], p_C)
            for l in np.nonzero(np.asarray(ok))[0]:
                obs.append((pi, int(l), ci, np.asarray(uv[l])))
    noise = pix_noise * jax.random.normal(k2, (len(obs), 2))
    O = len(obs)
    r0 = jnp.stack([T.r for T in poses])
    q0 = jnp.stack([T.q for T in poses])
    # perturb all but the first two poses (gauge anchors) and the landmarks
    dp = perturb * jax.random.normal(k3, (K, 3))
    dp = dp.at[:2].set(0.0)
    dl = perturb * jax.random.normal(k4, (L, 3))
    prob = GlobalMapProblem(
        pose_r=r0 + dp,
        pose_q=q0,
        pose_fixed=jnp.arange(K) < 2,
        lm=lms + dl,
        lm_valid=jnp.ones(L, bool),
        obs_uv=jnp.asarray(np.stack([o[3] for o in obs])) + noise,
        obs_pose=jnp.asarray([o[0] for o in obs], jnp.int32),
        obs_lm=jnp.asarray([o[1] for o in obs], jnp.int32),
        obs_cam=jnp.asarray([o[2] for o in obs], jnp.int32),
        obs_valid=jnp.ones(O, bool),
    )
    truth = {"r": r0, "q": q0, "lms": lms}
    return prob, rig_p, truth


def test_local_ba_converges():
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(0))
    out, cost = ba_solve_local(prob, rig_p, iters=10)
    err = np.linalg.norm(np.asarray(out.pose_r) - np.asarray(truth["r"]), axis=1)
    assert err.max() < 0.01, err
    lerr = np.linalg.norm(np.asarray(out.lm) - np.asarray(truth["lms"]), axis=1)
    assert np.median(lerr) < 0.02


def test_sharded_matches_local():
    n = 8
    assert jax.device_count() >= n, "conftest must provide 8 CPU devices"
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(1))
    prob_s = partition_problem(prob, n)
    K, L, O = prob.pose_r.shape[0], prob.lm.shape[0], prob_s.obs_uv.shape[0]
    step, shardings = make_sharded_ba(mesh, rig_p, K, L, O, iters=10)
    prob_dev = jax.device_put(prob_s, shardings)
    out_s, cost_s = step(prob_dev)
    # local reference on the identical (re-ordered) problem
    out_l, cost_l = ba_solve_local(prob_s, rig_p, iters=10)
    np.testing.assert_allclose(cost_s, cost_l, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_s.pose_r), np.asarray(out_l.pose_r), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_s.lm), np.asarray(out_l.lm), atol=1e-8
    )


def test_partition_preserves_observations():
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(2))
    prob_s = partition_problem(prob, 4)
    assert int(prob_s.obs_valid.sum()) == int(prob.obs_valid.sum())
    # every valid obs sits on its landmark's shard
    Lloc = prob.lm.shape[0] // 4
    cap = prob_s.obs_uv.shape[0] // 4
    shard_of_slot = np.arange(prob_s.obs_uv.shape[0]) // cap
    ok = np.asarray(prob_s.obs_valid)
    assert (np.asarray(prob_s.obs_lm)[ok] // Lloc == shard_of_slot[ok]).all()


def test_multisession_joint_mapping():
    """Two sessions over the same landmark field, session B initialized with
    a rigid offset (inter-session drift): joint BA with shared-landmark
    correspondences must pull B onto A (the Cave+Bus joint-mapping path)."""
    from svin_tpu.parallel import merge_sessions, ba_solve_local

    prob_a, rig_p, truth = build_global_problem(
        jax.random.PRNGKey(4), K=8, L=48, perturb=0.0
    )
    prob_b, _, _ = build_global_problem(
        jax.random.PRNGKey(4), K=8, L=48, perturb=0.0
    )
    # session B drifted: +0.3 m offset on poses and its landmark copies,
    # and its own gauge NOT fixed in the merge
    off = jnp.array([0.3, -0.2, 0.15])
    prob_b = prob_b._replace(
        pose_r=prob_b.pose_r + off,
        lm=prob_b.lm + off,
    )
    shared = [(0, l, 1, l) for l in range(48)]  # full correspondence
    joint, pose_maps, lm_maps = merge_sessions([prob_a, prob_b], shared, anchor=0)
    assert int(joint.lm_valid.sum()) == 48  # duplicates merged
    out, cost = ba_solve_local(joint, rig_p, iters=12)
    # session B poses must align to ground truth (session A frame)
    pb = np.asarray(out.pose_r)[pose_maps[1]]
    err = np.linalg.norm(pb - np.asarray(truth["r"]), axis=1)
    assert err.max() < 0.02, err


def test_bucketed_matches_flat():
    """The scatter-free bucketed layout solves the same problem to the same
    optimum as the flat-observation reference path."""
    from svin_tpu.parallel import ba_solve_bucketed, bucket_problem

    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(3))
    bprob = bucket_problem(prob)
    assert int(bprob.obs_valid.sum()) == int(prob.obs_valid.sum())
    out_f, cost_f = ba_solve_local(prob, rig_p, iters=10)
    out_b, cost_b = ba_solve_bucketed(bprob, rig_p, iters=10)
    np.testing.assert_allclose(float(cost_b), float(cost_f), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_b.pose_r), np.asarray(out_f.pose_r), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_b.lm), np.asarray(out_f.lm), atol=1e-7
    )


def test_sharded_bucketed_matches_local():
    """Distributed bucketed BA over the 8-device mesh == single-device
    bucketed BA (observations ride their landmark shard by construction)."""
    from svin_tpu.parallel import (
        ba_solve_bucketed,
        bucket_problem,
        make_sharded_ba_bucketed,
    )

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(4))
    bprob = bucket_problem(prob)
    K, L = prob.pose_r.shape[0], prob.lm.shape[0]
    step, shardings = make_sharded_ba_bucketed(mesh, rig_p, K, L, iters=10)
    out_s, cost_s = step(jax.device_put(bprob, shardings))
    out_l, cost_l = ba_solve_bucketed(bprob, rig_p, iters=10)
    np.testing.assert_allclose(float(cost_s), float(cost_l), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_s.pose_r), np.asarray(out_l.pose_r), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_s.lm), np.asarray(out_l.lm), atol=1e-8
    )
