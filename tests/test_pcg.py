"""Matrix-free PCG global solvers: equivalence with the dense reduced-solve
paths on identical problems, sharded-vs-local equivalence on the 8-device
mesh, and convergence at scales the dense paths cannot represent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from svin_tpu.loopclosure import optimize_4dof
from svin_tpu.parallel import (
    optimize_6dof_pcg,
    ba_solve_bucketed,
    ba_solve_pcg,
    bucket_problem,
    make_sharded_ba_pcg,
    make_sharded_posegraph_pcg,
    optimize_4dof_pcg,
    pad_edges_for_mesh,
)

from test_dist_ba import build_global_problem
from test_loopclosure import _make_drifted_graph


def test_pcg_ba_matches_dense_reduced():
    """PCG and the dense Schur path converge to the SAME optimum (their LM
    damping transients differ: PCG damps Hpp before reduction — the
    standard Ceres formulation — while the dense path damps the reduced
    system, so intermediate iterates drift apart by ~1e-5 before both
    settle)."""
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(3))
    bprob = bucket_problem(prob)
    K = prob.pose_r.shape[0]
    out_d, cost_d = ba_solve_bucketed(bprob, rig_p, iters=25)
    out_p, cost_p = ba_solve_pcg(bprob, rig_p, iters=25, cg_iters=K * 6 + 8)
    np.testing.assert_allclose(float(cost_p), float(cost_d), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_p.pose_r), np.asarray(out_d.pose_r), atol=1e-7
    )
    # weakly observed landmarks sit in near-flat cost directions where the
    # two damping schedules land ~1e-5 apart — not a solver discrepancy
    np.testing.assert_allclose(
        np.asarray(out_p.lm), np.asarray(out_d.lm), atol=1e-4
    )


def test_pcg_linear_solve_exact():
    """With cg_iters ≥ dimension, one PCG step solves the (implicitly
    defined) reduced system exactly — verified against a dense solve of
    the matrix materialized column-by-column through the matvec."""
    from svin_tpu.parallel.pcg import _ba_assemble_pcg, _pcg

    prob, rig_p, _ = build_global_problem(jax.random.PRNGKey(3))
    bprob = bucket_problem(prob)
    K = prob.pose_r.shape[0]
    lam = jnp.asarray(1e-3)
    r, Jp, Jl, Hll_inv, Hpp_d, Minv, b_red, bl, cost = _ba_assemble_pcg(
        bprob, rig_p, K, lam
    )
    L, R = bprob.obs_pose.shape
    flat_pose = bprob.obs_pose.reshape(L * R)

    def matvec(v):
        vg = v[bprob.obs_pose]
        t = jnp.einsum("lrib,lrb->lri", Jp, vg)
        u = jnp.einsum("lria,lri->la", Jl, t)
        u = jnp.einsum("lab,lb->la", Hll_inv, u)
        s = jnp.einsum("lria,la->lri", Jl, u)
        g = jnp.einsum("lrib,lri->lrb", Jp, s)
        y2 = jax.ops.segment_sum(
            g.reshape(L * R, 6), flat_pose, num_segments=K
        )
        return jnp.einsum("kab,kb->ka", Hpp_d, v) - y2

    D = K * 6
    eye = jnp.eye(D).reshape(D, K, 6)
    H = np.asarray(jax.vmap(matvec)(eye).reshape(D, D)).T
    dx_np = -np.linalg.solve(H, np.asarray(b_red).reshape(D))
    dx = _pcg(
        matvec, -b_red,
        lambda v: jnp.einsum("kab,kb->ka", Minv, v), D + 10,
    )
    np.testing.assert_allclose(np.asarray(dx).reshape(D), dx_np, atol=1e-10)


def test_pcg_ba_truncated_still_converges():
    """The production setting (cg_iters ≪ dimension) still reaches the
    optimum over GN iterations — PCG error acts like extra GN damping."""
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(0))
    bprob = bucket_problem(prob)
    out, cost = ba_solve_pcg(bprob, rig_p, iters=12, cg_iters=32)
    err = np.linalg.norm(
        np.asarray(out.pose_r) - np.asarray(truth["r"]), axis=1
    )
    assert err.max() < 0.01, err
    lerr = np.linalg.norm(np.asarray(out.lm) - np.asarray(truth["lms"]), axis=1)
    assert np.median(lerr) < 0.02


def test_pcg_ba_sharded_matches_local():
    n = 8
    assert jax.device_count() >= n
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(4))
    bprob = bucket_problem(prob)
    K, L = prob.pose_r.shape[0], prob.lm.shape[0]
    step, shardings = make_sharded_ba_pcg(mesh, rig_p, K, L, iters=8, cg_iters=40)
    out_s, cost_s = step(jax.device_put(bprob, shardings))
    out_l, cost_l = ba_solve_pcg(bprob, rig_p, iters=8, cg_iters=40)
    np.testing.assert_allclose(float(cost_s), float(cost_l), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_s.pose_r), np.asarray(out_l.pose_r), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_s.lm), np.asarray(out_l.lm), atol=1e-7
    )


def test_pcg_pose_major_index_equivalent():
    """The gather-based pose-major reduction (scatter-free matvec path)
    must produce bit-comparable results to the segment-sum path."""
    from svin_tpu.parallel import pose_major_index

    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(3))
    bprob = bucket_problem(prob)
    K = prob.pose_r.shape[0]
    perm = pose_major_index(bprob.obs_pose, bprob.obs_valid, K)
    out_a, cost_a = ba_solve_pcg(bprob, rig_p, iters=8, cg_iters=40)
    out_b, cost_b = ba_solve_pcg(
        bprob, rig_p, iters=8, cg_iters=40, pose_perm=perm
    )
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out_a.pose_r), np.asarray(out_b.pose_r), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_a.lm), np.asarray(out_b.lm), atol=1e-12
    )


def test_pcg_ba_sharded_pose_major_matches():
    """Sharded PCG with per-shard pose-major gathers == sharded PCG with
    scatters == local PCG."""
    from svin_tpu.parallel import sharded_pose_major_index

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    prob, rig_p, truth = build_global_problem(jax.random.PRNGKey(4))
    bprob = bucket_problem(prob)
    K, L = prob.pose_r.shape[0], prob.lm.shape[0]
    perm = sharded_pose_major_index(bprob, K, n)
    step, (sh, perm_sh) = make_sharded_ba_pcg(
        mesh, rig_p, K, L, iters=8, cg_iters=40, use_pose_perm=True
    )
    out_s, cost_s = step(
        jax.device_put(bprob, sh), jax.device_put(perm, perm_sh)
    )
    out_l, cost_l = ba_solve_pcg(bprob, rig_p, iters=8, cg_iters=40)
    np.testing.assert_allclose(float(cost_s), float(cost_l), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_s.pose_r), np.asarray(out_l.pose_r), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_s.lm), np.asarray(out_l.lm), atol=1e-7
    )


def test_multisession_joint_pcg():
    """Cave+Bus-style joint mapping through the SCALABLE solver: two
    sessions with inter-session drift merged by ``merge_sessions``, solved
    with matrix-free PCG (the path that keeps working when the joint
    problem is 5k+ poses)."""
    from svin_tpu.parallel import merge_sessions, pose_major_index

    prob_a, rig_p, truth = build_global_problem(
        jax.random.PRNGKey(4), K=8, L=48, perturb=0.0
    )
    prob_b, _, _ = build_global_problem(
        jax.random.PRNGKey(4), K=8, L=48, perturb=0.0
    )
    off = jnp.array([0.3, -0.2, 0.15])
    prob_b = prob_b._replace(pose_r=prob_b.pose_r + off, lm=prob_b.lm + off)
    shared = [(0, l, 1, l) for l in range(48)]
    joint, pose_maps, lm_maps = merge_sessions(
        [prob_a, prob_b], shared, anchor=0
    )
    bjoint = bucket_problem(joint)
    K = joint.pose_r.shape[0]
    perm = pose_major_index(bjoint.obs_pose, bjoint.obs_valid, K)
    out, cost = ba_solve_pcg(
        bjoint, rig_p, iters=12, cg_iters=48, pose_perm=perm
    )
    pb = np.asarray(out.pose_r)[pose_maps[1]]
    err = np.linalg.norm(pb - np.asarray(truth["r"]), axis=1)
    assert err.max() < 0.02, err


def test_pcg_posegraph_matches_dense():
    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    out_d = optimize_4dof(nodes, edges, jnp.int32(1), iters=10)
    cap = nodes.p.shape[0]
    out_p = optimize_4dof_pcg(
        nodes, edges, jnp.int32(1), iters=10, cg_iters=cap * 4 + 8
    )
    va = np.asarray(nodes.valid)
    np.testing.assert_allclose(
        np.asarray(out_p.p)[va], np.asarray(out_d.p)[va], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_p.yaw)[va], np.asarray(out_d.yaw)[va], atol=1e-6
    )


def test_pcg_posegraph_sharded_matches_local():
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    edges_p = pad_edges_for_mesh(edges, n)
    cap = nodes.p.shape[0]
    step, (node_sh, edge_sh) = make_sharded_posegraph_pcg(
        mesh, cap, edges_p.i.shape[0], iters=10, cg_iters=64
    )
    out_s, cost_s = step(
        jax.device_put(nodes, node_sh), jax.device_put(edges_p, edge_sh),
        jnp.int32(1),
    )
    out_l = optimize_4dof_pcg(nodes, edges, jnp.int32(1), iters=10, cg_iters=64)
    np.testing.assert_allclose(
        np.asarray(out_s.p), np.asarray(out_l.p), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_s.yaw), np.asarray(out_l.yaw), atol=1e-7
    )
    err_after = np.linalg.norm(np.asarray(out_s.p[N - 1]) - t_gt[N - 1])
    assert err_after < 0.15


def test_pcg_posegraph_large_graph():
    """A graph the dense (4N)² path cannot touch: 4096 nodes (Cave is 1519,
    Bus 3388 — this brackets both). Odometry chain with yaw-rate drift plus
    sparse loop edges back to the start; PCG must pull the end node home."""
    from svin_tpu.loopclosure.posegraph import PoseGraphEdges, PoseGraphNodes

    N = 4096
    rng = np.random.default_rng(7)
    # ground truth: circle revisited (loop closures are geometrically real)
    th = np.linspace(0, 4 * np.pi, N)
    radius = 20.0
    t_gt = np.stack(
        [radius * np.cos(th), radius * np.sin(th), 0.1 * np.sin(3 * th)], 1
    )
    yaw_gt = th + np.pi / 2
    # odometry edges from ground truth (exact), initial guess drifted
    yaw_drift = np.cumsum(rng.normal(0, 2e-3, N))
    p_init = np.zeros((N, 3))
    yaw_init = yaw_gt + yaw_drift
    p_init[0] = t_gt[0]
    for k in range(1, N):
        R = np.array(
            [
                [np.cos(yaw_init[k - 1]), -np.sin(yaw_init[k - 1]), 0],
                [np.sin(yaw_init[k - 1]), np.cos(yaw_init[k - 1]), 0],
                [0, 0, 1],
            ]
        )
        Rg = np.array(
            [
                [np.cos(yaw_gt[k - 1]), -np.sin(yaw_gt[k - 1]), 0],
                [np.sin(yaw_gt[k - 1]), np.cos(yaw_gt[k - 1]), 0],
                [0, 0, 1],
            ]
        )
        d_local = Rg.T @ (t_gt[k] - t_gt[k - 1])
        p_init[k] = p_init[k - 1] + R @ d_local

    ei, ej, tij, yij, wt, il = [], [], [], [], [], []
    for k in range(1, N):
        Rg = np.array(
            [
                [np.cos(yaw_gt[k - 1]), -np.sin(yaw_gt[k - 1]), 0],
                [np.sin(yaw_gt[k - 1]), np.cos(yaw_gt[k - 1]), 0],
                [0, 0, 1],
            ]
        )
        ei.append(k - 1); ej.append(k)
        tij.append(Rg.T @ (t_gt[k] - t_gt[k - 1]))
        yij.append(yaw_gt[k] - yaw_gt[k - 1]); wt.append(1.0); il.append(False)
    # loop edges: second lap nodes see their first-lap counterparts
    half = N // 2
    for k in range(half + 8, N, 64):
        m = k - half
        Rg = np.array(
            [
                [np.cos(yaw_gt[m]), -np.sin(yaw_gt[m]), 0],
                [np.sin(yaw_gt[m]), np.cos(yaw_gt[m]), 0],
                [0, 0, 1],
            ]
        )
        ei.append(m); ej.append(k)
        tij.append(Rg.T @ (t_gt[k] - t_gt[m]))
        yij.append(yaw_gt[k] - yaw_gt[m]); wt.append(5.0); il.append(True)

    E = len(ei)
    nodes = PoseGraphNodes(
        p=jnp.asarray(p_init), yaw=jnp.asarray(yaw_init),
        pitch=jnp.zeros(N), roll=jnp.zeros(N), valid=jnp.ones(N, bool),
    )
    edges = PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        t_ij=jnp.asarray(np.stack(tij)), yaw_ij=jnp.asarray(yij),
        weight=jnp.asarray(wt), is_loop=jnp.asarray(il),
        valid=jnp.ones(E, bool),
    )
    err_before = np.linalg.norm(p_init - t_gt, axis=1).max()
    assert err_before > 1.0  # the drift was substantial

    def loop_residuals(p, yaw):
        il = np.asarray(edges.is_loop)
        out = []
        for a, b, t in zip(
            np.asarray(edges.i)[il], np.asarray(edges.j)[il],
            np.asarray(edges.t_ij)[il],
        ):
            y = yaw[a]
            R = np.array(
                [
                    [np.cos(y), -np.sin(y), 0],
                    [np.sin(y), np.cos(y), 0],
                    [0, 0, 1],
                ]
            )
            out.append(np.linalg.norm(R.T @ (p[b] - p[a]) - t))
        return np.array(out)

    res_before = loop_residuals(p_init, yaw_init)
    assert res_before.max() > 1.0
    out = optimize_4dof_pcg(nodes, edges, jnp.int32(1), iters=6, cg_iters=96)
    # the graph becomes self-consistent: every loop closure is satisfied.
    # NOTE: absolute position vs t_gt is NOT asserted — a slow yaw ramp
    # along the chain is a quasi-null mode of any anchored pose graph
    # (each yaw edge resists only the ramp's gradient), so absolute
    # position is weakly observable by construction; the reference's
    # solver leaves the same residual drift.
    res_after = loop_residuals(np.asarray(out.p), np.asarray(out.yaw))
    assert res_after.max() < 0.01, res_after.max()


def test_banded_posegraph_matches_pcg():
    """pg_band (banded one-hot-matmul 4-DoF solver — the loop closer's
    Cave-scale branch) must match optimize_4dof_pcg on the same graph
    (identical damping/Huber/preconditioner semantics)."""
    from svin_tpu.parallel import band_posegraph, optimize_4dof_banded

    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    out_p = optimize_4dof_pcg(
        nodes, edges, jnp.int32(1), iters=8, cg_iters=64, coarse_group=32
    )
    prob, meta = band_posegraph(
        nodes, edges, block=64, wmax=4, coarse_group=32
    )
    out_b, _ = jax.jit(
        optimize_4dof_banded, static_argnames=("meta", "iters", "cg_iters")
    )(prob, meta, jnp.int32(1), iters=8, cg_iters=64)
    va = np.asarray(nodes.valid)
    np.testing.assert_allclose(
        np.asarray(out_b.p)[: va.shape[0]][va], np.asarray(out_p.p)[va],
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_b.yaw)[: va.shape[0]][va], np.asarray(out_p.yaw)[va],
        atol=5e-4,
    )
    # and the solve actually corrected the drifted end node
    err_after = np.linalg.norm(
        np.asarray(out_b.p)[N - 1] - t_gt[N - 1]
    )
    assert err_after < 0.15


def _graph6_from_4dof():
    """SE(3) graph derived from the drifted 4-DoF fixture (yaw-only
    rotations → quaternions; same sequential+loop edge set with the
    reference 6-DoF sqrt information)."""
    from svin_tpu.kinematics import npq
    from svin_tpu.loopclosure import PoseGraph6Edges, PoseGraph6Nodes
    from svin_tpu.loopclosure.posegraph import ypr_to_matrix_np

    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    cap = nodes.p.shape[0]
    q = np.stack([
        npq.from_rotation_matrix(
            ypr_to_matrix_np(float(nodes.yaw[k]), 0.0, 0.0)
        )
        for k in range(cap)
    ])
    nodes6 = PoseGraph6Nodes(
        r=jnp.asarray(nodes.p), q=jnp.asarray(q), valid=nodes.valid
    )
    E = edges.i.shape[0]
    q_ij = np.stack([
        npq.from_rotation_matrix(
            ypr_to_matrix_np(float(edges.yaw_ij[k]), 0.0, 0.0)
        )
        for k in range(E)
    ])
    W = np.diag([20.0, 20.0, 20.0, 100.0, 100.0, 57.3])
    edges6 = PoseGraph6Edges(
        i=edges.i, j=edges.j, t_ij=edges.t_ij, q_ij=jnp.asarray(q_ij),
        sqrt_info=jnp.broadcast_to(
            jnp.asarray(W, edges.t_ij.dtype), (E, 6, 6)
        ),
        valid=edges.valid,
    )
    return nodes6, edges6, t_gt, yaw_gt, N


def test_pcg_posegraph_6dof_matches_dense():
    """optimize_6dof_pcg (matrix-free SE(3), two-level preconditioner) must
    match the dense (6N)² optimize_6dof on the same graph — the 6-DoF
    Cave-scale branch's correctness anchor (PoseGraph.cpp:387-543)."""
    from svin_tpu.loopclosure import optimize_6dof

    nodes6, edges6, t_gt, yaw_gt, N = _graph6_from_4dof()
    out_d = optimize_6dof(nodes6, edges6, jnp.int32(1), iters=6)
    cap = nodes6.r.shape[0]
    # the reference sqrt-information (translation 20 vs rotation 100)
    # still leaves the system ill-conditioned — exact agreement needs CG
    # pushed well past the dimension count
    out_p = optimize_6dof_pcg(
        nodes6, edges6, jnp.int32(1), iters=6, cg_iters=800,
        coarse_group=16,
    )
    va = np.asarray(nodes6.valid)
    np.testing.assert_allclose(
        np.asarray(out_p.r)[va], np.asarray(out_d.r)[va], atol=1e-5
    )
    # quaternion agreement up to sign
    qd = np.asarray(out_d.q)[va]
    qp = np.asarray(out_p.q)[va]
    dots = np.abs(np.sum(qd * qp, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)
    # and the solve corrected the drifted end node
    err = np.linalg.norm(np.asarray(out_p.r)[N - 1] - t_gt[N - 1])
    assert err < 0.15


def test_pcg_posegraph_6dof_large_graph():
    """4096-node SE(3) graph with injected roll/pitch drift — the scale the
    dense (6N)² path cannot touch; the PCG must pull the loop-closure
    residuals to the floor including the out-of-plane rotation drift
    (which no 4-DoF solve can correct)."""
    from svin_tpu.kinematics import npq
    from svin_tpu.loopclosure import PoseGraph6Edges, PoseGraph6Nodes

    N = 4096
    rng = np.random.default_rng(11)
    th = np.linspace(0, 4 * np.pi, N)
    t_gt = np.stack(
        [20 * np.cos(th), 20 * np.sin(th), 0.2 * np.sin(3 * th)], 1
    )

    def R_of(yaw, pitch, roll):
        from svin_tpu.loopclosure.posegraph import ypr_to_matrix_np
        return ypr_to_matrix_np(yaw, pitch, roll)

    yaw_gt = th + np.pi / 2
    R_gt = [R_of(yaw_gt[k], 0.0, 0.0) for k in range(N)]
    # drifted initialization: slow roll+pitch+yaw random walk
    d_yaw = np.cumsum(rng.normal(0, 1.5e-3, N))
    d_pitch = np.cumsum(rng.normal(0, 8e-4, N))
    d_roll = np.cumsum(rng.normal(0, 8e-4, N))
    R_init = [
        R_of(yaw_gt[k] + d_yaw[k], d_pitch[k], d_roll[k]) for k in range(N)
    ]
    p_init = np.zeros((N, 3))
    p_init[0] = t_gt[0]
    for k in range(1, N):
        d_local = R_gt[k - 1].T @ (t_gt[k] - t_gt[k - 1])
        p_init[k] = p_init[k - 1] + R_init[k - 1] @ d_local

    ii, jj, ts, qs = [], [], [], []
    for k in range(1, N):
        ii.append(k - 1); jj.append(k)
        ts.append(R_gt[k - 1].T @ (t_gt[k] - t_gt[k - 1]))
        qs.append(npq.from_rotation_matrix(R_gt[k - 1].T @ R_gt[k]))
    half = N // 2
    for k in range(half + 8, N, 64):
        m = k - half
        ii.append(m); jj.append(k)
        ts.append(R_gt[m].T @ (t_gt[k] - t_gt[m]))
        qs.append(npq.from_rotation_matrix(R_gt[m].T @ R_gt[k]))
    E = len(ii)
    q_init = np.stack([npq.from_rotation_matrix(R) for R in R_init])
    nodes6 = PoseGraph6Nodes(
        r=jnp.asarray(p_init, jnp.float32),
        q=jnp.asarray(q_init, jnp.float32),
        valid=jnp.ones(N, bool),
    )
    W = np.diag([20.0, 20.0, 20.0, 100.0, 100.0, 57.3])
    edges6 = PoseGraph6Edges(
        i=jnp.asarray(ii, jnp.int32), j=jnp.asarray(jj, jnp.int32),
        t_ij=jnp.asarray(np.stack(ts), jnp.float32),
        q_ij=jnp.asarray(np.stack(qs), jnp.float32),
        sqrt_info=jnp.broadcast_to(
            jnp.asarray(W, jnp.float32), (E, 6, 6)
        ),
        valid=jnp.ones(E, bool),
    )
    assert np.linalg.norm(p_init - t_gt, axis=1).max() > 1.0
    out = optimize_6dof_pcg(
        nodes6, edges6, jnp.int32(1), iters=12, cg_iters=192,
        coarse_group=64,
    )
    # loop residuals reach the floor, including rotation (roll/pitch)
    r_out = np.asarray(out.r)
    q_out = np.asarray(out.q)
    il = np.arange(E) >= N - 1
    worst_t, worst_q = 0.0, 0.0
    from svin_tpu.kinematics import npq as _npq
    for a, b, t, qr in zip(
        np.asarray(ii)[il], np.asarray(jj)[il],
        np.stack(ts)[il], np.stack(qs)[il],
    ):
        Ra = _npq.to_rotation_matrix(q_out[a])
        worst_t = max(worst_t, float(
            np.linalg.norm(Ra.T @ (r_out[b] - r_out[a]) - t)))
        q_rel = _npq.multiply(_npq.conjugate(q_out[a]), q_out[b])
        dq = _npq.multiply(_npq.conjugate(qr), q_rel)
        worst_q = max(worst_q, float(2 * np.arccos(min(1.0, abs(dq[3])))))
    # rotation tolerance reflects the reference's own weighting: yaw on
    # sequential edges carries sqrt-info 57.3 vs 100 for roll/pitch, so
    # the yaw component of loop residuals converges last
    assert worst_t < 0.01, worst_t
    assert worst_q < 0.02, worst_q
