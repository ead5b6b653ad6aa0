"""Pose-graph optimization: 4-DoF (yaw + position) and 6-DoF Gauss-Newton.

Replaces the Ceres pose-graph solvers of the reference
(``pose_graph/src/pose_graph/PoseGraph.cpp:226-385`` optimize4DoFPoseGraph
with the yaw-parameterized FourDOFWeightError and fixed roll/pitch;
``:387-543`` optimize6DoFPoseGraph with PoseGraph3dErrorTerm): fixed-capacity
node/edge arrays with validity masks, vmapped edge residual/Jacobian
evaluation (forward-mode AD over the 8 per-edge variables), scatter-assembled
normal equations, and a dense Cholesky solve — one compiled program per
(capacity, iterations) configuration.

Nodes before ``fix_before`` are held fixed (the reference fixes poses before
``earliest_loop_index``); Huber robustness on loop edges mirrors
``ceres::HuberLoss(0.1)``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics import quaternion as quat


class PoseGraphNodes(NamedTuple):
    p: jnp.ndarray  # (N,3) position
    yaw: jnp.ndarray  # (N,)
    pitch: jnp.ndarray  # (N,) fixed (gravity-observable from VIO)
    roll: jnp.ndarray  # (N,) fixed
    valid: jnp.ndarray  # (N,)


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray  # (E,) int32 from-node
    j: jnp.ndarray  # (E,) int32 to-node
    t_ij: jnp.ndarray  # (E,3) p_j - p_i expressed in node i's frame
    yaw_ij: jnp.ndarray  # (E,) relative yaw [rad]
    weight: jnp.ndarray  # (E,) scalar information weight
    is_loop: jnp.ndarray  # (E,) bool (loop edges get Huber)
    valid: jnp.ndarray  # (E,)


def ypr_to_matrix(yaw, pitch, roll):
    """R = Rz(yaw) Ry(pitch) Rx(roll) — the reference's Utility::ypr2R."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    return jnp.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def matrix_to_ypr(R: jnp.ndarray):
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arctan2(
        -R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2)
    )
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll


def normalize_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


# numpy twins for the HOST bookkeeping path (per-keyframe logic must not
# emit device ops — see svin_tpu.kinematics.npq)
def ypr_to_matrix_np(yaw, pitch, roll):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def matrix_to_ypr_np(R):
    R = np.asarray(R)
    yaw = np.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = np.arctan2(
        -R[..., 2, 0], np.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2)
    )
    roll = np.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll


def normalize_angle_np(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _edge_residual(nodes: PoseGraphNodes, e_i, e_j, t_ij, yaw_ij, delta):
    """Residual of one edge given per-node updates delta (N,4) = [dp, dyaw]."""
    p_i = nodes.p[e_i] + delta[e_i, :3]
    p_j = nodes.p[e_j] + delta[e_j, :3]
    yaw_i = nodes.yaw[e_i] + delta[e_i, 3]
    yaw_j = nodes.yaw[e_j] + delta[e_j, 3]
    R_i = ypr_to_matrix(yaw_i, nodes.pitch[e_i], nodes.roll[e_i])
    t_hat = R_i.T @ (p_j - p_i)
    r_t = t_hat - t_ij
    r_y = normalize_angle(yaw_j - yaw_i - yaw_ij)
    # yaw weighting mirrors FourDOFWeightError (position 1, yaw ~0.1 rad⁻¹
    # relative scaling)
    return jnp.concatenate([r_t, r_y[None] * 0.3])


HUBER_DELTA = 0.1


@partial(jax.jit, static_argnames=("iters",))
def optimize_4dof(
    nodes: PoseGraphNodes,
    edges: PoseGraphEdges,
    fix_before: jnp.ndarray,  # () int32 — nodes < this are fixed
    iters: int = 10,
) -> PoseGraphNodes:
    N = nodes.p.shape[0]
    dtype = nodes.p.dtype

    def gn_step(_, nd: PoseGraphNodes):
        def edge_eval(ei, ej, t_ij, yaw_ij, w, il, ok):
            def res_of(d8):
                p_i = nd.p[ei] + d8[:3]
                p_j = nd.p[ej] + d8[4:7]
                yaw_i = nd.yaw[ei] + d8[3]
                yaw_j = nd.yaw[ej] + d8[7]
                R_i = ypr_to_matrix(yaw_i, nd.pitch[ei], nd.roll[ei])
                r_t = R_i.T @ (p_j - p_i) - t_ij
                r_y = normalize_angle(yaw_j - yaw_i - yaw_ij)
                return jnp.concatenate([r_t, r_y[None] * 0.3])

            r = res_of(jnp.zeros(8, dtype))
            J = jax.jacfwd(res_of)(jnp.zeros(8, dtype))
            n = jnp.linalg.norm(r)
            hub = jnp.where(
                il & (n > HUBER_DELTA),
                jnp.sqrt(HUBER_DELTA / jnp.maximum(n, 1e-12)), 1.0,
            )
            wtot = jnp.where(ok, w * hub, 0.0)
            return wtot * r, wtot * J

        r, J = jax.vmap(edge_eval)(
            edges.i, edges.j, edges.t_ij, edges.yaw_ij, edges.weight,
            edges.is_loop, edges.valid,
        )  # r (E,4), J (E,4,8)
        Ji = J[:, :, :4]
        Jj = J[:, :, 4:]
        Hii = jnp.einsum("era,erb->eab", Ji, Ji)
        Hjj = jnp.einsum("era,erb->eab", Jj, Jj)
        Hij = jnp.einsum("era,erb->eab", Ji, Jj)
        bi = jnp.einsum("era,er->ea", Ji, r)
        bj = jnp.einsum("era,er->ea", Jj, r)
        # scatter 4×4 blocks straight into the FLAT (4N,4N) matrix: a
        # block-indexed (N,N,4,4) intermediate pads its trailing dims to
        # the TPU (8,128) tile — a 64× HBM inflation that OOM'd the chip
        # at N=2048 (measured 1.6 GB temp at N=512 block-form vs ~16 MB
        # flat)
        ri = edges.i[:, None] * 4 + jnp.arange(4)[None, :]  # (E,4)
        rj = edges.j[:, None] * 4 + jnp.arange(4)[None, :]
        H = jnp.zeros((4 * N, 4 * N), dtype)
        H = H.at[ri[:, :, None], ri[:, None, :]].add(Hii)
        H = H.at[rj[:, :, None], rj[:, None, :]].add(Hjj)
        H = H.at[ri[:, :, None], rj[:, None, :]].add(Hij)
        H = H.at[rj[:, :, None], ri[:, None, :]].add(
            jnp.swapaxes(Hij, -1, -2)
        )
        bf = jnp.zeros(4 * N, dtype)
        bf = bf.at[ri].add(bi)
        bf = bf.at[rj].add(bj)

        free = nodes.valid & (jnp.arange(N) >= fix_before)
        free4 = jnp.repeat(free, 4)
        dH = jnp.diag(H)
        damp = 1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free4, 0.0, 1.0)
        H = H + jnp.diag(damp)
        H = H * free4[:, None] * free4[None, :] + jnp.diag(jnp.where(free4, 0.0, 1.0))
        bf = bf * free4
        # Jacobi-equilibrated Cholesky solve: equilibration keeps the f32
        # (shipped TPU precision) factorization stable when node
        # coordinates are large (Cave-scale graphs put |p| at ~10² m,
        # which squares into the normal equations); Cholesky instead of LU
        # because the damped system is SPD and the TPU LU lowering is far
        # heavier in HBM temp memory
        s = jax.lax.rsqrt(jnp.clip(jnp.diag(H), 1e-20)).astype(dtype)
        Hs = H * (s[:, None] * s[None, :])
        cho = jax.scipy.linalg.cho_factor(Hs)
        dx = -(s * jax.scipy.linalg.cho_solve(cho, s * bf)).reshape(N, 4)
        return PoseGraphNodes(
            p=nd.p + dx[:, :3], yaw=nd.yaw + dx[:, 3],
            pitch=nd.pitch, roll=nd.roll, valid=nd.valid,
        )

    return jax.lax.fori_loop(0, iters, gn_step, nodes)


# ------------------------------------------------------------------ 6-DoF
class PoseGraph6Nodes(NamedTuple):
    r: jnp.ndarray  # (N,3)
    q: jnp.ndarray  # (N,4)
    valid: jnp.ndarray  # (N,)


class PoseGraph6Edges(NamedTuple):
    i: jnp.ndarray
    j: jnp.ndarray
    t_ij: jnp.ndarray  # (E,3) in i frame
    q_ij: jnp.ndarray  # (E,4)
    # (E,6,6) sqrt information. Reference (PoseGraph.cpp:402-416):
    # sequential edges diag(20,20,20,100,100,57.3), loop edges
    # diag(20,20,20,100,100,100)
    sqrt_info: jnp.ndarray
    valid: jnp.ndarray
    # loop edges carry a Huber(0.1) robust loss (PoseGraph.cpp:423,490);
    # None (legacy constructors) = no loop edges
    is_loop: Optional[jnp.ndarray] = None


@partial(jax.jit, static_argnames=("iters",))
def optimize_6dof(
    nodes: PoseGraph6Nodes,
    edges: PoseGraph6Edges,
    fix_before: jnp.ndarray,
    iters: int = 5,
) -> PoseGraph6Nodes:
    N = nodes.r.shape[0]
    dtype = nodes.r.dtype

    il_arr = (
        edges.is_loop if edges.is_loop is not None
        else jnp.zeros(edges.i.shape[0], bool)
    )

    def gn_step(_, nd: PoseGraph6Nodes):
        def edge_eval(ei, ej, t_ij, q_ij, W, ok, il):
            def res_of(d12):
                r_i = nd.r[ei] + d12[:3]
                r_j = nd.r[ej] + d12[6:9]
                q_i = quat.normalize(quat.multiply(quat.exp(d12[3:6]), nd.q[ei]))
                q_j = quat.normalize(quat.multiply(quat.exp(d12[9:12]), nd.q[ej]))
                C_iW = quat.to_rotation_matrix(q_i).T
                r_t = C_iW @ (r_j - r_i) - t_ij
                q_rel = quat.multiply(quat.conjugate(q_i), q_j)
                r_q = quat.log(quat.multiply(quat.conjugate(q_ij), q_rel))
                return W @ jnp.concatenate([r_t, r_q])

            r = res_of(jnp.zeros(12, dtype))
            J = jax.jacfwd(res_of)(jnp.zeros(12, dtype))
            # Huber(0.1) on loop edges (reference loss_function,
            # PoseGraph.cpp:423,490) — IRLS sqrt-weight on the whitened
            # residual norm, like the 4-DoF path
            n = jnp.linalg.norm(r)
            hub = jnp.where(
                il & (n > HUBER_DELTA),
                jnp.sqrt(HUBER_DELTA / jnp.maximum(n, 1e-12)), 1.0,
            )
            w = jnp.where(ok, hub, 0.0).astype(dtype)
            return w * r, w * J

        r, J = jax.vmap(edge_eval)(
            edges.i, edges.j, edges.t_ij, edges.q_ij, edges.sqrt_info,
            edges.valid, il_arr,
        )
        Ji = J[:, :, :6]
        Jj = J[:, :, 6:]
        # flat (6N,6N) scatter — see the 4-DoF path for why the
        # (N,N,6,6) block layout is an HBM hazard on TPU
        ri = edges.i[:, None] * 6 + jnp.arange(6)[None, :]  # (E,6)
        rj = edges.j[:, None] * 6 + jnp.arange(6)[None, :]
        Hij = jnp.einsum("era,erb->eab", Ji, Jj)
        H = jnp.zeros((6 * N, 6 * N), dtype)
        H = H.at[ri[:, :, None], ri[:, None, :]].add(
            jnp.einsum("era,erb->eab", Ji, Ji)
        )
        H = H.at[rj[:, :, None], rj[:, None, :]].add(
            jnp.einsum("era,erb->eab", Jj, Jj)
        )
        H = H.at[ri[:, :, None], rj[:, None, :]].add(Hij)
        H = H.at[rj[:, :, None], ri[:, None, :]].add(
            jnp.swapaxes(Hij, -1, -2)
        )
        bf = jnp.zeros(6 * N, dtype)
        bf = bf.at[ri].add(jnp.einsum("era,er->ea", Ji, r))
        bf = bf.at[rj].add(jnp.einsum("era,er->ea", Jj, r))

        free = nodes.valid & (jnp.arange(N) >= fix_before)
        free6 = jnp.repeat(free, 6)
        bf = bf * free6
        H = H * free6[:, None] * free6[None, :]
        dH = jnp.diag(H)
        H = H + jnp.diag(1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free6, 0.0, 1.0))
        # equilibrated Cholesky solve — see the 4-DoF branch
        s = jax.lax.rsqrt(jnp.clip(jnp.diag(H), 1e-20)).astype(dtype)
        Hs = H * (s[:, None] * s[None, :])
        cho = jax.scipy.linalg.cho_factor(Hs)
        dx = -(s * jax.scipy.linalg.cho_solve(cho, s * bf)).reshape(N, 6)
        return PoseGraph6Nodes(
            r=nd.r + dx[:, :3],
            q=quat.normalize(quat.multiply(quat.exp(dx[:, 3:6]), nd.q)),
            valid=nd.valid,
        )

    return jax.lax.fori_loop(0, iters, gn_step, nodes)
