"""Distributed bundle adjustment over a device mesh.

New capability beyond the reference (which is single-machine, two-process —
SURVEY.md §2.5): global/multi-session bundle adjustment scaled across TPU
chips. The decomposition follows the Schur structure:

- **Landmarks + their observations are sharded** over the mesh axis
  (block partition, fixed shapes per shard).
- **Poses are replicated** (a map has few keyframes relative to landmarks).
- Each device assembles its local block normal equations and eliminates its
  3x3 landmark blocks locally; the reduced camera systems (H_red, b_red) are
  merged with one ``psum`` over ICI; the dense reduced solve is replicated;
  landmark back-substitution is local. One collective per GN iteration.

This is exactly the "per-host Schur-reduced camera systems merged via
psum/all_gather" plan of BASELINE.json, expressed with shard_map so the same
program runs on 1 chip, an 8-device host, or a multi-host pod slice.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cameras.pinhole import project, project_jacobian
from ..estimator.rig import RigParams
from ..ops.linalg3 import inv3x3
from ..ops.solve import solve_spd

# exact-f32 matmul accumulation for Hessian/gradient reductions (TPU
# default truncates operands to bfloat16 — ~1e-3 relative error in H,b)
_EXACT = jax.lax.Precision.HIGHEST
from ..kinematics import Transformation, quaternion as quat


class GlobalMapProblem(NamedTuple):
    """Global BA problem. Leading dims: K poses (replicated), L landmarks and
    O observations (shardable along their leading axis)."""

    pose_r: jnp.ndarray  # (K,3)
    pose_q: jnp.ndarray  # (K,4)
    pose_fixed: jnp.ndarray  # (K,) bool — gauge anchors
    lm: jnp.ndarray  # (L,3)
    lm_valid: jnp.ndarray  # (L,)
    obs_uv: jnp.ndarray  # (O,2)
    obs_pose: jnp.ndarray  # (O,) int32
    obs_lm: jnp.ndarray  # (O,) int32 GLOBAL landmark index
    obs_cam: jnp.ndarray  # (O,) int32
    obs_valid: jnp.ndarray  # (O,)


def _reproj_eval(prob: GlobalMapProblem, rig: RigParams, lm_base: jnp.ndarray):
    """Residuals + Jacobians for a (local) obs shard. ``lm_base`` is the
    global index of this shard's first landmark (obs_lm is global)."""

    def one(uv, pi, li_g, ci, ok):
        li = li_g - lm_base
        T_WS = Transformation(r=prob.pose_r[pi], q=prob.pose_q[pi])
        T_SC = rig.T_SC(ci)
        p_W = prob.lm[li]
        C_SW = quat.to_rotation_matrix(T_WS.q).T
        C_CS = quat.to_rotation_matrix(T_SC.q).T
        p_S = C_SW @ (p_W - T_WS.r)
        p_C = C_CS @ (p_S - T_SC.r)
        cam = rig.camera(ci)
        uv_hat, _ = project(cam, p_C)
        ok = ok & (p_C[2] > 0.2) & prob.lm_valid[li]
        Juv = project_jacobian(cam, p_C)
        C_CW = C_CS @ C_SW
        Jp = -Juv @ jnp.concatenate(
            [-C_CW, C_CW @ quat.cross_mx(p_W - T_WS.r)], axis=1
        )
        Jp = Jp * (1.0 - prob.pose_fixed[pi])  # gauge: no update to fixed poses
        Jl = -Juv @ C_CW
        r = uv - uv_hat
        # Huber-style IRLS weight at 3 px
        n = jnp.linalg.norm(r)
        w = jnp.sqrt(jnp.where(n > 3.0, 3.0 / n, 1.0))
        w = jnp.where(ok, w, 0.0)
        return w * r, w * Jp, w * Jl, li

    return jax.vmap(one)(
        prob.obs_uv, prob.obs_pose, prob.obs_lm, prob.obs_cam, prob.obs_valid
    )


def _local_normal_eqs(prob, rig, lm_base, K, Lloc):
    r, Jp, Jl, li = _reproj_eval(prob, rig, lm_base)
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jp, Jp), prob.obs_pose, num_segments=K
    )
    bp = jax.ops.segment_sum(
        jnp.einsum("oia,oi->oa", Jp, r), prob.obs_pose, num_segments=K
    )
    Hll = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jl, Jl), li, num_segments=Lloc
    )
    bl = jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jl, r), li, num_segments=Lloc)
    W = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jl, Jp), li * K + prob.obs_pose,
        num_segments=Lloc * K,
    ).reshape(Lloc, K, 3, 6)
    cost = 0.5 * jnp.sum(r * r)
    return Hpp, bp, Hll, bl, W, cost


def _gn_iteration(prob: GlobalMapProblem, rig: RigParams, lm_base, K, Lloc,
                  lam, axis_name=None):
    dtype = prob.pose_r.dtype
    Hpp, bp, Hll, bl, W, cost = _local_normal_eqs(prob, rig, lm_base, K, Lloc)

    # local landmark elimination
    dHll = jnp.einsum("lii->li", Hll)
    damp_l = lam * jnp.maximum(dHll, 1e-6) + jnp.where(
        prob.lm_valid, 0.0, 1.0
    )[:, None]
    Hll_d = Hll + jax.vmap(jnp.diag)(damp_l)
    Hll_inv = inv3x3(Hll_d)  # closed-form batched 3x3 (VPU-fusable)
    # reduced camera system H -= Wᵀ Hll⁻¹ W as ONE (K·6, L·3)x(L·3, K·6)
    # MXU matmul (flat layout row=(l,a), col=(k,b)) — the blockwise einsum
    # form does not tile onto the systolic array
    D = K * 6
    Wf = W.transpose(0, 2, 1, 3).reshape(Lloc * 3, D)
    HiW = jnp.matmul(
        Hll_inv, W.transpose(0, 2, 1, 3).reshape(Lloc, 3, D),
        precision=_EXACT,
    ).reshape(Lloc * 3, D)
    Hib = jnp.einsum("lab,lb->la", Hll_inv, bl).reshape(Lloc * 3)
    H = -jnp.matmul(Wf.T, HiW, precision=_EXACT)
    rows = (jnp.arange(K)[:, None] * 6 + jnp.arange(6)[None, :])
    H = H.at[rows[:, :, None], rows[:, None, :]].add(Hpp)
    b = bp.reshape(D) - jnp.matmul(Wf.T, Hib, precision=_EXACT)

    # merge shards over the mesh (one psum per iteration) + cost for LM
    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    fixed_coords = jnp.repeat(prob.pose_fixed, 6)
    dH = jnp.diag(H)
    damp = lam * jnp.maximum(dH, 1e-6) + jnp.where(fixed_coords, 1.0, 0.0)
    damp = damp + jnp.where(dH < 1e-9, 1.0, 0.0)  # unobserved poses
    H = H + jnp.diag(damp)
    dx = -solve_spd(H, b)
    dxk = dx.reshape(K, 6)
    # landmark back-substitution (local, one (L·3, D) @ (D,) matvec)
    dl = -jnp.einsum(
        "lab,lb->la", Hll_inv,
        bl + jnp.matmul(Wf, dx, precision=_EXACT).reshape(Lloc, 3),
    )
    return dxk, dl, cost


def _apply(prob: GlobalMapProblem, dxk, dl) -> GlobalMapProblem:
    fixed = prob.pose_fixed[:, None]
    r_new = jnp.where(fixed > 0, prob.pose_r, prob.pose_r + dxk[:, :3])
    q_new = jnp.where(
        fixed > 0,
        prob.pose_q,
        quat.normalize(quat.multiply(quat.exp(dxk[:, 3:6]), prob.pose_q)),
    )
    lm_new = jnp.where(prob.lm_valid[:, None], prob.lm + dl, prob.lm)
    return prob._replace(pose_r=r_new, pose_q=q_new, lm=lm_new)


def ba_solve_local(
    prob: GlobalMapProblem, rig: RigParams, iters: int = 10, lam: float = 1e-3
) -> Tuple[GlobalMapProblem, jnp.ndarray]:
    """Single-device reference GN (no mesh). Returns (problem, final cost)."""
    K = prob.pose_r.shape[0]
    L = prob.lm.shape[0]
    lm_base = jnp.int32(0)

    def body(i, p):
        dxk, dl, _ = _gn_iteration(p, rig, lm_base, K, L, jnp.asarray(lam, p.pose_r.dtype))
        return _apply(p, dxk, dl)

    prob = jax.lax.fori_loop(0, iters, body, prob)
    _, _, cost = _gn_iteration(prob, rig, lm_base, K, L, jnp.asarray(lam, prob.pose_r.dtype))
    return prob, cost


def make_sharded_ba(mesh: Mesh, rig: RigParams, K: int, L: int, O: int,
                    iters: int = 10, lam: float = 1e-3, axis: str = "data"):
    """Build the pjit-able distributed BA step for a mesh.

    The problem must be pre-partitioned: lm/lm_valid sharded along axis 0,
    obs_* sharded along axis 0 with every observation placed on its
    landmark's shard (obs_lm holds GLOBAL landmark indices).
    Returns ``(step_fn, shardings)``.
    """
    n = mesh.shape[axis]
    assert L % n == 0 and O % n == 0, "shard dims must divide evenly"
    Lloc = L // n

    def shard_body(prob: GlobalMapProblem):
        # device position along the sharded axis
        idx = jax.lax.axis_index(axis)
        lm_base = (idx * Lloc).astype(jnp.int32)

        def body(i, p):
            dxk, dl, _ = _gn_iteration(
                p, rig, lm_base, K, Lloc,
                jnp.asarray(lam, p.pose_r.dtype), axis_name=axis,
            )
            return _apply(p, dxk, dl)

        prob = jax.lax.fori_loop(0, iters, body, prob)
        _, _, cost = _gn_iteration(
            prob, rig, lm_base, K, Lloc,
            jnp.asarray(lam, prob.pose_r.dtype), axis_name=axis,
        )
        return prob, cost

    replicated = P()
    sharded = P(axis)
    in_specs = GlobalMapProblem(
        pose_r=replicated, pose_q=replicated, pose_fixed=replicated,
        lm=sharded, lm_valid=sharded,
        obs_uv=sharded, obs_pose=sharded, obs_lm=sharded, obs_cam=sharded,
        obs_valid=sharded,
    )
    step = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh, in_specs=(in_specs,),
            out_specs=(in_specs, replicated),
        )
    )
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), in_specs
    )
    return step, shardings


def partition_problem(prob: GlobalMapProblem, n: int) -> GlobalMapProblem:
    """Re-order observations so each obs lives on its landmark's shard and
    pad per-shard observation counts to a common size (host-side prep)."""
    import numpy as np

    L = prob.lm.shape[0]
    assert L % n == 0
    Lloc = L // n
    obs_shard = np.asarray(prob.obs_lm) // Lloc
    valid = np.asarray(prob.obs_valid)
    per = []
    for s in range(n):
        idx = np.nonzero((obs_shard == s) & valid)[0]
        per.append(idx)
    cap = max(len(i) for i in per)
    cap = -(-cap // 8) * 8  # pad to multiple of 8
    O_new = cap * n

    def gather_pad(x, fill=0):
        xs = []
        x_np = np.asarray(x)
        for idx in per:
            block = x_np[idx]
            pad_shape = (cap - len(idx),) + x_np.shape[1:]
            xs.append(np.concatenate([block, np.full(pad_shape, fill, x_np.dtype)]))
        return jnp.asarray(np.concatenate(xs))

    return prob._replace(
        obs_uv=gather_pad(prob.obs_uv),
        obs_pose=gather_pad(prob.obs_pose),
        obs_lm=gather_pad(prob.obs_lm),
        obs_cam=gather_pad(prob.obs_cam),
        obs_valid=gather_pad(prob.obs_valid, fill=False),
    )


# ---------------------------------------------------------------------------
# Bucketed layout: observations grouped per landmark, (L, R) fixed shapes.
# Every segment-sum scatter of the flat layout (the dominant per-iteration
# cost on TPU — scatters lower to serial dynamic-update-slices) becomes a
# plain reduction over the bucket axis or a small one-hot matmul, and in the
# sharded build observations travel with their landmark's shard for free.
# ---------------------------------------------------------------------------


class BucketedProblem(NamedTuple):
    """Global BA problem with per-landmark observation buckets. K poses are
    replicated; all (L, ...) arrays shard along the landmark axis."""

    pose_r: jnp.ndarray  # (K,3)
    pose_q: jnp.ndarray  # (K,4)
    pose_fixed: jnp.ndarray  # (K,)
    lm: jnp.ndarray  # (L,3)
    lm_valid: jnp.ndarray  # (L,)
    obs_uv: jnp.ndarray  # (L,R,2)
    obs_pose: jnp.ndarray  # (L,R) int32 (global pose index)
    obs_cam: jnp.ndarray  # (L,R) int32
    obs_valid: jnp.ndarray  # (L,R)


def bucket_problem(prob: GlobalMapProblem, R: int = 0) -> BucketedProblem:
    """Host-side re-layout: group observations by landmark into fixed-size
    buckets (R = max observations per landmark, rounded up to a multiple of
    4; observations beyond R are dropped with a log note)."""
    import logging

    import numpy as np

    L = prob.lm.shape[0]
    valid = np.asarray(prob.obs_valid)
    lm_idx = np.asarray(prob.obs_lm)[valid]
    counts = np.bincount(lm_idx, minlength=L)
    r_needed = int(counts.max()) if counts.size else 1
    if R <= 0:
        R = max(4, -(-r_needed // 4) * 4)
    elif r_needed > R:
        logging.getLogger(__name__).info(
            "bucket_problem: dropping %d observations beyond bucket size %d",
            int(np.sum(np.maximum(counts - R, 0))), R,
        )
    uv = np.zeros((L, R, 2), np.asarray(prob.obs_uv).dtype)
    pose = np.zeros((L, R), np.int32)
    cam = np.zeros((L, R), np.int32)
    ok = np.zeros((L, R), bool)
    # vectorized slot assignment: stable-sort by landmark, slot = rank
    # within the landmark's contiguous run (no per-obs Python loop)
    order = np.argsort(lm_idx, kind="stable")
    lm_sorted = lm_idx[order]
    run_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_sorted = np.arange(lm_sorted.shape[0]) - run_start[lm_sorted]
    keep = slot_sorted < R
    li, si, oi = lm_sorted[keep], slot_sorted[keep], order[keep]
    uv[li, si] = np.asarray(prob.obs_uv)[valid][oi]
    pose[li, si] = np.asarray(prob.obs_pose)[valid][oi]
    cam[li, si] = np.asarray(prob.obs_cam)[valid][oi]
    ok[li, si] = True
    return BucketedProblem(
        pose_r=prob.pose_r, pose_q=prob.pose_q, pose_fixed=prob.pose_fixed,
        lm=prob.lm, lm_valid=prob.lm_valid,
        obs_uv=jnp.asarray(uv), obs_pose=jnp.asarray(pose),
        obs_cam=jnp.asarray(cam), obs_valid=jnp.asarray(ok),
    )


def _reproj_eval_bucketed(prob: BucketedProblem, rig: RigParams):
    """Residuals + Jacobians over the (L,R) buckets (landmark = own row)."""
    L, R = prob.obs_pose.shape

    def one(uv, pi, ci, ok, p_W, lm_ok):
        T_WS = Transformation(r=prob.pose_r[pi], q=prob.pose_q[pi])
        T_SC = rig.T_SC(ci)
        C_SW = quat.to_rotation_matrix(T_WS.q).T
        C_CS = quat.to_rotation_matrix(T_SC.q).T
        p_S = C_SW @ (p_W - T_WS.r)
        p_C = C_CS @ (p_S - T_SC.r)
        cam = rig.camera(ci)
        uv_hat, _ = project(cam, p_C)
        ok = ok & (p_C[2] > 0.2) & lm_ok
        Juv = project_jacobian(cam, p_C)
        C_CW = C_CS @ C_SW
        Jp = -Juv @ jnp.concatenate(
            [-C_CW, C_CW @ quat.cross_mx(p_W - T_WS.r)], axis=1
        )
        Jp = Jp * (1.0 - prob.pose_fixed[pi])
        Jl = -Juv @ C_CW
        r = uv - uv_hat
        n = jnp.linalg.norm(r)
        w = jnp.sqrt(jnp.where(n > 3.0, 3.0 / n, 1.0))
        w = jnp.where(ok, w, 0.0)
        return w * r, w * Jp, w * Jl

    per_lm = jax.vmap(jax.vmap(one, in_axes=(0, 0, 0, 0, None, None)))
    return per_lm(
        prob.obs_uv, prob.obs_pose, prob.obs_cam, prob.obs_valid,
        prob.lm, prob.lm_valid,
    )


def _normal_eqs_bucketed(prob: BucketedProblem, rig: RigParams, K: int):
    """Scatter-free normal equations: bucket-axis reductions for the
    landmark blocks, one-hot matmuls for the pose blocks and W."""
    dtype = prob.pose_r.dtype
    L, R = prob.obs_pose.shape
    r, Jp, Jl = _reproj_eval_bucketed(prob, rig)  # (L,R,2), (L,R,2,6), (L,R,2,3)
    Hll = jnp.einsum("lria,lrib->lab", Jl, Jl, precision=_EXACT)  # (L,3,3)
    bl = jnp.einsum("lria,lri->la", Jl, r, precision=_EXACT)  # (L,3)
    oh = jax.nn.one_hot(prob.obs_pose, K, dtype=dtype)  # (L,R,K)
    Hpp_o = jnp.einsum("lria,lrib->lrab", Jp, Jp).reshape(L * R, 36)
    Hpp = jnp.matmul(
        oh.reshape(L * R, K).T, Hpp_o, precision=_EXACT
    ).reshape(K, 6, 6)
    bp = jnp.matmul(
        oh.reshape(L * R, K).T,
        jnp.einsum("lria,lri->lra", Jp, r).reshape(L * R, 6),
        precision=_EXACT,
    )
    W = jnp.einsum(
        "lrk,lrab->lakb", oh, jnp.einsum("lria,lrib->lrab", Jl, Jp),
        precision=_EXACT,
    )  # (L,3,K,6) — directly in the flat-matmul layout (no transpose copy)
    cost = 0.5 * jnp.sum(r * r)
    return Hpp, bp, Hll, bl, W, cost


def _gn_iteration_bucketed(prob: BucketedProblem, rig: RigParams, K, lam,
                           axis_name=None):
    L = prob.lm.shape[0]
    Hpp, bp, Hll, bl, W, cost = _normal_eqs_bucketed(prob, rig, K)

    dHll = jnp.einsum("lii->li", Hll)
    damp_l = lam * jnp.maximum(dHll, 1e-6) + jnp.where(
        prob.lm_valid, 0.0, 1.0
    )[:, None]
    Hll_inv = inv3x3(Hll + jax.vmap(jnp.diag)(damp_l))
    D = K * 6
    Wf = W.reshape(L * 3, D)  # already (L,3,K,6)
    HiW = jnp.matmul(
        Hll_inv, W.reshape(L, 3, D), precision=_EXACT
    ).reshape(L * 3, D)
    Hib = jnp.einsum("lab,lb->la", Hll_inv, bl).reshape(L * 3)
    H = -jnp.matmul(Wf.T, HiW, precision=_EXACT)
    rows = (jnp.arange(K)[:, None] * 6 + jnp.arange(6)[None, :])
    H = H.at[rows[:, :, None], rows[:, None, :]].add(Hpp)
    b = bp.reshape(D) - jnp.matmul(Wf.T, Hib, precision=_EXACT)

    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    fixed_coords = jnp.repeat(prob.pose_fixed, 6)
    dH = jnp.diag(H)
    damp = lam * jnp.maximum(dH, 1e-6) + jnp.where(fixed_coords, 1.0, 0.0)
    damp = damp + jnp.where(dH < 1e-9, 1.0, 0.0)
    H = H + jnp.diag(damp)
    dx = -solve_spd(H, b)
    dl = -jnp.einsum(
        "lab,lb->la", Hll_inv,
        bl + jnp.matmul(Wf, dx, precision=_EXACT).reshape(L, 3),
    )
    return dx.reshape(K, 6), dl, cost


def _apply_bucketed(prob: BucketedProblem, dxk, dl) -> BucketedProblem:
    fixed = prob.pose_fixed[:, None]
    r_new = jnp.where(fixed > 0, prob.pose_r, prob.pose_r + dxk[:, :3])
    q_new = jnp.where(
        fixed > 0,
        prob.pose_q,
        quat.normalize(quat.multiply(quat.exp(dxk[:, 3:6]), prob.pose_q)),
    )
    lm_new = jnp.where(prob.lm_valid[:, None], prob.lm + dl, prob.lm)
    return prob._replace(pose_r=r_new, pose_q=q_new, lm=lm_new)


def ba_solve_bucketed(
    prob: BucketedProblem, rig: RigParams, iters: int = 10, lam: float = 1e-3
) -> Tuple[BucketedProblem, jnp.ndarray]:
    """Single-device bucketed GN (the fast path; jit-able as-is)."""
    K = prob.pose_r.shape[0]

    def body(i, p):
        dxk, dl, _ = _gn_iteration_bucketed(
            p, rig, K, jnp.asarray(lam, p.pose_r.dtype)
        )
        return _apply_bucketed(p, dxk, dl)

    prob = jax.lax.fori_loop(0, iters, body, prob)
    _, _, cost = _gn_iteration_bucketed(
        prob, rig, K, jnp.asarray(lam, prob.pose_r.dtype)
    )
    return prob, cost


def make_sharded_ba_bucketed(
    mesh: Mesh, rig: RigParams, K: int, L: int,
    iters: int = 10, lam: float = 1e-3, axis: str = "data",
):
    """Distributed bucketed BA: (L, ...) arrays block-sharded along the
    landmark axis (observations ride with their landmark's shard by
    construction — no host re-partitioning step), poses replicated, one
    psum of the reduced camera system per GN iteration."""
    n = mesh.shape[axis]
    assert L % n == 0, "landmark count must divide the mesh"

    def shard_body(prob: BucketedProblem):
        def body(i, p):
            dxk, dl, _ = _gn_iteration_bucketed(
                p, rig, K, jnp.asarray(lam, p.pose_r.dtype), axis_name=axis
            )
            return _apply_bucketed(p, dxk, dl)

        prob = jax.lax.fori_loop(0, iters, body, prob)
        _, _, cost = _gn_iteration_bucketed(
            prob, rig, K, jnp.asarray(lam, prob.pose_r.dtype), axis_name=axis
        )
        return prob, cost

    replicated = P()
    sharded = P(axis)
    in_specs = BucketedProblem(
        pose_r=replicated, pose_q=replicated, pose_fixed=replicated,
        lm=sharded, lm_valid=sharded,
        obs_uv=sharded, obs_pose=sharded, obs_cam=sharded, obs_valid=sharded,
    )
    step = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh, in_specs=(in_specs,),
            out_specs=(in_specs, replicated),
        )
    )
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), in_specs
    )
    return step, shardings
