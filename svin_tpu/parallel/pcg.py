"""Matrix-free preconditioned-CG global solvers for Cave/Bus-scale problems.

The round-1 distributed BA and pose-graph solvers replicate a DENSE reduced
system — (K·6)² for BA, (N·4)² for the pose graph — which caps problem size
far below the reference's own trajectories (Cave = 1519 keyframes, Bus =
3388, `colmap_groundtruth/*.txt`). This module removes that wall: the
reduced camera system is never materialized. Each Gauss-Newton step solves

    (Hpp_damped − Wᵀ Hll⁻¹ W) dx = −(bp − Wᵀ Hll⁻¹ bl)

by preconditioned conjugate gradients with a block-Jacobi (6×6 pose-block)
preconditioner. One Hv product costs a handful of tiny batched einsums over
the (L, R) observation buckets plus one segment-sum into (K, 6) — linear in
observations, nothing quadratic in K anywhere.

Sharding (the scaling-book recipe): landmarks + their observation buckets
are block-sharded over the mesh axis, poses and the CG state are
replicated; the only collectives are a psum of (K,6,6)+(K,6) at assembly
and a psum of the (K,6) matvec output per CG iteration — both ride ICI.

The same structure applies one level up to the 4-DoF/6-DoF pose graph
(reference ``PoseGraph.cpp:226-543``): edges sharded, nodes replicated,
block-Jacobi 4×4/6×6 preconditioner, one (N,4)/(N,6) psum per CG iteration.

Reference counterpart: Ceres SPARSE_NORMAL_CHOLESKY / SPARSE_SCHUR
(``PoseGraph.cpp:338``, ``Estimator.cpp:876-929``) — re-derived here as an
iterative Schur solve because a distributed sparse Cholesky does not map to
the TPU's compute model, while matvec+psum is exactly what the hardware is
built for.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..loopclosure.posegraph import (
    HUBER_DELTA,
    PoseGraphEdges,
    PoseGraphNodes,
    normalize_angle,
    ypr_to_matrix,
)
from ..estimator.rig import RigParams
from ..ops.linalg3 import inv3x3
from .dist_ba import (
    BucketedProblem,
    _apply_bucketed,
    _reproj_eval_bucketed,
)

_EXACT = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------- PCG
def _pcg(matvec, b, precond, iters: int):
    """Standard PCG on SPD ``A x = b`` from ``x0 = 0``. ``matvec``/
    ``precond`` map pytrees of shape like ``b``. Fixed iteration count
    (static shape, deterministic); a vanishing residual freezes the
    iteration via the alpha/beta guards rather than early exit."""

    def dot(a, c):
        return jnp.sum(a * c)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)

    def body(i, carry):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = dot(p, Ap)
        ok = (pAp > 0) & (rz > 0)
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(ok, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return x


def _inv_blocks(M):
    """Batched small-SPD inverse for the block-Jacobi preconditioner."""
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return jax.vmap(lambda m: jnp.linalg.solve(m, eye))(M)


def pose_major_index(obs_pose, obs_valid, K: int, pad_mult: int = 8):
    """Host-side pose-major permutation for scatter-free pose reductions.

    TPU scatters (segment_sum) serialize into dynamic-update-slices and
    dominate the PCG matvec (~80% measured at Cave scale). This builds a
    (K, Rp) index into the FLATTENED (L·R) observation slots — row k lists
    the slots observed by pose k, padded with the sentinel L·R — so every
    per-pose reduction becomes gather + sum over the Rp axis (gathers
    vectorize on TPU). One host pass per problem."""
    flat_pose = np.asarray(obs_pose).reshape(-1)
    ok = np.asarray(obs_valid).reshape(-1)
    n_slots = flat_pose.shape[0]
    nnz = int(ok.sum())
    key = np.where(ok, flat_pose, K)  # invalid slots sort last
    order = np.argsort(key, kind="stable")
    valid_order = order[:nnz]
    poses_sorted = flat_pose[valid_order]
    counts = np.bincount(poses_sorted, minlength=K)
    Rp = max(pad_mult, -(-int(counts.max() if nnz else 1) // pad_mult) * pad_mult)
    run_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(nnz) - run_start[poses_sorted]
    perm = np.full((K, Rp), n_slots, np.int64)
    perm[poses_sorted, slot] = valid_order
    return jnp.asarray(perm, jnp.int32)


def _pose_reduce(g_flat, flat_pose, K, pose_perm):
    """Σ over observations per pose: gather-based when a pose-major index
    is available, segment-sum otherwise (the sharded paths)."""
    if pose_perm is None:
        return jax.ops.segment_sum(g_flat, flat_pose, num_segments=K)
    pad = jnp.concatenate(
        [g_flat, jnp.zeros((1,) + g_flat.shape[1:], g_flat.dtype)]
    )
    return jnp.sum(pad[pose_perm], axis=1)


# ------------------------------------------------------------ BA (bucketed)
def _ba_assemble_pcg(prob: BucketedProblem, rig: RigParams, K: int, lam,
                     axis_name=None, pose_perm=None):
    """Evaluate factors once; return everything a PCG step needs.

    Returns (r, Jp, Jl) [local], Hll_inv [local], Hpp_damped (global,
    replicated), Minv preconditioner blocks, b_red (global), bl [local],
    cost (global)."""
    L, R = prob.obs_pose.shape
    dtype = prob.pose_r.dtype
    r, Jp, Jl = _reproj_eval_bucketed(prob, rig)  # (L,R,2), (L,R,2,6), (L,R,2,3)

    Hll = jnp.einsum("lria,lrib->lab", Jl, Jl, precision=_EXACT)
    bl = jnp.einsum("lria,lri->la", Jl, r, precision=_EXACT)
    dHll = jnp.einsum("lii->li", Hll)
    damp_l = lam * jnp.maximum(dHll, 1e-6) + jnp.where(
        prob.lm_valid, 0.0, 1.0
    )[:, None]
    Hll_inv = inv3x3(Hll + jax.vmap(jnp.diag)(damp_l))

    flat_pose = prob.obs_pose.reshape(L * R)
    Hpp = _pose_reduce(
        jnp.einsum("lria,lrib->lrab", Jp, Jp).reshape(L * R, 36),
        flat_pose, K, pose_perm,
    ).reshape(K, 6, 6)
    bp = _pose_reduce(
        jnp.einsum("lria,lri->lra", Jp, r).reshape(L * R, 6),
        flat_pose, K, pose_perm,
    )
    # RHS Schur correction: −Wᵀ Hll⁻¹ bl, matrix-free
    u = jnp.einsum("lab,lb->la", Hll_inv, bl)
    s = jnp.einsum("lria,la->lri", Jl, u)
    g = jnp.einsum("lrib,lri->lrb", Jp, s)
    corr = _pose_reduce(g.reshape(L * R, 6), flat_pose, K, pose_perm)
    cost = 0.5 * jnp.sum(r * r)

    if axis_name is not None:
        Hpp = jax.lax.psum(Hpp, axis_name)
        bp = jax.lax.psum(bp, axis_name)
        corr = jax.lax.psum(corr, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    dHpp = jnp.einsum("kii->ki", Hpp)  # (K,6)
    fixed = prob.pose_fixed[:, None]
    damp = lam * jnp.maximum(dHpp, 1e-6)
    damp = damp + jnp.where(fixed > 0, 1.0, 0.0)
    damp = damp + jnp.where(dHpp < 1e-9, 1.0, 0.0)  # unobserved poses
    Hpp_d = Hpp + jax.vmap(jnp.diag)(damp)
    Minv = _inv_blocks(Hpp_d)
    b_red = bp - corr
    return r, Jp, Jl, Hll_inv, Hpp_d, Minv, b_red, bl, cost


def _ba_gn_step_pcg(prob: BucketedProblem, rig: RigParams, K: int, lam,
                    cg_iters: int, axis_name=None, pose_perm=None):
    L, R = prob.obs_pose.shape
    (r, Jp, Jl, Hll_inv, Hpp_d, Minv, b_red, bl, cost) = _ba_assemble_pcg(
        prob, rig, K, lam, axis_name, pose_perm
    )
    flat_pose = prob.obs_pose.reshape(L * R)

    def matvec(v):  # v (K,6) replicated
        vg = v[prob.obs_pose]  # (L,R,6) gather
        t = jnp.einsum("lrib,lrb->lri", Jp, vg)
        u = jnp.einsum("lria,lri->la", Jl, t)
        u = jnp.einsum("lab,lb->la", Hll_inv, u)
        s = jnp.einsum("lria,la->lri", Jl, u)
        g = jnp.einsum("lrib,lri->lrb", Jp, s)
        y2 = _pose_reduce(g.reshape(L * R, 6), flat_pose, K, pose_perm)
        if axis_name is not None:
            y2 = jax.lax.psum(y2, axis_name)
        return jnp.einsum("kab,kb->ka", Hpp_d, v) - y2

    def precond(v):
        return jnp.einsum("kab,kb->ka", Minv, v)

    dx = _pcg(matvec, -b_red, precond, cg_iters)  # (K,6)
    # landmark back-substitution (local): dl = −Hll⁻¹ (bl + W dx)
    t = jnp.einsum("lrib,lrb->lri", Jp, dx[prob.obs_pose])
    w = jnp.einsum("lria,lri->la", Jl, t)
    dl = -jnp.einsum("lab,lb->la", Hll_inv, bl + w)
    return dx, dl, cost


def ba_solve_pcg(
    prob: BucketedProblem, rig: RigParams, iters: int = 10,
    cg_iters: int = 48, lam: float = 1e-3, pose_perm=None,
) -> Tuple[BucketedProblem, jnp.ndarray]:
    """Single-device matrix-free GN+PCG (jit-able as-is). Unlike
    ``ba_solve_bucketed`` nothing scales with K² — Cave-sized (K≈1500) and
    Bus-sized (K≈3400) problems fit one chip. Pass
    ``pose_perm=pose_major_index(prob.obs_pose, prob.obs_valid, K)`` to
    replace every per-pose scatter with a gather (~3× faster matvecs on
    TPU; the index is host-built once per problem)."""
    K = prob.pose_r.shape[0]

    def body(i, p):
        dxk, dl, _ = _ba_gn_step_pcg(
            p, rig, K, jnp.asarray(lam, p.pose_r.dtype), cg_iters,
            pose_perm=pose_perm,
        )
        return _apply_bucketed(p, dxk, dl)

    prob = jax.lax.fori_loop(0, iters, body, prob)
    _, _, cost = _ba_gn_step_pcg(
        prob, rig, K, jnp.asarray(lam, prob.pose_r.dtype), cg_iters,
        pose_perm=pose_perm,
    )
    return prob, cost


def sharded_pose_major_index(
    prob: BucketedProblem, K: int, n_shards: int, pad_mult: int = 8
):
    """Per-shard pose-major indices for the SHARDED PCG path: the landmark
    axis splits into ``n_shards`` blocks; each block gets its own (K, Rp)
    index into ITS flattened (Lloc·R) slot space (all blocks padded to a
    common Rp). Returns an (n_shards, K, Rp) array to shard along axis 0."""
    L, R = prob.obs_pose.shape
    assert L % n_shards == 0
    Lloc = L // n_shards
    perms = [
        np.asarray(
            pose_major_index(
                prob.obs_pose[s * Lloc : (s + 1) * Lloc],
                prob.obs_valid[s * Lloc : (s + 1) * Lloc],
                K, pad_mult,
            )
        )
        for s in range(n_shards)
    ]
    Rp = max(p.shape[1] for p in perms)
    out = np.full((n_shards, K, Rp), Lloc * R, np.int32)
    for s, p in enumerate(perms):
        # re-sentinel: each block's sentinel is ITS slot count
        p = np.where(p >= Lloc * R, Lloc * R, p)
        out[s, :, : p.shape[1]] = p
    return jnp.asarray(out)


def make_sharded_ba_pcg(
    mesh: Mesh, rig: RigParams, K: int, L: int,
    iters: int = 10, cg_iters: int = 48, lam: float = 1e-3,
    axis: str = "data", use_pose_perm: bool = False,
):
    """Distributed matrix-free BA: landmark-axis sharding as in
    ``make_sharded_ba_bucketed`` but with the PCG reduced solve — the
    per-iteration collective volume drops from one (K·6)² psum to
    (K,6,6)+(K,6) at assembly plus one (K,6) psum per CG iteration, so the
    solver scales to Cave/Bus-size pose counts.

    With ``use_pose_perm`` the step takes a second argument (the
    ``sharded_pose_major_index`` array, sharded along axis 0) and performs
    the per-pose reductions as gathers instead of scatters."""
    n = mesh.shape[axis]
    assert L % n == 0, "landmark count must divide the mesh"

    def shard_body(prob: BucketedProblem, *perm_arg):
        perm = perm_arg[0][0] if perm_arg else None  # (1,K,Rp) → (K,Rp)

        def body(i, p):
            dxk, dl, _ = _ba_gn_step_pcg(
                p, rig, K, jnp.asarray(lam, p.pose_r.dtype), cg_iters,
                axis_name=axis, pose_perm=perm,
            )
            return _apply_bucketed(p, dxk, dl)

        prob = jax.lax.fori_loop(0, iters, body, prob)
        _, _, cost = _ba_gn_step_pcg(
            prob, rig, K, jnp.asarray(lam, prob.pose_r.dtype), cg_iters,
            axis_name=axis, pose_perm=perm,
        )
        return prob, cost

    replicated = P()
    sharded = P(axis)
    in_specs = BucketedProblem(
        pose_r=replicated, pose_q=replicated, pose_fixed=replicated,
        lm=sharded, lm_valid=sharded,
        obs_uv=sharded, obs_pose=sharded, obs_cam=sharded, obs_valid=sharded,
    )
    specs = (in_specs, P(axis)) if use_pose_perm else (in_specs,)
    step = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh, in_specs=specs,
            out_specs=(in_specs, replicated),
        )
    )
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), in_specs
    )
    if use_pose_perm:
        return step, (shardings, NamedSharding(mesh, P(axis)))
    return step, shardings


# ------------------------------------------------------ pose graph (4-DoF)
def _pg4_eval(nd: PoseGraphNodes, edges: PoseGraphEdges, free):
    """Edge residuals + Jacobians with fixed-node columns zeroed (the
    masking the dense path applies to H rows/cols, applied at the source)."""
    dtype = nd.p.dtype

    def one(ei, ej, t_ij, yaw_ij, w, il, ok):
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
        wt = jnp.where(ok, w * hub, 0.0)
        Ji = J[:, :4] * jnp.where(free[ei], 1.0, 0.0)
        Jj = J[:, 4:] * jnp.where(free[ej], 1.0, 0.0)
        return wt * r, wt * Ji, wt * Jj

    return jax.vmap(one)(
        edges.i, edges.j, edges.t_ij, edges.yaw_ij, edges.weight,
        edges.is_loop, edges.valid,
    )


def _pg4_gn_step_pcg(nd: PoseGraphNodes, edges: PoseGraphEdges, fix_before,
                     N: int, cg_iters: int, coarse_group: int = 16,
                     axis_name=None):
    """One GN step of the 4-DoF pose graph via two-level PCG.

    Plain block-Jacobi PCG stalls on chain-structured pose graphs: CG moves
    information one edge-hop per iteration, so an N-node odometry chain
    needs ~N iterations for a loop correction to propagate. The cure is a
    TWO-LEVEL preconditioner (additive Schwarz): group every
    ``coarse_group`` consecutive nodes into one coarse node, assemble the
    exact coarse Galerkin operator Hc = Pᵀ H P from the same edge terms
    (piecewise-constant prolongation P), factor it densely ONCE per GN step
    (its size is (N/G·4)² — bounded, e.g. 20k nodes → 1250 coarse nodes),
    and apply  M⁻¹ = blockJacobi(H)⁻¹ + F·P Hc⁻¹ Pᵀ·F  in every CG
    iteration. The coarse solve carries the long-wavelength (global drift)
    modes in one application; block-Jacobi smooths the rest.
    """
    dtype = nd.p.dtype
    free = nd.valid & (jnp.arange(N) >= fix_before)
    r, Ji, Jj = _pg4_eval(nd, edges, free)  # (E,4), (E,4,4), (E,4,4)

    Hd = jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Ji, Ji), edges.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Jj, Jj), edges.j, num_segments=N
    )
    b = jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Ji, r), edges.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Jj, r), edges.j, num_segments=N
    )
    cost = 0.5 * jnp.sum(r * r)

    # coarse Galerkin operator Hc = Pᵀ H P over node groups of coarse_group
    Nc = -(-N // coarse_group)
    coarse = jnp.arange(N) // coarse_group  # (N,)
    ci = coarse[edges.i]
    cj = coarse[edges.j]
    Hii = jnp.einsum("era,erb->eab", Ji, Ji)
    Hjj = jnp.einsum("era,erb->eab", Jj, Jj)
    Hij = jnp.einsum("era,erb->eab", Ji, Jj)
    Hc = (
        jax.ops.segment_sum(Hii, ci * Nc + ci, num_segments=Nc * Nc)
        + jax.ops.segment_sum(Hjj, cj * Nc + cj, num_segments=Nc * Nc)
        + jax.ops.segment_sum(Hij, ci * Nc + cj, num_segments=Nc * Nc)
        + jax.ops.segment_sum(
            jnp.swapaxes(Hij, -1, -2), cj * Nc + ci, num_segments=Nc * Nc
        )
    ).reshape(Nc, Nc, 4, 4)

    if axis_name is not None:
        Hd = jax.lax.psum(Hd, axis_name)
        b = jax.lax.psum(b, axis_name)
        cost = jax.lax.psum(cost, axis_name)
        Hc = jax.lax.psum(Hc, axis_name)

    dH = jnp.einsum("nii->ni", Hd)
    damp = 1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free, 0.0, 1.0)[:, None]
    Hd = Hd + jax.vmap(jnp.diag)(damp)
    Minv = _inv_blocks(Hd)
    b = b * free[:, None]

    # coarse damping = Pᵀ diag(damp) P (replicated inputs — no psum)
    damp_c = jax.ops.segment_sum(damp, coarse, num_segments=Nc)  # (Nc,4)
    Dc = Nc * 4
    Hc_flat = Hc.transpose(0, 2, 1, 3).reshape(Dc, Dc)
    Hc_flat = Hc_flat + jnp.diag(damp_c.reshape(Dc))
    Hc_cho = jax.scipy.linalg.cho_factor(
        Hc_flat + 1e-9 * jnp.eye(Dc, dtype=dtype)
    )
    freef = free[:, None].astype(dtype)

    def matvec(v):  # (N,4)
        t = jnp.einsum("era,ea->er", Ji, v[edges.i]) + jnp.einsum(
            "era,ea->er", Jj, v[edges.j]
        )
        y = jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Ji, t), edges.i, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Jj, t), edges.j, num_segments=N
        )
        if axis_name is not None:
            y = jax.lax.psum(y, axis_name)
        # block-diag damping (+identity on fixed coords) lives OUTSIDE the
        # edge sum: add it from the replicated damp vector
        return y + damp * v

    def precond(v):
        fine = jnp.einsum("nab,nb->na", Minv, v)
        vr = jax.ops.segment_sum(v * freef, coarse, num_segments=Nc)
        uc = jax.scipy.linalg.cho_solve(Hc_cho, vr.reshape(Dc)).reshape(Nc, 4)
        return fine + uc[coarse] * freef

    dx = _pcg(matvec, -b, precond, cg_iters)
    return dx, cost


@partial(jax.jit, static_argnames=("iters", "cg_iters", "coarse_group"))
def optimize_4dof_pcg(
    nodes: PoseGraphNodes,
    edges: PoseGraphEdges,
    fix_before: jnp.ndarray,
    iters: int = 10,
    cg_iters: int = 64,
    coarse_group: int = 16,
) -> PoseGraphNodes:
    """Matrix-free 4-DoF pose-graph GN — nothing scales with N², so graphs
    of tens of thousands of keyframes run where ``optimize_4dof``'s dense
    (4N)² solve cannot. Same semantics (Huber loop edges, fixed nodes
    before ``fix_before``; reference ``PoseGraph.cpp:226-385``)."""
    N = nodes.p.shape[0]

    def gn(_, nd):
        dx, _ = _pg4_gn_step_pcg(
            nd, edges, fix_before, N, cg_iters, coarse_group
        )
        return PoseGraphNodes(
            p=nd.p + dx[:, :3], yaw=nd.yaw + dx[:, 3],
            pitch=nd.pitch, roll=nd.roll, valid=nd.valid,
        )

    return jax.lax.fori_loop(0, iters, gn, nodes)


def make_sharded_posegraph_pcg(
    mesh: Mesh, N: int, E: int, iters: int = 10, cg_iters: int = 64,
    coarse_group: int = 16, axis: str = "data",
):
    """Distributed matrix-free 4-DoF pose graph: edges sharded, nodes +
    CG state replicated, one (N,4) psum per CG iteration plus a coarse
    Galerkin-operator psum per GN step."""
    n_dev = mesh.shape[axis]
    assert E % n_dev == 0

    def shard_body(nodes: PoseGraphNodes, edges: PoseGraphEdges, fix_before):
        def gn(_, nd):
            dx, _ = _pg4_gn_step_pcg(
                nd, edges, fix_before, N, cg_iters, coarse_group,
                axis_name=axis,
            )
            return PoseGraphNodes(
                p=nd.p + dx[:, :3], yaw=nd.yaw + dx[:, 3],
                pitch=nd.pitch, roll=nd.roll, valid=nd.valid,
            )

        out = jax.lax.fori_loop(0, iters, gn, nodes)
        _, cost = _pg4_gn_step_pcg(
            out, edges, fix_before, N, cg_iters, coarse_group,
            axis_name=axis,
        )
        return out, cost

    rep = P()
    node_spec = PoseGraphNodes(p=rep, yaw=rep, pitch=rep, roll=rep, valid=rep)
    edge_spec = PoseGraphEdges(
        i=P(axis), j=P(axis), t_ij=P(axis), yaw_ij=P(axis),
        weight=P(axis), is_loop=P(axis), valid=P(axis),
    )
    step = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(node_spec, edge_spec, rep),
            out_specs=(node_spec, rep),
        )
    )
    shardings = (
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), node_spec),
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), edge_spec),
    )
    return step, shardings


# ------------------------------------------------- 6-DoF pose graph (SE(3))
def _pg6_eval(nd, edges, free):
    """6-DoF edge residuals + Jacobians with fixed-node columns zeroed
    (the SE(3) analog of ``_pg4_eval``; residual semantics identical to
    ``loopclosure.posegraph.optimize_6dof`` / the reference's
    PoseGraph3dErrorTerm, ``Pose3DError.h:155``)."""
    from ..kinematics import quaternion as quat

    from ..loopclosure.posegraph import HUBER_DELTA

    dtype = nd.r.dtype
    il_arr = (
        edges.is_loop if edges.is_loop is not None
        else jnp.zeros(edges.i.shape[0], bool)
    )

    def one(ei, ej, t_ij, q_ij, W, ok, il):
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
        # Huber(0.1) on loop edges (PoseGraph.cpp:423,490). Typed casts —
        # a jnp.where of two weak Python floats promotes to the x64
        # default dtype and would upcast the whole solve.
        n = jnp.linalg.norm(r)
        hub = jnp.where(
            il & (n > HUBER_DELTA),
            jnp.sqrt(HUBER_DELTA / jnp.maximum(n, 1e-12)), 1.0,
        ).astype(dtype)
        w = ok.astype(dtype) * hub
        Ji = J[:, :6] * free[ei].astype(dtype)
        Jj = J[:, 6:] * free[ej].astype(dtype)
        return w * r, w * Ji, w * Jj

    return jax.vmap(one)(
        edges.i, edges.j, edges.t_ij, edges.q_ij, edges.sqrt_info,
        edges.valid, il_arr,
    )


def _pg6_gn_step_pcg(nd, edges, fix_before, N: int, cg_iters: int,
                     coarse_group: int = 16, axis_name=None):
    """One SE(3) pose-graph GN step via the same two-level PCG as the
    4-DoF path: block-Jacobi 6×6 + exact coarse Galerkin operator over
    ``coarse_group``-node groups (the (6N)² dense solve of
    ``optimize_6dof`` never materializes)."""
    dtype = nd.r.dtype
    free = nd.valid & (jnp.arange(N) >= fix_before)
    r, Ji, Jj = _pg6_eval(nd, edges, free)  # (E,6), (E,6,6), (E,6,6)

    Hd = jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Ji, Ji), edges.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Jj, Jj), edges.j, num_segments=N
    )
    b = jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Ji, r), edges.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Jj, r), edges.j, num_segments=N
    )
    cost = 0.5 * jnp.sum(r * r)

    Nc = -(-N // coarse_group)
    coarse = jnp.arange(N) // coarse_group
    ci = coarse[edges.i]
    cj = coarse[edges.j]
    Hii = jnp.einsum("era,erb->eab", Ji, Ji)
    Hjj = jnp.einsum("era,erb->eab", Jj, Jj)
    Hij = jnp.einsum("era,erb->eab", Ji, Jj)
    Hc = (
        jax.ops.segment_sum(Hii, ci * Nc + ci, num_segments=Nc * Nc)
        + jax.ops.segment_sum(Hjj, cj * Nc + cj, num_segments=Nc * Nc)
        + jax.ops.segment_sum(Hij, ci * Nc + cj, num_segments=Nc * Nc)
        + jax.ops.segment_sum(
            jnp.swapaxes(Hij, -1, -2), cj * Nc + ci, num_segments=Nc * Nc
        )
    ).reshape(Nc, Nc, 6, 6)

    if axis_name is not None:
        Hd = jax.lax.psum(Hd, axis_name)
        b = jax.lax.psum(b, axis_name)
        cost = jax.lax.psum(cost, axis_name)
        Hc = jax.lax.psum(Hc, axis_name)

    dH = jnp.einsum("nii->ni", Hd)
    damp = 1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free, 0.0, 1.0)[:, None]
    Hd = Hd + jax.vmap(jnp.diag)(damp)
    Minv = _inv_blocks(Hd)
    b = b * free[:, None]

    damp_c = jax.ops.segment_sum(damp, coarse, num_segments=Nc)  # (Nc,6)
    Dc = Nc * 6
    Hc_flat = Hc.transpose(0, 2, 1, 3).reshape(Dc, Dc)
    Hc_flat = Hc_flat + jnp.diag(damp_c.reshape(Dc))
    Hc_cho = jax.scipy.linalg.cho_factor(
        Hc_flat + 1e-9 * jnp.eye(Dc, dtype=dtype)
    )
    freef = free[:, None].astype(dtype)

    def matvec(v):  # (N,6)
        t = jnp.einsum("era,ea->er", Ji, v[edges.i]) + jnp.einsum(
            "era,ea->er", Jj, v[edges.j]
        )
        y = jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Ji, t), edges.i, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Jj, t), edges.j, num_segments=N
        )
        if axis_name is not None:
            y = jax.lax.psum(y, axis_name)
        return y + damp * v

    def precond(v):
        fine = jnp.einsum("nab,nb->na", Minv, v)
        vr = jax.ops.segment_sum(v * freef, coarse, num_segments=Nc)
        uc = jax.scipy.linalg.cho_solve(Hc_cho, vr.reshape(Dc)).reshape(Nc, 6)
        return fine + uc[coarse] * freef

    dx = _pcg(matvec, -b, precond, cg_iters)
    return dx, cost


@partial(jax.jit, static_argnames=("iters", "cg_iters", "coarse_group"))
def optimize_6dof_pcg(
    nodes,
    edges,
    fix_before: jnp.ndarray,
    iters: int = 5,
    cg_iters: int = 96,
    coarse_group: int = 16,
):
    """Matrix-free SE(3) pose-graph GN (reference
    ``PoseGraph::optimize6DoFPoseGraph``, ``PoseGraph.cpp:387-543``) —
    the 6-DoF mode's Cave/Bus-scale path; semantics match the dense
    ``optimize_6dof`` (equivalence-tested)."""
    from ..kinematics import quaternion as quat
    from ..loopclosure.posegraph import PoseGraph6Nodes

    N = nodes.r.shape[0]

    def gn(_, nd):
        dx, _ = _pg6_gn_step_pcg(
            nd, edges, fix_before, N, cg_iters, coarse_group
        )
        return PoseGraph6Nodes(
            r=nd.r + dx[:, :3],
            q=quat.normalize(quat.multiply(quat.exp(dx[:, 3:6]), nd.q)),
            valid=nd.valid,
        )

    return jax.lax.fori_loop(0, iters, gn, nodes)
