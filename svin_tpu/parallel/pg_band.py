"""Banded 4-DoF pose-graph solver: the Cave+Bus-joint-scale optimizer
restructured the same way ``tracks.py`` restructures global BA.

A SLAM pose graph is a temporal chain: sequential edges connect node i to
i+1..i+w (w small), only loop edges jump. On-chip profiling of the generic
PCG path (``pcg._pg4_gn_step_pcg``) shows its cost is edge gathers +
segment-sums (~1.2 ms per CG iteration at 20k nodes) plus a 5.9 ms
AD-jacfwd edge evaluation. Here:

- sequential edges are stored sorted by ``i``; a block of B consecutive
  edges touches a static window of ~S consecutive nodes, so every
  gather/scatter is a per-block one-hot matmul against a dynamic slice of
  the node vector (zero HBM gathers, zero scatters);
- loop edges (arbitrary i->j, Huber-weighted) stay in a small COO set
  evaluated exactly like the generic path;
- edge Jacobians are closed-form channels: for the 4-DoF residual
  r = [R_i^T (p_j - p_i) - t_ij, 0.3*wrap(yaw_j - yaw_i - yaw_ij)]
  the Gauss-Newton blocks collapse (R orthonormal) to
  Hii = w2*[[I, -m],[-m^T, a.a+0.09]], Hjj = w2*[[I,0],[0,0.09]],
  Hij = w2*[[-I, 0],[m^T, -0.09]] with a = (dR/dyaw)^T d, m = R a —
  five channel arrays replace the (E,4,8) AD Jacobian;
- the coarse level of the two-level preconditioner uses CONTIGUOUS node
  groups, so restriction/prolongation are reshape-sums, and the coarse
  operator is inverted explicitly once per GN step (a dense matmul per CG
  application instead of a latency-bound triangular solve).

Semantics match ``pcg.optimize_4dof_pcg`` (same damping, Huber, fixed-node
masking, two-level preconditioner; reference ``PoseGraph.cpp:226-385``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..loopclosure.posegraph import (
    HUBER_DELTA,
    PoseGraphEdges,
    PoseGraphNodes,
    normalize_angle,
)
from .pcg import _pcg, _inv_blocks, _pg4_eval


class BandMeta(NamedTuple):
    B: int          # edges per block
    S: int          # node-window size per block
    N: int          # nodes (padded to a multiple of coarse_group)
    n_blocks: int
    Ec: int         # COO edge count
    coarse_group: int


class BandedPoseGraph(NamedTuple):
    nodes: PoseGraphNodes
    be_i: jnp.ndarray      # (Eb,) int32, sorted ascending
    be_j: jnp.ndarray      # (Eb,) int32 (= i + d, d in [1, wmax])
    be_t: jnp.ndarray      # (Eb,3)
    be_yaw: jnp.ndarray    # (Eb,)
    be_w: jnp.ndarray      # (Eb,)
    be_valid: jnp.ndarray  # (Eb,)
    lo: jnp.ndarray        # (NB,) int32 window starts
    co: PoseGraphEdges     # loop/irregular edges (COO, Huber on is_loop)


def band_posegraph(
    nodes: PoseGraphNodes, edges: PoseGraphEdges,
    block: int = 1024, wmax: int = 4, coarse_group: int = 64,
) -> Tuple[BandedPoseGraph, BandMeta]:
    """Host-side split of a pose graph into banded sequential edges + COO
    leftovers. Nodes are assumed temporally ordered (true of every graph
    the loop closer builds); nodes/edges are padded as needed."""
    N0 = int(nodes.p.shape[0])
    N = -(-N0 // coarse_group) * coarse_group
    if N != N0:
        pad = N - N0
        nodes = PoseGraphNodes(
            p=jnp.concatenate([nodes.p, jnp.zeros((pad, 3), nodes.p.dtype)]),
            yaw=jnp.concatenate([nodes.yaw, jnp.zeros(pad, nodes.yaw.dtype)]),
            pitch=jnp.concatenate(
                [nodes.pitch, jnp.zeros(pad, nodes.pitch.dtype)]),
            roll=jnp.concatenate(
                [nodes.roll, jnp.zeros(pad, nodes.roll.dtype)]),
            valid=jnp.concatenate([nodes.valid, jnp.zeros(pad, bool)]),
        )

    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    ok = np.asarray(edges.valid)
    d = ej - ei
    banded = ok & (~np.asarray(edges.is_loop)) & (d >= 1) & (d <= wmax)
    rows = np.nonzero(banded)[0]
    rows = rows[np.argsort(ei[rows], kind="stable")]
    Eb = -(-max(len(rows), 1) // block) * block
    be_i = np.zeros(Eb, np.int32)
    be_j = np.ones(Eb, np.int32)  # padded edges: 0 -> 1, weight 0
    be_t = np.zeros((Eb, 3), np.asarray(edges.t_ij).dtype)
    be_yaw = np.zeros(Eb, np.asarray(edges.yaw_ij).dtype)
    be_w = np.zeros(Eb, np.asarray(edges.weight).dtype)
    be_ok = np.zeros(Eb, bool)
    n = len(rows)
    be_i[:n] = ei[rows]
    be_j[:n] = ej[rows]
    be_t[:n] = np.asarray(edges.t_ij)[rows]
    be_yaw[:n] = np.asarray(edges.yaw_ij)[rows]
    be_w[:n] = np.asarray(edges.weight)[rows]
    be_ok[:n] = True

    NB = Eb // block
    lo = be_i[np.arange(NB) * block]
    hi_i = be_i[np.minimum(np.arange(1, NB + 1) * block - 1, n - 1)] if n else lo
    S = int((hi_i - lo).max() if NB else 0) + wmax + 1
    # quantize S to a power of two (≥64): S is data-dependent (the widest
    # block's node span), and an 8-rounded S changed every few keyframes
    # on a growing graph — each change recompiled the banded solver
    # (~10-30 s through the tunnel), which crawled the full Cave run to
    # ~6 s/frame. Pow2 quantization costs ≤2x matvec work and makes the
    # compiled shape stable for long stretches.
    S = min(1 << max(6, (max(S, 1) - 1).bit_length()), N)
    lo = np.minimum(lo, N - S)

    co_rows = np.nonzero(ok & ~banded)[0]
    nc = len(co_rows)
    # pad COO edges to a pow2 ≥ 16 so occasional extra loop edges do not
    # change the compiled shape (the loop closer re-bands per solve)
    Ec = max(16, 1 << (max(nc, 1) - 1).bit_length())
    tdt = np.asarray(edges.t_ij).dtype
    co_i = np.zeros(Ec, np.int32)
    co_j = np.ones(Ec, np.int32)
    co_t = np.zeros((Ec, 3), tdt)
    co_yaw = np.zeros(Ec, tdt)
    co_w = np.zeros(Ec, tdt)
    co_lp = np.zeros(Ec, bool)
    co_ok = np.zeros(Ec, bool)
    co_i[:nc] = ei[co_rows]
    co_j[:nc] = ej[co_rows]
    co_t[:nc] = np.asarray(edges.t_ij)[co_rows]
    co_yaw[:nc] = np.asarray(edges.yaw_ij)[co_rows]
    co_w[:nc] = np.asarray(edges.weight)[co_rows]
    co_lp[:nc] = np.asarray(edges.is_loop)[co_rows]
    co_ok[:nc] = True
    co = PoseGraphEdges(
        i=jnp.asarray(co_i), j=jnp.asarray(co_j), t_ij=jnp.asarray(co_t),
        yaw_ij=jnp.asarray(co_yaw), weight=jnp.asarray(co_w),
        is_loop=jnp.asarray(co_lp), valid=jnp.asarray(co_ok),
    )
    prob = BandedPoseGraph(
        nodes=nodes, be_i=jnp.asarray(be_i), be_j=jnp.asarray(be_j),
        be_t=jnp.asarray(be_t), be_yaw=jnp.asarray(be_yaw),
        be_w=jnp.asarray(be_w), be_valid=jnp.asarray(be_ok),
        lo=jnp.asarray(lo, jnp.int32), co=co,
    )
    meta = BandMeta(B=block, S=S, N=N, n_blocks=NB, Ec=Ec,
                    coarse_group=coarse_group)
    return prob, meta


# ------------------------------------------------------------ channel eval
def _band_channels(prob: BandedPoseGraph):
    """Closed-form per-edge channels (all (Eb,) arrays):
    R (9, row-major), a = (dR/dyaw)^T d, m = R a, r0 (4, unweighted
    residual with the 0.3 yaw scale), wt (sqrt-information weight)."""
    nd = prob.nodes
    yi = nd.yaw[prob.be_i]
    pi_ = nd.pitch[prob.be_i]
    ri_ = nd.roll[prob.be_i]
    cy, sy = jnp.cos(yi), jnp.sin(yi)
    cp, sp = jnp.cos(pi_), jnp.sin(pi_)
    cr, sr = jnp.cos(ri_), jnp.sin(ri_)
    R = (
        cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
        sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
        -sp, cp * sr, cp * cr,
    )
    dR = (
        -sy * cp, -sy * sp * sr - cy * cr, -sy * sp * cr + cy * sr,
        cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
    )  # third row of dR/dyaw is zero
    d0 = nd.p[prob.be_j, 0] - nd.p[prob.be_i, 0]
    d1 = nd.p[prob.be_j, 1] - nd.p[prob.be_i, 1]
    d2 = nd.p[prob.be_j, 2] - nd.p[prob.be_i, 2]
    # a_col = sum_t dR[t, col] * d_t  (t runs over the two nonzero rows)
    a = (
        dR[0] * d0 + dR[3] * d1,
        dR[1] * d0 + dR[4] * d1,
        dR[2] * d0 + dR[5] * d1,
    )
    m = (
        R[0] * a[0] + R[1] * a[1] + R[2] * a[2],
        R[3] * a[0] + R[4] * a[1] + R[5] * a[2],
        R[6] * a[0] + R[7] * a[1] + R[8] * a[2],
    )
    rt = (
        R[0] * d0 + R[3] * d1 + R[6] * d2 - prob.be_t[:, 0],
        R[1] * d0 + R[4] * d1 + R[7] * d2 - prob.be_t[:, 1],
        R[2] * d0 + R[5] * d1 + R[8] * d2 - prob.be_t[:, 2],
    )
    ry = 0.3 * normalize_angle(
        nd.yaw[prob.be_j] - yi - prob.be_yaw)
    wt = jnp.where(prob.be_valid, prob.be_w, 0.0)
    return R, a, m, (rt[0], rt[1], rt[2], ry), wt


# ------------------------------------------------- banded per-block machinery
def _edge_onehots(bi, bj, lo_i, S, dtype):
    it = jax.lax.broadcasted_iota(jnp.int32, (bi.shape[0], S), 1)
    return ((bi - lo_i)[:, None] == it).astype(dtype), (
        (bj - lo_i)[:, None] == it).astype(dtype)


def _banded_scatter2(rows_i, rows_j, prob, meta: BandMeta, axis_name=None):
    """Sum per-edge rows into their i-node and j-node: (Eb,D)x2 -> (N,D)."""
    B, S, N, NB = meta.B, meta.S, meta.N, meta.n_blocks
    D = rows_i.shape[1]
    dtype = rows_i.dtype

    def step(acc, inp):
        ri, rj, bi, bj, lo_i = inp
        ohi, ohj = _edge_onehots(bi, bj, lo_i, S, dtype)
        z = jax.lax.dot_general(ohi, ri, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        z = z + jax.lax.dot_general(ohj, rj, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
        z0 = jnp.zeros((), lo_i.dtype)
        cur = jax.lax.dynamic_slice(acc, (lo_i, z0), (S, D))
        return jax.lax.dynamic_update_slice(acc, cur + z, (lo_i, z0)), None

    init = jnp.zeros((N, D), dtype)
    if axis_name is not None:
        init = jax.lax.pcast(init, (axis_name,), to="varying")
    acc, _ = jax.lax.scan(
        step, init,
        (rows_i.reshape(NB, B, D), rows_j.reshape(NB, B, D),
         prob.be_i.reshape(NB, B), prob.be_j.reshape(NB, B), prob.lo),
        unroll=2)
    return acc


_TRI4 = [(a, b) for a in range(4) for b in range(a, 4)]


def _sym4(tri):
    """10 tri channels (N,) -> (N,4,4)."""
    idx = {}
    for t, (a, b) in enumerate(_TRI4):
        idx[(a, b)] = t
        idx[(b, a)] = t
    return jnp.stack([
        jnp.stack([tri[idx[(a, b)]] for b in range(4)], axis=-1)
        for a in range(4)], axis=-2)


def _gn_step_banded(prob: BandedPoseGraph, meta: BandMeta, fix_before,
                    cg_iters: int):
    nd = prob.nodes
    N = meta.N
    dtype = nd.p.dtype
    G = meta.coarse_group
    Nc = N // G
    free = nd.valid & (jnp.arange(N) >= fix_before)
    freef = free.astype(dtype)

    R, a, m, r0, wt = _band_channels(prob)
    w2 = wt * wt
    zero = jnp.zeros_like(w2)
    s_ch = w2 * (a[0] * a[0] + a[1] * a[1] + a[2] * a[2] + 0.09)

    # per-edge H blocks (tri-packed 10) and b contributions (4), both ends.
    # column masking by free is node-level: fold into reduce inputs for H
    # diagonals (fi for Hii, fj for Hjj) — exact because Hii only involves
    # node i's own columns.
    fi = freef[prob.be_i]
    fj = freef[prob.be_j]
    Rr = (  # R @ r_t  (3)
        R[0] * r0[0] + R[1] * r0[1] + R[2] * r0[2],
        R[3] * r0[0] + R[4] * r0[1] + R[5] * r0[2],
        R[6] * r0[0] + R[7] * r0[1] + R[8] * r0[2],
    )
    ar = a[0] * r0[0] + a[1] * r0[1] + a[2] * r0[2]
    hii = [w2, zero, zero, -w2 * m[0], w2, zero, -w2 * m[1], w2,
           -w2 * m[2], s_ch]
    hjj = [w2, zero, zero, zero, w2, zero, zero, w2, zero, 0.09 * w2]
    bi = [-w2 * Rr[0], -w2 * Rr[1], -w2 * Rr[2], w2 * (ar - 0.3 * r0[3])]
    bj = [w2 * Rr[0], w2 * Rr[1], w2 * Rr[2], 0.3 * w2 * r0[3]]
    rows_i = jnp.stack([c * fi for c in hii] + [c * fi for c in bi], axis=1)
    rows_j = jnp.stack([c * fj for c in hjj] + [c * fj for c in bj], axis=1)
    red = _banded_scatter2(rows_i, rows_j, prob, meta)  # (N, 14)

    # COO part (loops): generic AD eval, small E
    rc, Jci, Jcj = _pg4_eval(nd, prob.co, free)
    Hd_co = jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Jci, Jci), prob.co.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Jcj, Jcj), prob.co.j, num_segments=N)
    b_co = jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Jci, rc), prob.co.i, num_segments=N
    ) + jax.ops.segment_sum(
        jnp.einsum("era,er->ea", Jcj, rc), prob.co.j, num_segments=N)

    Hd = _sym4([red[:, t] for t in range(10)]) + Hd_co
    b = red[:, 10:14] + b_co
    cost = 0.5 * (jnp.sum(w2 * (r0[0] ** 2 + r0[1] ** 2 + r0[2] ** 2
                                + r0[3] ** 2)) + jnp.sum(rc * rc))

    dH = jnp.einsum("nii->ni", Hd)
    damp = 1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free, 0.0, 1.0)[:, None]
    Hd = Hd + jax.vmap(jnp.diag)(damp)
    Minv = _inv_blocks(Hd)
    b = b * freef[:, None]

    # coarse Galerkin operator over CONTIGUOUS node groups: restriction =
    # reshape-sum. Hij blocks from channels (masked both ends).
    ci = prob.be_i // G
    cj = prob.be_j // G
    fij = fi * fj
    hij = [  # full 4x4 row-major (asymmetric block)
        -w2, zero, zero, zero,
        zero, -w2, zero, zero,
        zero, zero, -w2, zero,
        w2 * m[0], w2 * m[1], w2 * m[2], -0.09 * w2,
    ]
    hij_rows = jnp.stack([c * fij for c in hij], axis=1)  # (Eb,16)
    Hc = jax.ops.segment_sum(
        hij_rows, ci * Nc + cj, num_segments=Nc * Nc).reshape(Nc, Nc, 4, 4)
    Hc = Hc + jnp.swapaxes(Hc, -1, -2).transpose(1, 0, 2, 3)
    # diagonal coarse blocks: group-sum of Hd (damped, masked) — reshape-sum
    Hd_c = Hd.reshape(Nc, G, 4, 4).sum(axis=1)
    Hc = Hc.at[jnp.arange(Nc), jnp.arange(Nc)].add(Hd_c)
    # COO cross terms into the coarse operator
    cci = prob.co.i // G
    ccj = prob.co.j // G
    Hc_co = jax.ops.segment_sum(
        jnp.einsum("era,erb->eab", Jci, Jcj).reshape(-1, 16),
        cci * Nc + ccj, num_segments=Nc * Nc).reshape(Nc, Nc, 4, 4)
    Hc = Hc + Hc_co + jnp.swapaxes(Hc_co, -1, -2).transpose(1, 0, 2, 3)
    Dc = Nc * 4
    Hc_flat = Hc.transpose(0, 2, 1, 3).reshape(Dc, Dc)
    Hc_inv = jnp.linalg.inv(
        Hc_flat + 1e-9 * jnp.eye(Dc, dtype=dtype))

    def matvec(v):
        vf = v * freef[:, None]
        B, S, NB = meta.B, meta.S, meta.n_blocks

        def step(acc, inp):
            bi_, bj_, lo_i, Rb, ab, w2b = inp
            ohi, ohj = _edge_onehots(bi_, bj_, lo_i, S, dtype)
            z0 = jnp.zeros((), lo_i.dtype)
            vs = jax.lax.dynamic_slice(vf, (lo_i, z0), (S, 4))
            vi = ohi @ vs  # (B,4)
            vj = ohj @ vs
            dp0 = vj[:, 0] - vi[:, 0]
            dp1 = vj[:, 1] - vi[:, 1]
            dp2 = vj[:, 2] - vi[:, 2]
            # raw t = J0i v_i + J0j v_j, then ONE w2 scaling
            t0 = w2b * (Rb[:, 0] * dp0 + Rb[:, 3] * dp1 + Rb[:, 6] * dp2
                        + ab[:, 0] * vi[:, 3])
            t1 = w2b * (Rb[:, 1] * dp0 + Rb[:, 4] * dp1 + Rb[:, 7] * dp2
                        + ab[:, 1] * vi[:, 3])
            t2 = w2b * (Rb[:, 2] * dp0 + Rb[:, 5] * dp1 + Rb[:, 8] * dp2
                        + ab[:, 2] * vi[:, 3])
            t3 = w2b * 0.3 * (vj[:, 3] - vi[:, 3])
            # y_i = J0i^T t = [-R t_t ; a.t_t - 0.3 t3], y_j = [R t_t; 0.3 t3]
            Rt0 = Rb[:, 0] * t0 + Rb[:, 1] * t1 + Rb[:, 2] * t2
            Rt1 = Rb[:, 3] * t0 + Rb[:, 4] * t1 + Rb[:, 5] * t2
            Rt2 = Rb[:, 6] * t0 + Rb[:, 7] * t1 + Rb[:, 8] * t2
            at = ab[:, 0] * t0 + ab[:, 1] * t1 + ab[:, 2] * t2
            yi = jnp.stack([-Rt0, -Rt1, -Rt2, at - 0.3 * t3], axis=1)
            yj = jnp.stack([Rt0, Rt1, Rt2, 0.3 * t3], axis=1)
            z = jax.lax.dot_general(
                ohi, yi, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            z = z + jax.lax.dot_general(
                ohj, yj, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            cur = jax.lax.dynamic_slice(acc, (lo_i, z0), (S, 4))
            return jax.lax.dynamic_update_slice(
                acc, cur + z, (lo_i, z0)), None

        Rb_all = jnp.stack(R, axis=1)   # (Eb, 9) raw rotation channels
        ab_all = jnp.stack(a, axis=1)   # (Eb, 3)
        y, _ = jax.lax.scan(
            step, jnp.zeros((N, 4), dtype),
            (prob.be_i.reshape(NB, B), prob.be_j.reshape(NB, B), prob.lo,
             Rb_all.reshape(NB, B, 9), ab_all.reshape(NB, B, 3),
             w2.reshape(NB, B)),
            unroll=2)
        # COO contribution
        tc = jnp.einsum("era,ea->er", Jci, vf[prob.co.i]) + jnp.einsum(
            "era,ea->er", Jcj, vf[prob.co.j])
        y = y + jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Jci, tc), prob.co.i, num_segments=N)
        y = y + jax.ops.segment_sum(
            jnp.einsum("era,er->ea", Jcj, tc), prob.co.j, num_segments=N)
        return y * freef[:, None] + damp * v

    def precond(v):
        fine = jnp.einsum("nab,nb->na", Minv, v)
        vr = (v * freef[:, None]).reshape(Nc, G, 4).sum(axis=1)
        uc = (Hc_inv @ vr.reshape(Dc)).reshape(Nc, 4)
        return fine + jnp.repeat(uc, G, axis=0) * freef[:, None]

    dx = _pcg(matvec, -b, precond, cg_iters)
    return dx, cost


def optimize_4dof_banded(
    prob: BandedPoseGraph, meta: BandMeta, fix_before,
    iters: int = 10, cg_iters: int = 64,
) -> Tuple[PoseGraphNodes, jnp.ndarray]:
    """Banded-layout 4-DoF pose-graph GN+PCG. Jit with ``meta`` closed
    over. Returns (nodes, final cost); padded nodes stay untouched."""
    def gn(_, p):
        dx, _ = _gn_step_banded(p, meta, fix_before, cg_iters)
        nd = p.nodes
        return p._replace(nodes=PoseGraphNodes(
            p=nd.p + dx[:, :3], yaw=nd.yaw + dx[:, 3],
            pitch=nd.pitch, roll=nd.roll, valid=nd.valid))

    prob = jax.lax.fori_loop(0, iters, gn, prob)
    _, cost = _gn_step_banded(prob, meta, fix_before, cg_iters)
    return prob.nodes, cost
