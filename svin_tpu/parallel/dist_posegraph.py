"""Distributed pose-graph optimization: edges sharded over the mesh.

The "sequence-dimension sharding" of SURVEY.md §5 applied to the pose
graph: the edge set is block-partitioned across devices; every device
evaluates its edge residuals/Jacobians and builds a partial (4N)² system;
one ``psum`` merges them; the dense solve is replicated. Nodes are
replicated (a pose graph's state is tiny next to its edge set — the BA
decomposition's logic, applied one level up).

CAPACITY NOTE: the replicated DENSE (4N)² solve bounds this variant to
N ≲ 2000 nodes. For Cave/Bus-joint scale (10⁴+ keyframes) use
``pcg.make_sharded_posegraph_pcg`` — same sharding, matrix-free two-level-
preconditioned CG, nothing quadratic in N.
"""
from __future__ import annotations

from typing import Tuple

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


def _edge_eval(nd: PoseGraphNodes, edges: PoseGraphEdges, dtype):
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
        return wt * r, wt * J

    return jax.vmap(one)(
        edges.i, edges.j, edges.t_ij, edges.yaw_ij, edges.weight,
        edges.is_loop, edges.valid,
    )


def _partial_normal_eqs(nd: PoseGraphNodes, edges: PoseGraphEdges):
    N = nd.p.shape[0]
    dtype = nd.p.dtype
    r, J = _edge_eval(nd, edges, dtype)
    Ji, Jj = J[:, :, :4], J[:, :, 4:]
    Hb = jnp.zeros((N, N, 4, 4), dtype)
    Hb = Hb.at[edges.i, edges.i].add(jnp.einsum("era,erb->eab", Ji, Ji))
    Hb = Hb.at[edges.j, edges.j].add(jnp.einsum("era,erb->eab", Jj, Jj))
    Hij = jnp.einsum("era,erb->eab", Ji, Jj)
    Hb = Hb.at[edges.i, edges.j].add(Hij)
    Hb = Hb.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((N, 4), dtype)
    b = b.at[edges.i].add(jnp.einsum("era,er->ea", Ji, r))
    b = b.at[edges.j].add(jnp.einsum("era,er->ea", Jj, r))
    return Hb, b, 0.5 * jnp.sum(r * r)


def make_sharded_posegraph(
    mesh: Mesh, N: int, E: int, iters: int = 10, axis: str = "data"
):
    """pjit-able distributed 4-DoF pose-graph solver. Edges are sharded along
    their leading axis (pad per-shard counts equal); nodes and fix_before
    replicated. Returns (step_fn, (node_sharding, edge_sharding, scalar))."""
    n_dev = mesh.shape[axis]
    assert E % n_dev == 0

    def shard_body(nodes: PoseGraphNodes, edges: PoseGraphEdges, fix_before):
        dtype = nodes.p.dtype

        def gn(_, nd):
            Hb, b, _ = _partial_normal_eqs(nd, edges)
            Hb = jax.lax.psum(Hb, axis)
            b = jax.lax.psum(b, axis)
            free = nd.valid & (jnp.arange(N) >= fix_before)
            free4 = jnp.repeat(free, 4)
            H = Hb.transpose(0, 2, 1, 3).reshape(4 * N, 4 * N)
            bf = b.reshape(4 * N) * free4
            dH = jnp.diag(H)
            H = H * free4[:, None] * free4[None, :]
            H = H + jnp.diag(
                1e-6 * jnp.maximum(dH, 1.0) + jnp.where(free4, 0.0, 1.0)
            )
            dx = -jnp.linalg.solve(H, bf).reshape(N, 4)
            return PoseGraphNodes(
                p=nd.p + dx[:, :3], yaw=nd.yaw + dx[:, 3],
                pitch=nd.pitch, roll=nd.roll, valid=nd.valid,
            )

        out = jax.lax.fori_loop(0, iters, gn, nodes)
        _, _, cost = _partial_normal_eqs(out, edges)
        return out, jax.lax.psum(cost, axis)

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


def pad_edges_for_mesh(edges: PoseGraphEdges, n_dev: int) -> PoseGraphEdges:
    """Pad the edge table so its length divides the device count."""
    E = edges.i.shape[0]
    pad = (-E) % n_dev
    if pad == 0:
        return edges

    def padf(x, fill=0):
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    return PoseGraphEdges(
        i=padf(edges.i), j=padf(edges.j), t_ij=padf(edges.t_ij),
        yaw_ij=padf(edges.yaw_ij), weight=padf(edges.weight, 1),
        is_loop=padf(edges.is_loop, False), valid=padf(edges.valid, False),
    )
