"""Distributed pose-graph tests: sharded-vs-local equivalence on the
8-device CPU mesh and drift removal (multi-session scale path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from svin_tpu.loopclosure import optimize_4dof
from svin_tpu.parallel import make_sharded_posegraph, pad_edges_for_mesh

from test_loopclosure import _make_drifted_graph


def test_sharded_posegraph_matches_local():
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    nodes, edges, t_gt, yaw_gt, N = _make_drifted_graph()
    edges_p = pad_edges_for_mesh(edges, n)
    cap = nodes.p.shape[0]
    step, (node_sh, edge_sh) = make_sharded_posegraph(
        mesh, cap, edges_p.i.shape[0], iters=10
    )
    nodes_dev = jax.device_put(nodes, node_sh)
    edges_dev = jax.device_put(edges_p, edge_sh)
    out_s, cost_s = step(nodes_dev, edges_dev, jnp.int32(1))
    out_l = optimize_4dof(nodes, edges, jnp.int32(1), iters=10)
    np.testing.assert_allclose(
        np.asarray(out_s.p), np.asarray(out_l.p), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_s.yaw), np.asarray(out_l.yaw), atol=1e-8
    )
    # and it actually removed the drift
    err_after = np.linalg.norm(np.asarray(out_s.p[N - 1]) - t_gt[N - 1])
    assert err_after < 0.15
