"""Track-structured global BA (``parallel/tracks.py``): analytic distortion
Jacobian channels vs AD, banded reduce vs segment-sum, equivalence with the
generic PCG solver, overflow (loop re-observation) handling, and sharded
vs local equivalence on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.cameras import distortion as dist
from svin_tpu.parallel import dist_ba
from svin_tpu.parallel.pcg import ba_solve_pcg, pose_major_index
from svin_tpu.parallel.tracks import (
    TrackMeta,
    _banded_reduce,
    _shift_add,
    _distort_channels,
    ba_solve_tracks,
    make_sharded_ba_tracks,
    tracks_from_problem,
)
from svin_tpu.problems import build_global_ba_problem, build_global_ba_tracks


@pytest.mark.parametrize("model,params", [
    ("none", []),
    ("radialtangential", [-0.28, 0.07, 2e-4, 1.8e-5]),
    ("radialtangential8",
     [-0.28, 0.07, 2e-4, 1.8e-5, 0.01, -0.005, 0.002, -0.001]),
    ("equidistant", [-0.01, 0.02, -0.005, 0.001]),
])
def test_distort_channels_match_ad(model, params):
    """Hand-derived distortion Jacobians == AD Jacobians of the shared
    model definitions (``cameras/distortion.py``)."""
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 2)), jnp.float32)
    pa = jnp.asarray(params, jnp.float32)
    d = [pa[i] for i in range(len(params))]
    xd, yd, j00, j01, j10, j11 = _distort_channels(
        model, pts[:, 0], pts[:, 1], d)
    ref = dist.distort(model, pts, pa)
    J = dist.distort_jacobian(model, pts, pa)
    np.testing.assert_allclose(xd, ref[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(yd, ref[:, 1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(j00, J[:, 0, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j01, J[:, 0, 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j10, J[:, 1, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j11, J[:, 1, 1], rtol=1e-4, atol=1e-5)


def test_banded_reduce_matches_segment_sum():
    rng = np.random.default_rng(0)
    K, L, B, D = 64, 256, 32, 12
    base = np.sort(rng.integers(0, K - 8, size=L)).astype(np.int32)
    NB = L // B
    lo = np.minimum(base[np.arange(NB) * B], K - 24)
    meta = TrackMeta(span=8, C=1, B=B, S=24, K=K, n_blocks=NB, M=8)
    rows = jnp.asarray(rng.standard_normal((L, D)), jnp.float32)
    out = _banded_reduce(rows, jnp.asarray(base), jnp.asarray(lo, jnp.int32),
                         meta)
    ref = jax.ops.segment_sum(rows, jnp.asarray(base), num_segments=K)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_shift_add_folds_slot_offsets():
    """slot j of base k contributes to pose k + j // C."""
    K, C, span = 16, 2, 3
    meta = TrackMeta(span=span, C=C, B=1, S=8, K=K, n_blocks=1, M=1)
    ch = 2
    Z = np.zeros((K, span * C * ch), np.float32)
    Z[4, (2 * C + 1) * ch + 0] = 1.0  # base 4, slot r=2,cam=1 -> pose 6
    out = _shift_add(jnp.asarray(Z), meta, ch)
    assert float(out[6, 0]) == 1.0
    assert float(jnp.sum(jnp.abs(out))) == 1.0


def _solve_both(prob, rig, iters=3, cg=40, span=8, block=64):
    bprob = dist_ba.bucket_problem(prob, R=2 * span)
    perm = pose_major_index(bprob.obs_pose, bprob.obs_valid,
                            prob.pose_r.shape[0])
    p1, c1 = jax.jit(lambda p: ba_solve_pcg(
        p, rig, iters=iters, cg_iters=cg, pose_perm=perm))(bprob)
    tp, meta, order = tracks_from_problem(prob, span=span, block=block)
    p2, c2 = jax.jit(lambda p: ba_solve_tracks(
        p, rig, meta, iters=iters, cg_iters=cg))(tp)
    return (p1, c1), (p2, c2), order


def test_tracks_equivalent_to_pcg_random_problem():
    """On a generic (random-assignment) problem most observations land in
    overflow — the solver must still match the reference PCG path."""
    prob, rig = build_global_ba_problem(
        jax.random.PRNGKey(1), K=48, L=256, O=2048)
    (p1, c1), (p2, c2), order = _solve_both(prob, rig)
    np.testing.assert_allclose(float(c1), float(c2), rtol=5e-3, atol=1e-9)
    np.testing.assert_allclose(p1.pose_r, p2.pose_r, atol=5e-5)
    np.testing.assert_allclose(p1.pose_q, p2.pose_q, atol=5e-5)


def test_tracks_equivalent_on_track_problem_with_revisits():
    """Realistic contiguous tracks + loop-closure revisits (overflow)."""
    prob, rig = build_global_ba_tracks(
        jax.random.PRNGKey(2), K=64, L=512, span=6, revisit_frac=0.05)
    assert int(np.asarray(prob.obs_valid).sum()) > 1000
    (p1, c1), (p2, c2), order = _solve_both(prob, rig, span=6)
    # both converge to the noise floor (~1e-6 f32); compare at floor-level
    # atol — the two solvers reduce in different orders so their floors
    # differ by O(1e-7)
    np.testing.assert_allclose(float(c1), float(c2), rtol=5e-3, atol=5e-7)
    np.testing.assert_allclose(p1.pose_r, p2.pose_r, atol=5e-5)
    # landmark positions match through the sort permutation
    L0 = prob.lm.shape[0]
    sel = np.asarray(order) < L0
    lm_back = np.zeros((L0, 3), np.float32)
    lm_back[np.asarray(order)[sel]] = np.asarray(p2.lm)[sel]
    bprob = dist_ba.bucket_problem(prob, R=12)
    mask = np.asarray(bprob.lm_valid)
    np.testing.assert_allclose(
        lm_back[mask], np.asarray(p1.lm)[mask], atol=2e-4)


def test_tracks_improves_perturbed_problem():
    """Noise-perturbed poses/landmarks converge back (cost drops >100x)."""
    prob, rig = build_global_ba_tracks(
        jax.random.PRNGKey(4), K=64, L=512, span=6)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    dt = prob.pose_r.dtype
    noisy = prob._replace(
        pose_r=prob.pose_r + 0.02 * jax.random.normal(
            k1, prob.pose_r.shape, dt
        ) * (~np.asarray(prob.pose_fixed))[:, None],
        lm=prob.lm + 0.05 * jax.random.normal(k2, prob.lm.shape, dt),
    )
    tp, meta, _ = tracks_from_problem(noisy, span=6, block=64)
    _, c0 = jax.jit(lambda p: ba_solve_tracks(
        p, rig, meta, iters=0, cg_iters=8))(tp)
    out, c1 = jax.jit(lambda p: ba_solve_tracks(
        p, rig, meta, iters=6, cg_iters=48))(tp)
    assert float(c1) < float(c0) / 100.0


def test_sharded_tracks_match_local():
    """8-way landmark-sharded solve == single-device solve."""
    n = 8
    devices = np.array(jax.devices()[:n])
    from jax.sharding import Mesh

    mesh = Mesh(devices, ("data",))
    prob, rig = build_global_ba_tracks(
        jax.random.PRNGKey(5), K=64, L=512, span=6, revisit_frac=0.05)
    # single-shard layout for the local reference (global overflow indices)
    tp1, meta1, order1 = tracks_from_problem(prob, span=6, block=32)
    local, c_local = jax.jit(lambda p: ba_solve_tracks(
        p, rig, meta1, iters=3, cg_iters=32))(tp1)
    tp, meta, order = tracks_from_problem(prob, span=6, block=32, n_shards=n)
    np.testing.assert_array_equal(order, order1)  # same landmark layout

    step, shardings = make_sharded_ba_tracks(
        mesh, rig, meta, iters=3, cg_iters=32)
    tp_dev = jax.device_put(tp, shardings)
    out, c_shard = step(tp_dev)
    np.testing.assert_allclose(float(c_local), float(c_shard),
                               rtol=1e-2, atol=1e-8)
    np.testing.assert_allclose(local.pose_r, out.pose_r, atol=2e-5)
    np.testing.assert_allclose(np.asarray(local.lm), np.asarray(out.lm),
                               atol=2e-4)
