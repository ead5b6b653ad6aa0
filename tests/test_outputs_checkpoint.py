"""Checkpoint/resume, CSV writers, EuRoC reader, debug visualization, and a
depth-factor end-to-end run."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu import sim
from svin_tpu.cameras import NCameraSystem, make_camera
from svin_tpu.kinematics import from_rq
from svin_tpu.pipeline import (
    VioConfig,
    VioEngine,
    read_euroc_folder,
    run_events,
    synthetic_sequence,
)
from svin_tpu.pipeline.checkpoint import (
    load_engine,
    load_loop_closer,
    save_engine,
    save_loop_closer,
)
from svin_tpu.pipeline.outputs import (
    CsvLandmarkWriter,
    CsvStateWriter,
    DebugOutputDirs,
    draw_keypoints,
    draw_matches,
)


from vio_fixtures import small_config, small_rig, standard_run


def _setup():
    return small_rig(), small_config()


def _short_run(rig, cfg, duration=1.4, depth=False):
    return standard_run(duration=duration, cam_rate=5.0, depth=depth,
                        cfg=cfg, rig=rig)


def test_checkpoint_roundtrip_engine(tmp_path):
    rig, cfg = _setup()
    engine, renderer, results = _short_run(rig, cfg)
    p = str(tmp_path / "ckpt.npz")
    save_engine(engine, p)
    engine2 = VioEngine(cfg, rig=rig)
    load_engine(engine2, p)
    np.testing.assert_array_equal(
        np.asarray(engine2.window.r), np.asarray(engine.window.r)
    )
    np.testing.assert_array_equal(
        np.asarray(engine2.factors.marg.H), np.asarray(engine.factors.marg.H)
    )
    assert engine2.n_states == engine.n_states
    assert engine2.next_lm_id == engine.next_lm_id
    # resumed engine keeps estimating: feed one more frame
    t_next = results[-1].timestamp + 0.2
    series = sim.simulate_imu(
        renderer.traj, results[-1].timestamp, t_next + 0.05, 100.0, cfg.imu
    )
    for i in range(len(series.t)):
        engine2.add_imu_measurement(
            float(series.t[i]), np.asarray(series.gyro[i]), np.asarray(series.acc[i])
        )
    r = engine2.add_frame(t_next, renderer.render_frame(t_next))
    assert r is not None and np.isfinite(r.cost)


def test_checkpoint_roundtrip_loop_closer(tmp_path):
    from svin_tpu.loopclosure import LoopCloser

    rig, cfg = _setup()
    cam = rig.cameras[0]
    closer = LoopCloser(cam, cfg)
    # seed minimal state via direct field edits (unit-level roundtrip)
    closer.yaw_drift = 0.12
    closer.t_drift = np.array([0.1, -0.2, 0.3])
    closer.n_edges = 0
    p = str(tmp_path / "lc.npz")
    save_loop_closer(closer, p)
    closer2 = LoopCloser(cam, cfg)
    load_loop_closer(closer2, p)
    assert closer2.yaw_drift == pytest.approx(0.12)
    np.testing.assert_allclose(closer2.t_drift, closer.t_drift)


def test_checkpoint_restore_beyond_default_capacity(tmp_path):
    """A checkpoint whose pose graph grew past the fresh default capacity
    must restore with capacity tracking the ARRAYS — otherwise the next
    growth 'doubles' to a smaller size and crashes (found by the
    1311-keyframe Cave-length resume, round 4)."""
    from svin_tpu.loopclosure import LoopCloser

    rig, cfg = _setup()
    cam = rig.cameras[0]
    closer = LoopCloser(cam, cfg)
    cap0 = closer.capacity
    while closer.capacity < cap0 * 4:
        closer._grow_capacity()
    assert closer.nodes.p.shape[0] == cap0 * 4
    p = str(tmp_path / "lc_big.npz")
    save_loop_closer(closer, p)
    closer2 = LoopCloser(cam, cfg)
    load_loop_closer(closer2, p)
    assert closer2.capacity == cap0 * 4
    assert closer2.nodes.p.shape[0] == cap0 * 4
    closer2._grow_capacity()  # pre-fix: ValueError broadcast (4c,3)->(2c,3)
    assert closer2.capacity == cap0 * 8
    assert closer2.nodes.p.shape[0] == cap0 * 8


def test_depth_factor_end_to_end():
    rig, cfg = _setup()
    cfg.is_depth_used = True
    engine, renderer, results = _short_run(rig, cfg, depth=True)
    assert engine.first_depth is not None
    # at least one state carries an active depth factor
    assert int(np.asarray(engine.factors.depth.valid).sum()) >= 1
    assert all(np.isfinite(r.cost) for r in results[1:])


def test_csv_writers(tmp_path):
    rig, cfg = _setup()
    engine, renderer, results = _short_run(rig, cfg)
    sp = str(tmp_path / "state.csv")
    lp = str(tmp_path / "landmarks.csv")
    w = CsvStateWriter(sp)
    for r in results:
        w.write(r)
    w.close()
    rows = np.loadtxt(sp, delimiter=",", comments="#")
    assert rows.shape == (len(results), 17)
    lw = CsvLandmarkWriter(lp)
    lv = np.asarray(engine.window.lm_valid)
    lw.write_map(
        np.asarray(engine.window.lm_id)[lv],
        np.asarray(engine.window.hp_W[:, :3])[lv],
        np.asarray(engine.window.lm_quality)[lv],
    )
    lw.close()
    lrows = np.loadtxt(lp, delimiter=",", comments="#")
    assert lrows.shape[0] == int(lv.sum())


def test_euroc_reader_roundtrip(tmp_path):
    # synthesize a minimal EuRoC tree with .npy images
    root = tmp_path / "seq" / "mav0"
    (root / "imu0").mkdir(parents=True)
    for ci in range(2):
        (root / f"cam{ci}" / "data").mkdir(parents=True)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for k in range(20):
            t = int(1e9 * (1.0 + 0.01 * k))
            f.write(f"{t},0.01,0.02,0.03,0.1,0.2,9.8\n")
    img = (np.random.RandomState(0).rand(10, 12) * 255).astype(np.uint8)
    frame_ts = [int(1e9 * (1.0 + 0.05 * k)) for k in range(3)]
    for t in frame_ts:
        for ci in range(2):
            np.save(root / f"cam{ci}" / "data" / f"{t}.npy", img)
    # npy files keep their extension; reader keys on the stem
    for ci in range(2):
        d = root / f"cam{ci}" / "data"
        for t in frame_ts:
            os.rename(d / f"{t}.npy", d / f"{t}.npy")
    events = list(read_euroc_folder(str(tmp_path / "seq")))
    kinds = [e.kind for e in events]
    assert kinds.count("frame") == 3
    assert kinds.count("imu") > 0
    # interleave: every imu event precedes the next frame event's timestamp
    pending_imu = []
    for e in events:
        if e.kind == "frame":
            assert len(e.images) == 2 and e.images[0].shape == (10, 12)
            for t_imu in pending_imu:
                assert t_imu <= e.t + 1e-9
            pending_imu = []
        else:
            pending_imu.append(e.t)


def test_draw_keypoints_and_matches():
    img = np.zeros((40, 60), np.float32)
    uv = np.array([[10.0, 10.0], [30.0, 20.0]])
    out = draw_keypoints(img, uv, matched=np.array([True, False]))
    assert out[10, 10] == 1.0 and out[20, 30] == 0.6
    canvas = draw_matches(
        img, uv, img, uv + 2.0, pairs=np.array([[0, 0], [1, 1]])
    )
    assert canvas.shape == (40, 120)
    assert canvas.max() == 1.0


def test_debug_output_dirs(tmp_path):
    d = DebugOutputDirs(str(tmp_path / "dbg"))
    d.log_loop(5, 1, 30, np.array([0.1, 0.2, 0.3]), 0.05)
    d.log_switch(1.5, "VIO->PRIMITIVE")
    d.save_image("loop_candidates", "kf5", np.zeros((4, 4)))
    d.save_image(
        "pnp_verified", "kf6", np.zeros((40, 120)), caption="current frame: 6"
    )
    d.close()
    assert (tmp_path / "dbg" / "loop_closure.txt").read_text().startswith("5 1 30")
    assert (tmp_path / "dbg" / "switch_info.txt").exists()
    # viewable PNGs, not .npy blobs (reference writes cv::imwrite pngs)
    assert (tmp_path / "dbg" / "loop_candidates" / "kf5.png").exists()
    import cv2

    img = cv2.imread(str(tmp_path / "dbg" / "pnp_verified" / "kf6.png"))
    assert img is not None and img.shape[0] == 90  # 50 px banner + 40 px


def test_topdown_viewer_renders_and_saves(tmp_path):
    from svin_tpu.kinematics import Transformation
    from svin_tpu.pipeline.outputs import TopDownViewer
    import jax.numpy as jnp

    v = TopDownViewer(image_size=120, frame_scale=0.2)
    assert v.render().shape == (120, 120, 3)  # empty canvas OK
    for i in range(20):
        t = i * 0.3
        T = Transformation(
            r=jnp.array([np.cos(t), np.sin(t), 0.05 * i]),
            q=jnp.array([0.0, 0.0, 0.0, 1.0]),
        )
        v.add_pose(T, velocity=np.zeros(3))
    img = v.render()
    assert img.shape == (120, 120, 3) and img.dtype == np.uint8
    # path pixels were drawn (not all background)
    assert (img != 10).any()
    out = tmp_path / "top.png"
    v.save(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_checkpoint_keyframes_verify_loops_after_resume():
    """Round-3 capability: the checkpoint carries full loop-closure
    features (descriptors/corners/3D points), so a RESUMED session
    verifies loops against pre-checkpoint keyframes and the
    cross-sequence alignment re-anchors the new session onto the restored
    map (checkpoint/resume is new over the reference — SURVEY §5)."""
    import jax
    from test_loopcloser_scale import CAM, _closer, _desc, _export
    from svin_tpu.cameras import project
    from svin_tpu.pipeline.checkpoint import load_loop_closer, save_loop_closer
    import jax.numpy as jnp

    closer = _closer(min_correspondences=20, pnp_ransac_iterations=64)
    SRC = 8
    rngs = np.random.RandomState(123)
    pos_src = np.array([4.0, 0.0, 0.0])
    pts = pos_src + np.array([-1.0, -0.8, 4.0]) + rngs.rand(60, 3) * [2.0, 1.6, 1.5]
    uv_src, ok = jax.device_get(project(CAM, jnp.asarray(pts - pos_src)))
    assert bool(np.asarray(ok).all())
    site_desc = _desc(rngs, 60)
    for i in range(60):
        if i == SRC:
            e = _export(i, i, pos_src, [0, 0, 0, 1],
                        extra_desc=site_desc,
                        extra_uv=np.asarray(uv_src, np.float32),
                        rng=np.random.RandomState(50_000 + i))
        else:
            e = _export(i, i, [0.5 * i, 0, 0], [0, 0, 0, 1],
                        rng=np.random.RandomState(50_000 + i))
        closer.add_keyframe(e)

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "closer.npz")
    save_loop_closer(closer, path)

    resumed = _closer(min_correspondences=20, pnp_ransac_iterations=64)
    load_loop_closer(resumed, path)
    assert len(resumed.keyframes) == 60
    # restored keyframes kept their features
    assert np.array_equal(
        np.asarray(resumed.keyframes[SRC].extra_desc), site_desc
    )

    # session 1 revisits the site in a drifted frame
    drift = np.array([1.5, -1.0, 0.4])
    uv_cur, _ = jax.device_get(project(CAM, jnp.asarray(pts - pos_src)))
    e = _export(
        60, 60.0, pos_src + drift, [0, 0, 0, 1],
        points_W=pts + drift, uv=np.asarray(uv_cur, float),
        window_desc=site_desc, sequence=1,
        rng=np.random.RandomState(60_060),
    )
    loop = resumed.add_keyframe(e)
    assert loop is not None, "no loop verified against a RESTORED keyframe"
    assert loop.match_index == SRC and loop.query_index == 60
    # PnP-inlier correspondences surface for the debug match images
    assert loop.uv_query is not None and len(loop.uv_query) >= 20
    assert loop.uv_match is not None and len(loop.uv_match) == len(loop.uv_query)
    assert resumed._seq_aligned[1] is True
    # the new session re-anchored onto the restored map: the revisit's
    # aligned pose lands at the site (the injected inter-session drift is
    # gone)
    np.testing.assert_allclose(
        np.asarray(resumed.keyframes[60].T_WC_vio.r), pos_src, atol=0.2
    )
