"""rosbag2 ingestion: CDR codec round-trips, stereo pairing, EuRoC export.

Mirrors the reference's bag entry points (okvis_node_synchronous.cpp,
dataset_convertor.cpp, stereo_sync.cpp) — bags are synthesized with the
module's own writer and read back through the public readers.
"""
import numpy as np
import pytest

from svin_tpu.pipeline.rosbag import (
    CdrReader,
    CdrWriter,
    RosbagWriter,
    convert_bag_to_euroc,
    decode_compressed_image,
    decode_fluid_pressure,
    decode_image,
    decode_imu,
    read_bag_messages,
    read_rosbag,
)


def test_cdr_alignment_round_trip():
    w = CdrWriter()
    w.u8(7)
    w.f64(3.25)  # forces 8-byte alignment after a 1-byte read
    w.string("hello")
    w.u32(42)
    w.i32(-5)
    r = CdrReader(w.data())
    assert r.u8() == 7
    assert r.f64() == 3.25
    assert r.string() == "hello"
    assert r.u32() == 42
    assert r.i32() == -5


def test_imu_message_round_trip(tmp_path):
    bag = RosbagWriter(str(tmp_path / "bag"))
    bag.add_topic("/imu", "sensor_msgs/msg/Imu")
    gyro = np.array([0.1, -0.2, 0.3])
    acc = np.array([9.0, 0.5, -1.5])
    bag.write_imu("/imu", 1_500_000_000, gyro, acc)
    bag.close()
    msgs = list(read_bag_messages(str(tmp_path / "bag")))
    assert len(msgs) == 1
    m = decode_imu(msgs[0].raw)
    assert m.t_ns == 1_500_000_000
    np.testing.assert_allclose(m.gyro, gyro)
    np.testing.assert_allclose(m.acc, acc)


def test_image_messages_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    bag = RosbagWriter(str(tmp_path / "bag"))
    bag.add_topic("/cam0/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/cam0/compressed", "sensor_msgs/msg/CompressedImage")
    bag.write_image("/cam0/image_raw", 10, img)
    bag.write_compressed_image("/cam0/compressed", 20, img, fmt="png")
    bag.close()
    msgs = {m.topic: m for m in read_bag_messages(str(tmp_path / "bag"))}
    raw = decode_image(msgs["/cam0/image_raw"].raw)
    np.testing.assert_array_equal(raw.image, img)
    comp = decode_compressed_image(msgs["/cam0/compressed"].raw)
    np.testing.assert_array_equal(comp.image, img)  # png is lossless


def test_fluid_pressure_depth():
    w = CdrWriter()
    w.header(5)
    depth = 7.5
    w.f64(101325.0 + depth * 997.0 * 9.80665)
    w.f64(0.0)
    m = decode_fluid_pressure(w.data())
    assert abs(m.value - depth) < 1e-9


def _make_stereo_bag(path, n_frames=5, imu_per_frame=5, right_offset_ns=2_000_000):
    rng = np.random.default_rng(1)
    bag = RosbagWriter(path)
    bag.add_topic("/cam0/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/cam1/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/imu", "sensor_msgs/msg/Imu")
    bag.add_topic("/depth", "sensor_msgs/msg/FluidPressure")
    t0 = 1_000_000_000
    frame_dt = 100_000_000
    imu_dt = frame_dt // imu_per_frame
    for k in range(n_frames * imu_per_frame):
        t = t0 + k * imu_dt
        bag.write_imu("/imu", t, np.zeros(3), np.array([0.0, 0.0, 9.81]))
    for k in range(n_frames):
        t = t0 + k * frame_dt
        img = rng.integers(0, 255, (32, 40), dtype=np.uint8)
        bag.write_image("/cam0/image_raw", t, img)
        # right camera slightly offset — must still pair (stereo_sync)
        bag.write_image("/cam1/image_raw", t + right_offset_ns, img)
        bag.write_fluid_pressure("/depth", t, 3.0 + 0.1 * k)
    bag.close()
    return t0, frame_dt


def test_read_rosbag_stereo_pairing(tmp_path):
    t0, frame_dt = _make_stereo_bag(str(tmp_path / "bag"))
    events = list(
        read_rosbag(
            str(tmp_path / "bag"),
            cam_topics=["/cam0/image_raw", "/cam1/image_raw"],
            imu_topic="/imu",
            depth_topic="/depth",
        )
    )
    frames = [e for e in events if e.kind == "frame"]
    imus = [e for e in events if e.kind == "imu"]
    depths = [e for e in events if e.kind == "depth"]
    assert len(frames) == 5 and len(imus) == 25 and len(depths) == 5
    for k, f in enumerate(frames):
        assert len(f.images) == 2
        # midpoint re-stamp (stereo_sync.cpp imageCallback)
        expected = (t0 + k * frame_dt + 1_000_000) * 1e-9
        assert abs(f.t - expected) < 1e-9
    # stream must be timestamp-ordered per kind interleave
    ts = [e.t for e in events]
    assert all(b >= a - 0.011 for a, b in zip(ts, ts[1:]))


def test_read_rosbag_drops_unpaired(tmp_path):
    bag = RosbagWriter(str(tmp_path / "bag"))
    bag.add_topic("/cam0/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/cam1/image_raw", "sensor_msgs/msg/Image")
    img = np.zeros((8, 8), np.uint8)
    bag.write_image("/cam0/image_raw", 1_000_000_000, img)  # no right match
    bag.write_image("/cam0/image_raw", 2_000_000_000, img)
    bag.write_image("/cam1/image_raw", 2_000_000_000, img)
    bag.close()
    frames = [
        e
        for e in read_rosbag(
            str(tmp_path / "bag"),
            cam_topics=["/cam0/image_raw", "/cam1/image_raw"],
        )
        if e.kind == "frame"
    ]
    assert len(frames) == 1 and abs(frames[0].t - 2.0) < 1e-9


def test_skip_first_seconds(tmp_path):
    _make_stereo_bag(str(tmp_path / "bag"))
    events = list(
        read_rosbag(
            str(tmp_path / "bag"),
            cam_topics=["/cam0/image_raw", "/cam1/image_raw"],
            imu_topic="/imu",
            skip_first_s=0.25,
        )
    )
    assert all(e.t >= 1.0 + 0.25 - 1e-9 for e in events)


def test_convert_bag_to_euroc(tmp_path):
    _make_stereo_bag(str(tmp_path / "bag"))
    out = tmp_path / "euroc"
    counts = convert_bag_to_euroc(
        str(tmp_path / "bag"), str(out),
        cam_topics=["/cam0/image_raw", "/cam1/image_raw"], imu_topic="/imu",
    )
    assert counts == {"imu": 25, "cam0": 5, "cam1": 5}
    # the exported folder round-trips through the EuRoC reader
    from svin_tpu.pipeline import read_euroc_folder

    events = list(read_euroc_folder(str(out), num_cams=2))
    frames = [e for e in events if e.kind == "frame"]
    imus = [e for e in events if e.kind == "imu"]
    # the reader interleaves IMU rows ahead of each image and (like the
    # reference app loop) drops IMU samples trailing the last frame
    assert len(frames) == 5 and len(imus) == 21
    assert frames[0].images[0].shape == (32, 40)


def test_rosbag_feeds_vio_engine(tmp_path):
    """End-to-end: a synthetic rendered sequence written as a rosbag2 bag and
    replayed through VioEngine produces finite frame results (the
    okvis_node_synchronous path)."""
    import jax.numpy as jnp

    from svin_tpu import sim
    from svin_tpu.cameras import NCameraSystem, make_camera
    from svin_tpu.kinematics import from_rq
    from svin_tpu.pipeline import (
        VioConfig,
        VioEngine,
        run_events,
        synthetic_sequence,
    )

    cam = make_camera(120, 90, 100.0, 100.0, 60.0, 45.0, model="none")
    rig = NCameraSystem()
    rig.add_camera(from_rq([0, 0, 0], [0, 0, 0, 1]), cam)
    rig.add_camera(from_rq([0.2, 0, 0], [0, 0, 0, 1]), cam)
    events, _ = synthetic_sequence(
        rig, duration=1.2, traj=sim.default_trajectory(scale=0.3, ramp_tau=0.6),
        spread=6.0, depth_offset=3.0,
    )
    bag = RosbagWriter(str(tmp_path / "bag"))
    bag.add_topic("/cam0/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/cam1/image_raw", "sensor_msgs/msg/Image")
    bag.add_topic("/imu", "sensor_msgs/msg/Imu")
    for e in events:
        t_ns = int(round(e.t * 1e9))
        if e.kind == "imu":
            bag.write_imu("/imu", t_ns, e.imu[0], e.imu[1])
        elif e.kind == "frame":
            bag.write_image(
                "/cam0/image_raw", t_ns, np.asarray(e.images[0] * 255, np.uint8)
            )
            bag.write_image(
                "/cam1/image_raw", t_ns, np.asarray(e.images[1] * 255, np.uint8)
            )
    bag.close()

    replayed = read_rosbag(
        str(tmp_path / "bag"),
        cam_topics=["/cam0/image_raw", "/cam1/image_raw"],
        imu_topic="/imu",
    )
    cfg = VioConfig()
    engine = VioEngine(cfg, rig=rig)
    results = run_events(engine, replayed, max_frames=6)
    assert len(results) >= 4
    assert all(np.all(np.isfinite(np.asarray(r.T_WS.r))) for r in results)
