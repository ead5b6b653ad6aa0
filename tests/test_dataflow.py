"""Orchestration dataflow test with a fake engine — the analog of the
reference's gmock-based ``testDataFlow.cpp`` (ThreadedKFVio compiled with
USE_MOCK and injected mock backend/frontend, call-count invariants): pump a
synthetic event stream through AsyncVioEngine wrapping a counting fake and
assert the pipeline's call-count and ordering invariants without touching
the real estimator.

Plus the sonar end-to-end path with the real engine.
"""
import threading

import numpy as np
import pytest

from svin_tpu import sim
from svin_tpu.cameras import NCameraSystem, make_camera
from svin_tpu.kinematics import from_rq
from svin_tpu.native import native_available
from svin_tpu.pipeline import VioConfig, VioEngine, run_events, synthetic_sequence
from svin_tpu.pipeline.async_vio import AsyncVioEngine
from svin_tpu.pipeline.vio import FrameResult


class FakeEngine:
    """Counting stand-in for VioEngine (MockVioBackendInterface analog)."""

    def __init__(self, num_cameras=2):
        class _Rig:
            pass

        self.rig = _Rig()
        self.rig.num_cameras = num_cameras
        self.cfg = VioConfig()
        self.calls = {"imu": 0, "frame": 0, "depth": 0, "sonar": 0}
        self.frame_times = []
        self.lock = threading.Lock()

    def add_imu_measurement(self, t, gyro, acc):
        with self.lock:
            self.calls["imu"] += 1

    def add_depth_measurement(self, t, d):
        with self.lock:
            self.calls["depth"] += 1

    def add_sonar_measurement(self, t, r, h):
        with self.lock:
            self.calls["sonar"] += 1

    def add_frame(self, t, images):
        with self.lock:
            self.calls["frame"] += 1
            self.frame_times.append(t)
        from svin_tpu.kinematics import Transformation
        import jax.numpy as jnp

        return FrameResult(
            timestamp=t,
            T_WS=Transformation(r=np.zeros(3), q=np.array([0, 0, 0, 1.0])),
            speed_bias=np.zeros(9),
            is_keyframe=False,
            num_tracked=0,
            num_new_landmarks=0,
            cost=0.0,
        )


@pytest.mark.skipif(not native_available(), reason="native library unavailable")
def test_dataflow_call_counts():
    fake = FakeEngine()
    ae = AsyncVioEngine(fake, blocking=True)
    results = []
    ae.state_callback = results.append
    n_imu, n_frames = 0, 0
    rng = np.random.RandomState(0)
    img = rng.rand(30, 40).astype(np.float32)
    for k in range(300):
        t = k * 0.01
        ae.add_imu_measurement(t, np.zeros(3), np.array([0, 0, 9.81]))
        n_imu += 1
        if k % 10 == 5:  # 10 Hz frames
            for ci in range(2):
                ae.add_image(t, ci, img)
            n_frames += 1
    ae.finish()
    # every IMU sample reached the engine; every synchronized frame processed
    assert fake.calls["imu"] == n_imu
    assert fake.calls["frame"] == n_frames, fake.calls
    # frames processed in order
    assert fake.frame_times == sorted(fake.frame_times)
    assert len(results) == n_frames


def test_sonar_end_to_end():
    from vio_fixtures import small_config, standard_run

    cfg = small_config()
    cfg.is_sonar_used = True
    # sonar beam pointed at the scene: sonar x̂ → body ẑ
    cfg.T_SSo = np.array(
        [[0, 0, -1, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]]
    )
    engine, renderer, results = standard_run(
        duration=1.4, cam_rate=5.0, sonar=True, sonar_T_SSo=cfg.T_SSo, cfg=cfg
    )
    assert len(results) >= 4
    assert all(np.isfinite(r.cost) for r in results[1:])
    # sonar factors may or may not find nearby-landmark targets every frame;
    # the buffer must at least have been fed
    assert len(engine.sonar_buffer) > 0


def test_sonar_intensity_extraction():
    """Subscriber.cpp:223-243 analog: peak bin -> range, gates 4.5 m and
    intensity > 10, tail bins discarded."""
    from svin_tpu.pipeline.dataset import sonar_range_from_intensity

    inten = np.zeros(600)
    inten[199] = 80.0  # peak at bin 199
    inten[580] = 200.0  # in the discarded tail
    out = sonar_range_from_intensity(inten, max_range=6.0, head_position_deg=90.0)
    assert out is not None
    rng, heading = out
    assert abs(rng - 200 * (6.0 / 600)) < 1e-9
    assert abs(heading - np.pi / 2) < 1e-12
    # gate: too far
    far = np.zeros(600); far[490] = 80.0
    assert sonar_range_from_intensity(far, 6.0, 0.0) is None
    # gate: too weak
    weak = np.zeros(600); weak[100] = 5.0
    assert sonar_range_from_intensity(weak, 6.0, 0.0) is None


def test_position_measurement_buffering():
    """VioInterface::addPositionMeasurement parity: accepted + buffered,
    no estimator involvement (the reference attaches no factor either)."""
    fake = FakeEngine()
    eng = AsyncVioEngine(fake, blocking=True)
    for k in range(5):
        eng.add_position_measurement(0.1 * k, np.array([1.0, 2.0, 3.0 + k]))
    assert len(eng.position_measurements) == 5
    t, p = eng.position_measurements[-1]
    assert t == pytest.approx(0.4) and p[2] == pytest.approx(7.0)
    eng.finish()
