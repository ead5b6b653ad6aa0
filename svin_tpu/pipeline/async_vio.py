"""Asynchronous (live-mode) VIO driver on the native runtime primitives.

The threading architecture of ``okvis::ThreadedKFVio``
(``ThreadedKFVio.cpp:167-195`` startThreads, ``addImage`` :257-290 with
drop-if-full live mode vs block-if-full deterministic mode, imu gating
:558, publisherLoop :1308-1329) re-expressed as a TWO-STAGE pipeline over
the engine's split step: a FRONTEND thread runs detection/description of
frame k+1 (``VioEngine.frontend_stage`` — the frameConsumerLoop analog)
while a BACKEND thread runs association + optimization of frame k
(``VioEngine.backend_step``, which additionally keeps one optimize program
in flight on the device and chains the next frame's association behind
it). Stages of consecutive frames genuinely overlap — the reference's
defining runtime property — and results drain through an output queue to
the user callback thread with a one-frame latency.

``blocking=True`` reproduces the reference's deterministic dataset mode
(backpressure all the way to the caller); ``blocking=False`` sheds load by
dropping the oldest queued frame (live mode).
"""
from __future__ import annotations

import threading
from typing import Callable, List, Optional

import numpy as np

from ..utils import Timer
from .vio import FrameResult, VioEngine
from ..native import FrameSynchronizer, ImuGate, ThreadSafeQueue


class AsyncVioEngine:
    """Threaded front door for a VioEngine (the VioInterface analog)."""

    def __init__(
        self,
        engine: VioEngine,
        blocking: bool = False,
        frame_queue_size: int = 2,
        result_queue_size: int = 8,
        imu_wait_timeout: float = 2.0,
    ):
        self.engine = engine
        self.blocking = blocking
        self._sync = FrameSynchronizer(
            engine.rig.num_cameras, tolerance_s=engine.cfg.timestamp_tolerance
        )
        self._frames = ThreadSafeQueue(frame_queue_size)
        # detected frames staged between the frontend and backend threads
        # (depth 1: at most one frame detected-ahead, like the reference's
        # size-1 keypointMeasurements_ queue, ThreadedKFVio.cpp:627)
        self._staged = ThreadSafeQueue(1)
        self._results = ThreadSafeQueue(result_queue_size)
        self._gate = ImuGate()
        self._imu_lock = threading.Lock()  # guards dead-reckon state only
        self.state_callback: Optional[Callable[[FrameResult], None]] = None
        self.keyframe_callback = None
        self.propagated_state_callback = None  # (t, r, q, v) at IMU rate
        self._prop_t = None
        self._prop_r = self._prop_q = self._prop_v = None
        self._prop_bias = np.zeros(6)
        self._fe_worker = threading.Thread(
            target=self._frontend_loop, daemon=True
        )
        self._be_worker = threading.Thread(
            target=self._backend_loop, daemon=True
        )
        self._publisher = threading.Thread(target=self._publish_loop, daemon=True)
        self._running = True
        self._fe_worker.start()
        self._be_worker.start()
        self._publisher.start()
        self.dropped_frames = 0
        self._last_image_t = -np.inf
        self.position_measurements: List[tuple] = []

    # ------------------------------------------------------------- inputs
    def set_blocking(self, blocking: bool) -> None:
        self.blocking = blocking

    def add_imu_measurement(self, t: float, gyro, acc) -> None:
        self.engine.add_imu_measurement(t, gyro, acc)  # engine-internal lock
        self._gate.announce(int(t * 1e9))
        # optional IMU-rate propagated state (publishImuPropagatedState /
        # imuConsumerLoop realtime propagation, ThreadedKFVio.cpp:774-833):
        # lightweight host-side dead reckoning from the last optimized state
        if self.propagated_state_callback is not None:
            st = self._dead_reckon(t, np.asarray(gyro), np.asarray(acc))
            if st is not None:
                self.propagated_state_callback(*st)

    def _dead_reckon(self, t, gyro, acc):
        eng = self.engine
        if getattr(eng, "n_states", 0) == 0:
            return None
        with self._imu_lock:
            slot = eng.n_states - 1
            t0 = float(eng.window.timestamp[slot])
            if self._prop_t is None or self._prop_t < t0:
                T = eng.window.pose(slot)
                self._prop_r = np.asarray(T.r, float).copy()
                self._prop_q = np.asarray(T.q, float).copy()
                sb = np.asarray(eng.window.speed_bias[slot], float)
                self._prop_v = sb[:3].copy()
                self._prop_bias = sb[3:9].copy()
                self._prop_t = t0
        dt = t - self._prop_t
        # staleness cap: the reference's imuConsumerLoop propagates from
        # lastOptimized however old it is (ThreadedKFVio.cpp:774-833); we
        # cut off at 3 s only to avoid publishing nonsense after a long
        # tracking outage (warmup compiles can lag the feed by ~1 s)
        if dt <= 0 or dt > 3.0:
            return None
        # simple Euler step (publishing-rate prediction, not estimation) —
        # host numpy: this runs per IMU sample (100 Hz), a device dispatch
        # per sample would throttle the whole live pipeline
        from ..kinematics import npq

        w = gyro - self._prop_bias[:3]
        a = acc - self._prop_bias[3:6]
        phi = np.asarray(w * dt, float)
        ang = np.linalg.norm(phi)
        half = 0.5 * ang
        fac = 0.5 if ang < 1e-12 else np.sin(half) / ang
        dq = np.concatenate([phi * fac, [np.cos(half)]])
        q = npq.normalize(npq.multiply(self._prop_q, dq))
        C = npq.to_rotation_matrix(self._prop_q)
        g = np.array([0.0, 0.0, self.engine.cfg.imu.g])
        v = self._prop_v + (C @ a - g) * dt
        r = self._prop_r + self._prop_v * dt + 0.5 * (C @ a - g) * dt * dt
        self._prop_r, self._prop_q, self._prop_v, self._prop_t = r, q, v, t
        return t, r, q, v

    def add_position_measurement(self, t: float, position) -> None:
        """VioInterface::addPositionMeasurement parity: buffered for
        consumers/loggers; the estimator attaches no factor to it (matching
        the reference, whose positionConsumerLoop only deques them —
        ThreadedKFVio.cpp position consumer; no PositionError exists)."""
        self.position_measurements.append((t, np.asarray(position, float)))
        if len(self.position_measurements) > 10000:
            del self.position_measurements[:5000]

    def add_depth_measurement(self, t: float, depth: float) -> None:
        self.engine.add_depth_measurement(t, depth)

    def add_sonar_measurement(self, t: float, range_m: float, heading: float) -> None:
        self.engine.add_sonar_measurement(t, range_m, heading)

    def add_image(self, t: float, cam: int, image: np.ndarray) -> bool:
        """Feed one camera image. Returns False if it was rejected/dropped."""
        if t < self._last_image_t - 1e-9 and cam == 0:
            return False  # out-of-order rejection (ThreadedKFVio.cpp:264-268)
        if cam == 0:
            self._last_image_t = t
        group = self._sync.add_frame(cam, t, image)
        if group is None:
            return True
        t_g, images = group
        # pre-upload: quantize to uint8 and START the host→device transfer
        # from the feeding thread (jax transfers are async) — by the time
        # the frontend stage dispatches detection the pixels are already
        # on (or in flight to) the device, hiding the tunnel upload
        import jax as _jax

        from .vio import _as_upload

        images = [_jax.device_put(_as_upload(im)) for im in images]
        if self.blocking:
            return self._frames.push_blocking((t_g, images))
        dropped = self._frames.push_dropping((t_g, images))
        if dropped is not None:
            self.dropped_frames += 1
        return dropped is None

    # ------------------------------------------------------------- loops
    def _frontend_loop(self) -> None:
        """Detection/description of frame k+1 concurrent with the backend's
        optimization of frame k (frameConsumerLoop analog). A stage
        exception shuts the pipeline down loudly instead of deadlocking
        the (blocking-mode) feeder against a dead thread."""
        try:
            can_split = hasattr(self.engine, "frontend_stage")
            while True:
                item = self._frames.pop_blocking()  # None ⇔ shut down+drained
                if item is None:
                    break
                t, images = item
                # wait for IMU coverage of the frame time (+overlap)
                self._gate.wait_for(int((t + 0.005) * 1e9), timeout_s=2.0)
                if not can_split or getattr(self.engine, "n_states", 0) == 0:
                    # first frame initializes whole in the backend (needs
                    # the IMU-derived attitude); duck-typed engines without
                    # the split API run their add_frame there too
                    self._staged.push_blocking((t, images, None))
                    continue
                with Timer("1.1 frontend_stage"):
                    t_s, fd = self.engine.frontend_stage(t, images)
                self._staged.push_blocking((t_s, images, fd))
        except Exception:  # pragma: no cover - defensive
            import logging

            logging.getLogger("svin_tpu").exception("frontend stage died")
            self._frames.shutdown()
            self._staged.shutdown()

    def _backend_loop(self) -> None:
        """Association + solve (matchingLoop + optimizationLoop analog);
        keeps one optimize program in flight across frames."""
        try:
            while True:
                item = self._staged.pop_blocking()
                if item is None:
                    break
                t, images, fd = item
                with Timer("2.0 frame_total"):
                    if fd is None:
                        result = self.engine.add_frame(t, images)
                    else:
                        result = self.engine.backend_step(t, images, fd)
                if result is not None:
                    self._results.push_blocking(result)
        except Exception:  # pragma: no cover - defensive
            import logging

            logging.getLogger("svin_tpu").exception("backend stage died")
            self._frames.shutdown()
            self._staged.shutdown()

    def _publish_loop(self) -> None:
        while True:
            r = self._results.pop_blocking()  # None ⇔ shut down and drained
            if r is None:
                break
            if self.state_callback:
                self.state_callback(r)
            if r.keyframe_export is not None and self.keyframe_callback:
                self.keyframe_callback(r.keyframe_export)

    # ------------------------------------------------------------- drain
    def finish(self) -> None:
        """Drain queues and stop threads (deterministic shutdown).

        The joins are UNBOUNDED on purpose: the worker may be deep inside a
        device step; returning while it still holds references to the native
        queues and letting GC free them is a use-after-free. Shutdown order:
        close the frame intake (worker drains and exits), join the worker,
        then close the result queue (publisher drains and exits) and join it.
        """
        self._running = False
        self._gate.shutdown()
        self._frames.shutdown()  # pop returns None once drained → FE exits
        self._fe_worker.join()
        self._staged.shutdown()  # backend drains staged frames and exits
        self._be_worker.join()
        flush = getattr(self.engine, "backend_flush", None)
        tail = flush() if flush is not None else None  # last in-flight opt
        if tail is not None:
            self._results.push_blocking(tail)
        self._results.shutdown()
        self._publisher.join()


class AsyncLoopCloser:
    """Loop closure in its own worker thread — the in-process analog of the
    reference's separate ``pose_graph_node`` process (keyframes crossed a
    ROS topic into ``LoopClosure::run``'s queue-draining thread,
    pose_graph/src/pose_graph/LoopClosure.cpp:57-188). Keyframe exports are
    pushed into a bounded native queue (drop-oldest in live mode, blocking
    in deterministic mode) and consumed by a daemon thread driving a
    ``LoopCloser``; loop events surface on ``loop_callback`` from that
    thread. Wire as ``engine.keyframe_callback = acl.add_keyframe``.
    """

    def __init__(self, closer, queue_size: int = 16, blocking: bool = False):
        self.closer = closer
        self.blocking = blocking
        self._queue = ThreadSafeQueue(queue_size)
        self.loop_callback: Optional[Callable] = None
        self.dropped_keyframes = 0
        self.processed = 0
        self._lock = threading.Lock()  # guards closer during finish()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def add_keyframe(self, export: dict) -> None:
        if self.blocking:
            self._queue.push_blocking(export)
        elif self._queue.push_dropping(export) is not None:
            self.dropped_keyframes += 1

    def _run(self) -> None:
        while True:
            export = self._queue.pop_blocking()  # None ⇔ shutdown + drained
            if export is None:
                break
            with self._lock:
                loop = self.closer.add_keyframe(export)
                self.processed += 1
            if loop is not None and self.loop_callback:
                self.loop_callback(loop)

    def finish(self) -> None:
        """Drain the queue and stop the worker (same discipline as
        AsyncVioEngine.finish: shut the intake, join unbounded)."""
        self._queue.shutdown()
        self._worker.join()
        self.closer.flush()  # fast-relocalization-deferred optimization
