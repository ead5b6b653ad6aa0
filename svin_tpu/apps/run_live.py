"""Live-mode runner — the ``okvis_node`` analog without ROS.

Replays a dataset at wall-clock rate (or a speed multiple) through the
threaded live pipeline: sensor events → ``AsyncVioEngine`` (frame
synchronizer + bounded drop-oldest queues + IMU gate, the ThreadedKFVio
architecture) → keyframe exports → ``AsyncLoopCloser`` (the pose_graph_node
worker analog). Frames that the pipeline cannot keep up with are DROPPED,
exactly like the reference's live mode (``ThreadedKFVio::addImage``
PushNonBlockingDroppingIfFull) — the printout reports drop counts.

Usage:
  python -m svin_tpu.apps.run_live <config.yaml> <euroc_dir>|<rosbag2>|--synthetic \
      [out_dir] [--speed X]     # X=1 real time, 2 = 2x faster, 0 = no pacing
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 2
    config_path, data = argv[0], argv[1]
    speed = 1.0
    rest = []
    i = 2
    while i < len(argv):
        a = argv[i]
        if a == "--speed":
            speed = float(argv[i + 1])
            i += 2
        elif a.startswith("--speed="):
            speed = float(a.split("=", 1)[1])
            i += 1
        else:
            rest.append(a)
            i += 1
    out_dir = rest[0] if rest else "svin_live_out"
    os.makedirs(out_dir, exist_ok=True)

    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    from ..loopclosure import LoopCloser
    from ..pipeline import VioEngine, events_from_source, load_config
    from ..pipeline.async_vio import AsyncLoopCloser, AsyncVioEngine
    from ..utils import Timing

    cfg = load_config(config_path)
    engine = VioEngine(cfg)
    closer = LoopCloser(engine.rig.cameras[0], cfg)
    # keyframe_queue: bounded loop-closure intake depth (the reference's
    # named keyframe_tracking_queue_, LoopClosure.cpp:22)
    acl = AsyncLoopCloser(
        closer, queue_size=max(1, cfg.loop_closure.keyframe_queue),
        blocking=False,
    )
    live = AsyncVioEngine(engine, blocking=False)
    live.keyframe_callback = acl.add_keyframe
    n_results = [0]
    live.state_callback = lambda r: n_results.__setitem__(0, n_results[0] + 1)

    events = events_from_source(data, cfg, engine.rig)
    if data == "--synthetic":
        events = list(events)

    t_first = None
    t0_wall = time.perf_counter()
    n_frames = 0
    for ev in events:
        if t_first is None:
            t_first = ev.t
        if speed > 0:
            target = (ev.t - t_first) / speed
            lag = target - (time.perf_counter() - t0_wall)
            if lag > 0:
                time.sleep(lag)
        if ev.kind == "imu":
            gyro, acc = ev.imu
            live.add_imu_measurement(ev.t, gyro, acc)
        elif ev.kind == "frame":
            n_frames += 1
            for ci, img in enumerate(ev.images):
                live.add_image(ev.t, ci, np.asarray(img))
        elif ev.kind == "depth":
            live.add_depth_measurement(ev.t, ev.depth)
        elif ev.kind == "sonar":
            live.add_sonar_measurement(ev.t, *ev.sonar)

    live.finish()
    acl.finish()
    wall = time.perf_counter() - t0_wall

    engine.save_trajectory_tum(os.path.join(out_dir, "svin_vio.txt"))
    closer.save_trajectory_tum(os.path.join(out_dir, "svin_loop.txt"))
    print(
        f"live replay: {n_frames} frames in {wall:.1f}s wall "
        f"({n_results[0]} processed, {live.dropped_frames} frames dropped, "
        f"{acl.dropped_keyframes} keyframes dropped, "
        f"{len(closer.loops)} loops)  outputs in {out_dir}/"
    )
    print(Timing.print_table())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
