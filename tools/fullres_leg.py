"""Accuracy at REPRESENTATIVE frontend shapes (VERDICT r5 task #4).

Every accuracy artifact before round 5 rendered 200x150 images with 150
keypoints; the shipped engine shapes (480x752 stereo, 400 keypoints —
reference ``config_stereorig_v2.yaml:89-91`` / ``Frontend.cpp:74-82``)
had only ever run two dozen bench frames with no ATE measured. This tool
runs ONE gauntlet-class leg at full resolution on the current backend
(the tunneled TPU chip in the shipped f32 path under the harness) through
the full CLI — VioEngine + LoopCloser — and records Sim(3)-ATE next to
the 200x150 numbers, proving the full-resolution detection/descriptor/
matching chain converges comparably.

Writes ``artifacts/FULLRES_ACCURACY_r05.json``.

Usage: python tools/fullres_leg.py [--duration S]
"""
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# EuRoC-like stereo rig at FULL reference resolution, radtan distortion,
# 400 keypoints (Frontend.cpp:74-82), reference window 5+3
CONFIG_YAML = """%YAML:1.0
cameras:
  - T_SC: [1.0, 0.0, 0.0, 0.0,  0.0, 1.0, 0.0, 0.0,  0.0, 0.0, 1.0, 0.0,  0.0, 0.0, 0.0, 1.0]
    image_dimension: [752, 480]
    focal_length: [458.654, 457.296]
    principal_point: [367.215, 248.375]
    distortion_coefficients: [-0.2834, 0.0739, 0.00019, 1.76e-05]
    distortion_type: radialtangential
  - T_SC: [1.0, 0.0, 0.0, 0.11,  0.0, 1.0, 0.0, 0.0,  0.0, 0.0, 1.0, 0.0,  0.0, 0.0, 0.0, 1.0]
    image_dimension: [752, 480]
    focal_length: [458.654, 457.296]
    principal_point: [367.215, 248.375]
    distortion_coefficients: [-0.2834, 0.0739, 0.00019, 1.76e-05]
    distortion_type: radialtangential

camera_params:
    camera_rate: 3

imu_params:
    imu_rate: 100

numKeyframes: 5
numImuFrames: 3

ceres_options:
    maxIterations: 5
    timeLimit: -1.0

detection_options:
    threshold: 40.0
    octaves: 0
    maxNoKeypoints: 400

loop_closure_params:
    enable: 1
    min_correspondences: 25
"""


def main() -> int:
    duration = 45.0
    if "--duration" in sys.argv:
        duration = float(sys.argv[sys.argv.index("--duration") + 1])
    os.environ.setdefault("SVIN_COMPCACHE", "1")
    os.environ["SVIN_SYNTH_DURATION"] = str(duration)
    os.environ["SVIN_SYNTH_REVISIT"] = "1"

    import numpy as np

    import jax

    tmp = tempfile.mkdtemp(prefix="fullres_leg_")
    cfg_path = os.path.join(tmp, "rig.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_YAML)
    out_dir = os.path.join(tmp, "out")
    from svin_tpu.apps.run_synchronous import main as run_main

    t0 = time.time()
    rc = run_main([cfg_path, "--synthetic", out_dir])
    wall = time.time() - t0
    assert rc == 0, rc

    from svin_tpu import sim
    from svin_tpu.evaluation import ate_rmse, load_tum

    traj = sim.default_trajectory(scale=0.4, ramp_tau=0.8)
    traj = traj._replace(r_lin=traj.r_lin * 0.0)
    metrics = {}
    for name in ("svin_vio", "svin_loop"):
        path = os.path.join(out_dir, f"{name}.txt")
        if not os.path.exists(path):
            continue
        t, p, q = load_tum(path)
        gt_p = np.stack([np.asarray(sim.position(traj, tt)) for tt in t])
        rmse, _ = ate_rmse(p, gt_p, with_scale=True)
        metrics[name] = {
            "n_poses": int(len(p)),
            "ate_rmse_m": round(float(rmse), 4),
        }
    art = {
        "what": (
            "Gauntlet-class synthetic leg at the SHIPPED frontend shapes "
            "(752x480 stereo, radtan distortion, 400 keypoints, reference "
            "5+3 window) through the full CLI on the current backend — "
            "accuracy evidence at representative resolution (the 200x150 "
            "artifacts are in ACCURACY_r05.json / CAVE_RUN_r05.json). "
            "Reference shapes: config_stereorig_v2.yaml:89-91, "
            "Frontend.cpp:74-82."
        ),
        "platform": jax.devices()[0].platform,
        "dtype": "float64" if jax.config.jax_enable_x64 else "float32",
        "duration_s": duration,
        "wall_s": round(wall, 1),
        **metrics,
    }
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    out = os.path.join(REPO, "artifacts", "FULLRES_ACCURACY_r05.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))
    # convergence bound: comparable to the small-shape gauntlet class
    assert metrics["svin_vio"]["ate_rmse_m"] < 0.5, metrics
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
