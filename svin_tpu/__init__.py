"""svin_tpu — TPU-native sonar-visual-inertial-depth SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AutonomousFieldRoboticsLab/SVIn (SVIn2): OKVIS-style sliding-window
visual-inertial odometry with sonar-range and water-depth factors, plus a
loop-closing pose-graph module with binary-descriptor place recognition.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

  utils/        L0 foundation: time, profiling, config (reads reference YAMLs)
  kinematics/   L1 SE(3)/SO(3) quaternion algebra with minimal-coords Jacobians
  cameras/      L2 pinhole + distortion camera models, N-camera rig
  imu/          IMU preintegration (lax.scan) — propagation + factor residuals
  ops/          Pallas/XLA kernels: Hamming matcher, FAST, BRIEF, CLAHE, image
  frontend/     detection/description, matching, batched RANSAC, triangulation
  estimator/    fixed-shape sliding-window Gauss-Newton with Schur
                marginalization (replaces Ceres backend)
  loopclosure/  binary BoW retrieval, PnP verification, pose-graph optimization,
                switching estimator, global map
  pipeline/     host dataset readers, synchronizers, the VIO engine orchestrator
  parallel/     multi-host distributed bundle adjustment (shard_map/psum)
"""

__version__ = "0.1.0"
