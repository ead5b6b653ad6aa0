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

# TPU MXU matmuls default to bfloat16 inputs (~1e-3 relative error). That is
# fine for the image kernels but fatal for the estimation path: the Schur
# complement H − WᵀHll⁻¹W cancels to ~1e-3 of its term magnitudes, so bf16
# products flip small diagonals negative (NaN factorizations), and every
# factor Jacobian product J^TJ carries 1e-3 noise that stalls the LM loop
# (measured on-chip: 3/8 accepted steps vs 7/8 on CPU at f32, tracking
# collapse within 5 frames). SLAM needs true f32 accumulation everywhere the
# normal equations are formed — make float32 the library-wide default (the
# MXU runs f32 via 3-pass bf16; the big one-hot reductions already requested
# HIGHEST explicitly). Perf-insensitive override: SVIN_MATMUL_PRECISION.
#
# NOTE this is a PROCESS-GLOBAL side effect: importing svin_tpu raises the
# default matmul precision for any other JAX code in the host application
# (trading MXU throughput for accumulation accuracy). Embedders who need a
# different default can set SVIN_MATMUL_PRECISION or scope precision with
# jax.default_matmul_precision(...) context managers around their own code.
import logging as _logging
import os as _os

import jax as _jax

_ALLOWED_PRECISIONS = (
    "default", "bfloat16", "bfloat16_3x", "tensorfloat32", "float32",
    "highest",
)
_prec = _os.environ.get("SVIN_MATMUL_PRECISION", "float32")
if _prec not in _ALLOWED_PRECISIONS:
    _logging.getLogger("svin_tpu").warning(
        "invalid SVIN_MATMUL_PRECISION=%r (allowed: %s); using float32",
        _prec, ", ".join(_ALLOWED_PRECISIONS),
    )
    _prec = "float32"
_jax.config.update("jax_default_matmul_precision", _prec)
