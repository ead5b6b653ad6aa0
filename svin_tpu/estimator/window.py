"""Fixed-shape sliding-window state and factor containers.

TPU-native replacement for the reference's pointer-rich Ceres object graph
(``okvis_ceres/include/okvis/Estimator.hpp:176-450``, ``Map.hpp``): the
window is a preallocated structure-of-arrays pytree with validity masks —
S state slots, L landmark slots, O flat observation slots — so every
optimizer step is one compiled XLA program with static shapes.

Minimal (error-state) coordinates per state: 15 = [δp, δα, δv, δb_g, δb_a]
(pose 6 + speed/bias 9), matching the IMU factor block order. Landmarks are
homogeneous points with w = 1 and 3-DoF minimal coords (the reference's
HomogeneousPointManifold restricted to its standard use).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..imu import Preintegral
from ..kinematics import Transformation


class WindowConfig(NamedTuple):
    """Static shape/solver configuration (trace-time constants)."""

    num_states: int = 8  # S: numKeyframes(5) + numImuFrames(3) reference window
    num_landmarks: int = 256  # L landmark slots
    num_obs: int = 2048  # O flat observation slots
    max_iterations: int = 10  # LM iterations (reference ceres max 10)
    cauchy_c: float = 1.0  # Cauchy robust-loss scale (reference CauchyLoss(1))
    num_cameras: int = 2  # C rig cameras (extrinsics slots in the window)
    # Online extrinsics calibration (reference Estimator.cpp:205-228,332-345:
    # sigma_absolute_translation/orientation > 0 estimates T_SC with an
    # absolute pose prior; == 0 keeps it constant). One shared block per
    # camera — the reference's per-state-block random-walk variant only
    # activates for sigma_c_relative > 0, which no shipped config uses.
    estimate_extrinsics: bool = False
    # Unroll the LM loop (lax.scan unroll): lets XLA fuse across iterations
    # (~15% latency win on TPU) at the price of a max_iterations-times
    # larger program — keep off where compile volume matters (CPU tests).
    unroll: bool = False

    @property
    def state_dim(self) -> int:
        return self.num_states * 15

    @property
    def full_dim(self) -> int:
        """States + extrinsics minimal dims (solver-side layout: the
        C·6 extrinsics coords are appended after the S·15 state coords)."""
        return self.num_states * 15 + self.num_cameras * 6


class WindowState(NamedTuple):
    """Optimized variables + bookkeeping. All leading dims are static."""

    # states
    r: jnp.ndarray  # (S,3) p_WS
    q: jnp.ndarray  # (S,4) q_WS xyzw
    speed_bias: jnp.ndarray  # (S,9) [v_W, b_g, b_a]
    state_valid: jnp.ndarray  # (S,) bool
    is_keyframe: jnp.ndarray  # (S,) bool
    timestamp: jnp.ndarray  # (S,) float seconds
    state_id: jnp.ndarray  # (S,) int32 global ids (host bookkeeping)
    # landmarks
    hp_W: jnp.ndarray  # (L,4) homogeneous, w==1
    lm_valid: jnp.ndarray  # (L,) bool
    lm_id: jnp.ndarray  # (L,) int32 global ids
    lm_quality: jnp.ndarray  # (L,) float (3x3 Hessian eigen ratio)
    # camera extrinsics T_SC per rig camera (optimized only when
    # cfg.estimate_extrinsics; otherwise carried as constants)
    ext_r: jnp.ndarray  # (C,3)
    ext_q: jnp.ndarray  # (C,4) xyzw

    def pose(self, idx=None) -> Transformation:
        if idx is None:
            return Transformation(r=self.r, q=self.q)
        return Transformation(r=self.r[idx], q=self.q[idx])

    def T_SC(self, c) -> Transformation:
        return Transformation(r=self.ext_r[c], q=self.ext_q[c])


class ReprojectionFactors(NamedTuple):
    """Flat observation table (replaces per-landmark observation maps)."""

    uv: jnp.ndarray  # (O,2) measured keypoint [px]
    state_idx: jnp.ndarray  # (O,) int32 window slot
    lm_idx: jnp.ndarray  # (O,) int32 landmark slot
    cam_idx: jnp.ndarray  # (O,) int32 camera index in rig
    sqrt_info: jnp.ndarray  # (O,) scalar sqrt information (isotropic, 1/sigma_px)
    valid: jnp.ndarray  # (O,) bool


class ImuFactors(NamedTuple):
    """Preintegrals between consecutive state slots i → i+1."""

    pre: Preintegral  # batched (S-1, ...)
    sqrt_info: jnp.ndarray  # (S-1,15,15)
    valid: jnp.ndarray  # (S-1,) bool


class DepthFactors(NamedTuple):
    """Water-depth (pressure) factor per state: z_WS ≈ -depth + first_depth
    (reference DepthError.cpp:70-139, information 5.0)."""

    depth: jnp.ndarray  # (S,) measured depth [m]
    first_depth: jnp.ndarray  # () reference surface offset
    sqrt_info: jnp.ndarray  # (S,) scalar
    valid: jnp.ndarray  # (S,) bool


class SonarFactors(NamedTuple):
    """Sonar range factor per state: range ≈ ‖r_WS − target_W‖ where target_W
    is the mean of visual landmarks near the beam endpoint, resolved at
    state-creation time (reference SonarError.cpp:113-183,
    Estimator.cpp:265-316)."""

    range: jnp.ndarray  # (S,)
    target_W: jnp.ndarray  # (S,3) mean nearby-landmark point
    sqrt_info: jnp.ndarray  # (S,)
    valid: jnp.ndarray  # (S,) bool


class PriorFactors(NamedTuple):
    """Per-state Gaussian priors: pose (6-dim) and speed/bias (9-dim) —
    used for first-pose gauge fixing (information 1e8/1e14 analog) and
    speed/bias priors (reference Estimator.cpp:319-408)."""

    pose_mean_r: jnp.ndarray  # (S,3)
    pose_mean_q: jnp.ndarray  # (S,4)
    pose_sqrt_info: jnp.ndarray  # (S,6,6)
    pose_valid: jnp.ndarray  # (S,) bool
    sb_mean: jnp.ndarray  # (S,9)
    sb_sqrt_info: jnp.ndarray  # (S,9,9)
    sb_valid: jnp.ndarray  # (S,) bool


class LandmarkPrior(NamedTuple):
    """3-dim landmark position prior (reference
    ``HomogeneousPointError.cpp:120`` — constructed only by the reference's
    tests at runtime, provided here for inventory parity and for anchoring
    surveyed/known landmarks, e.g. georeferenced markers)."""

    mean: jnp.ndarray  # (L,3)
    sqrt_info: jnp.ndarray  # (L,3,3)
    valid: jnp.ndarray  # (L,) bool


class ExtrinsicsPrior(NamedTuple):
    """Absolute pose prior on each camera's T_SC — the reference's online
    extrinsics calibration (Estimator.cpp:332-345: PoseError with
    sigma_absolute_translation/orientation variances when > 0)."""

    mean_r: jnp.ndarray  # (C,3)
    mean_q: jnp.ndarray  # (C,4)
    sqrt_info: jnp.ndarray  # (C,6,6)
    valid: jnp.ndarray  # (C,) bool


class MarginalPrior(NamedTuple):
    """Dense FEJ marginalization prior over the full minimal state:
    cost = ½ ‖b + H (χ ⊟ χ_lin)‖²_H-metric accumulated as
    H_marg (Dx,Dx), b_marg (Dx,) with linearization points (reference
    MarginalizationError.cpp:126-844). Dx = cfg.full_dim: the S·15 state
    coords followed by the C·6 extrinsics coords — the extrinsics block is
    written only under online calibration (cfg.estimate_extrinsics) and
    stays identically zero otherwise."""

    H: jnp.ndarray  # (Dx,Dx)
    b: jnp.ndarray  # (Dx,)
    lin_r: jnp.ndarray  # (S,3) pose linearization points
    lin_q: jnp.ndarray  # (S,4)
    lin_sb: jnp.ndarray  # (S,9)
    lin_ext_r: jnp.ndarray  # (C,3) extrinsics linearization points
    lin_ext_q: jnp.ndarray  # (C,4)
    valid: jnp.ndarray  # () bool — any prior accumulated yet


class Factors(NamedTuple):
    reproj: ReprojectionFactors
    imu: ImuFactors
    depth: DepthFactors
    sonar: SonarFactors
    priors: PriorFactors
    ext_prior: ExtrinsicsPrior
    marg: MarginalPrior
    lm_prior: LandmarkPrior


def empty_window(cfg: WindowConfig, dtype=jnp.float64, rig=None) -> WindowState:
    """Fresh window. ``rig`` (a RigParams) seeds the extrinsics slots; the
    identity is used otherwise (callers with off-origin cameras must pass it —
    reprojection evaluates T_SC from the window, not from RigParams)."""
    S, L, C = cfg.num_states, cfg.num_landmarks, cfg.num_cameras
    q0 = jnp.zeros((S, 4), dtype).at[:, 3].set(1.0)
    if rig is not None:
        ext_r = jnp.asarray(rig.T_SC_r[:C], dtype)
        ext_q = jnp.asarray(rig.T_SC_q[:C], dtype)
    else:
        ext_r = jnp.zeros((C, 3), dtype)
        ext_q = jnp.zeros((C, 4), dtype).at[:, 3].set(1.0)
    return WindowState(
        r=jnp.zeros((S, 3), dtype),
        q=q0,
        speed_bias=jnp.zeros((S, 9), dtype),
        state_valid=jnp.zeros(S, bool),
        is_keyframe=jnp.zeros(S, bool),
        timestamp=jnp.zeros(S, dtype),
        state_id=jnp.full(S, -1, jnp.int32),
        hp_W=jnp.zeros((L, 4), dtype).at[:, 3].set(1.0),
        lm_valid=jnp.zeros(L, bool),
        lm_id=jnp.full(L, -1, jnp.int32),
        lm_quality=jnp.zeros(L, dtype),
        ext_r=ext_r,
        ext_q=ext_q,
    )


def empty_factors(cfg: WindowConfig, dtype=jnp.float64) -> Factors:
    S, L, O = cfg.num_states, cfg.num_landmarks, cfg.num_obs
    Dx = cfg.full_dim
    Sm1 = S - 1
    pre = Preintegral(
        Delta_q=jnp.zeros((Sm1, 4), dtype).at[:, 3].set(1.0),
        C_integral=jnp.zeros((Sm1, 3, 3), dtype),
        C_doubleintegral=jnp.zeros((Sm1, 3, 3), dtype),
        acc_integral=jnp.zeros((Sm1, 3), dtype),
        acc_doubleintegral=jnp.zeros((Sm1, 3), dtype),
        dalpha_db_g=jnp.zeros((Sm1, 3, 3), dtype),
        dv_db_g=jnp.zeros((Sm1, 3, 3), dtype),
        dp_db_g=jnp.zeros((Sm1, 3, 3), dtype),
        P_delta=jnp.tile(jnp.eye(15, dtype=dtype), (Sm1, 1, 1)),
        Delta_t=jnp.zeros(Sm1, dtype),
        bias_ref=jnp.zeros((Sm1, 6), dtype),
    )
    q0 = jnp.zeros((S, 4), dtype).at[:, 3].set(1.0)
    return Factors(
        reproj=ReprojectionFactors(
            uv=jnp.zeros((O, 2), dtype),
            state_idx=jnp.zeros(O, jnp.int32),
            lm_idx=jnp.zeros(O, jnp.int32),
            cam_idx=jnp.zeros(O, jnp.int32),
            sqrt_info=jnp.ones(O, dtype),
            valid=jnp.zeros(O, bool),
        ),
        imu=ImuFactors(
            pre=pre,
            sqrt_info=jnp.tile(jnp.eye(15, dtype=dtype), (Sm1, 1, 1)),
            valid=jnp.zeros(Sm1, bool),
        ),
        depth=DepthFactors(
            depth=jnp.zeros(S, dtype),
            first_depth=jnp.zeros((), dtype),
            sqrt_info=jnp.full(S, jnp.sqrt(5.0), dtype),
            valid=jnp.zeros(S, bool),
        ),
        sonar=SonarFactors(
            range=jnp.zeros(S, dtype),
            target_W=jnp.zeros((S, 3), dtype),
            sqrt_info=jnp.ones(S, dtype),
            valid=jnp.zeros(S, bool),
        ),
        priors=PriorFactors(
            pose_mean_r=jnp.zeros((S, 3), dtype),
            pose_mean_q=q0,
            pose_sqrt_info=jnp.zeros((S, 6, 6), dtype),
            pose_valid=jnp.zeros(S, bool),
            sb_mean=jnp.zeros((S, 9), dtype),
            sb_sqrt_info=jnp.zeros((S, 9, 9), dtype),
            sb_valid=jnp.zeros(S, bool),
        ),
        ext_prior=ExtrinsicsPrior(
            mean_r=jnp.zeros((cfg.num_cameras, 3), dtype),
            mean_q=jnp.zeros((cfg.num_cameras, 4), dtype).at[:, 3].set(1.0),
            sqrt_info=jnp.zeros((cfg.num_cameras, 6, 6), dtype),
            valid=jnp.zeros(cfg.num_cameras, bool),
        ),
        marg=MarginalPrior(
            H=jnp.zeros((Dx, Dx), dtype),
            b=jnp.zeros(Dx, dtype),
            lin_r=jnp.zeros((S, 3), dtype),
            lin_q=q0,
            lin_sb=jnp.zeros((S, 9), dtype),
            lin_ext_r=jnp.zeros((cfg.num_cameras, 3), dtype),
            lin_ext_q=jnp.zeros((cfg.num_cameras, 4), dtype).at[:, 3].set(1.0),
            valid=jnp.zeros((), bool),
        ),
        lm_prior=LandmarkPrior(
            mean=jnp.zeros((L, 3), dtype),
            sqrt_info=jnp.zeros((L, 3, 3), dtype),
            valid=jnp.zeros(L, bool),
        ),
    )
