"""The VIO engine: deterministic host pipeline around the jitted device cores.

Replaces ``okvis::ThreadedKFVio`` + ``okvis::Frontend`` orchestration
(``okvis_multisensor_processing/src/ThreadedKFVio.cpp``,
``okvis_frontend/src/Frontend.cpp:116-242`` dataAssociationAndInitialization)
with a single-threaded, deterministic ("blocking mode") stage sequence per
frame — the reference's 12-thread pipeline exists to keep a CPU busy; on TPU
the stages are fused device programs and the host only sequences them:

  add_imu → buffered;  add_frame:
    1. preprocess + detect + describe          (device, one program per cam)
    2. IMU preintegrate + propagate prediction (device)
    3. match keypoints ↔ window landmarks with projection gating (device)
    4. new-landmark creation via stereo match + triangulation    (device)
    5. state creation + factor table update    (host bookkeeping, numpy)
    6. optimize                                 (device, jitted LM+Schur)
    7. marginalization policy (RSS'13 analog)  (device fold + shift)
    8. outputs: state callback, keyframe export (the pose_graph ABI)

Pipelined execution layers on top via the split ``frontend_stage`` /
``backend_step`` API (driven by ``AsyncVioEngine``): detection of frame
k+1 runs in its own thread overlapping the backend of frame k, images
pre-upload from the feeding thread, and the backend keeps one
optimize(+marginalize) program in flight — the next frame's
preintegration/association chain behind it on the device, consuming its
un-fetched window output, so each backend step pays ONE blocking fetch.
Measured through the remote-TPU tunnel: serial ``add_frame`` 132 ms
median vs 15.2 fps (66 ms/frame) pipelined sustained — see bench.py.
"""
from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import NCameraSystem, back_project, project
from ..cameras.pinhole import project_jacobian
from ..estimator import (
    WindowConfig,
    empty_factors,
    empty_window,
    marginalize_slot,
    optimize,
    rig_params,
)
from ..frontend import (
    ScaleRefiner,
    absolute_pose_ransac,
    point_from_homogeneous,
    relative_pose_ransac,
    rotation_only_ransac,
    triangulate_fast,
    triangulation_covariance,
)
from ..frontend.hull import keyframe_overlap_ratio
from ..imu import init_pose_from_imu, preintegrate, propagate, sqrt_information
from ..kinematics import (
    Transformation,
    compose,
    inverse,
    npq,
    transform_point,
    quaternion as quat,
)
from ..ops import descriptor as desc_ops, detection, hamming, image as image_ops
from ..utils import Timer
from .config import VioConfig

TEMPORAL_IMU_OVERLAP = 0.02  # s (reference ThreadedKFVio.cpp:87)

_LOG = logging.getLogger("svin_tpu")

from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=(
        "max_keypoints", "octaves", "histogram_method", "clahe_clip_limit",
        "resize_factor", "clahe_tiles",
    ),
)
def _frontend_batch(
    imgs: jnp.ndarray,  # (C,H,W) raw images (full resolution — resized
    # here by resize_factor to match the rescaled intrinsics,
    # Subscriber.cpp:123-160)
    g_C: jnp.ndarray,  # (C,3) gravity direction per camera frame
    threshold: jnp.ndarray,  # () detector response threshold (traced —
    # changing the config key does not recompile)
    *,
    max_keypoints: int,
    octaves: int,
    histogram_method: str,
    clahe_clip_limit: float,
    resize_factor: float = 1.0,
    clahe_tiles: int = 4,
):
    """Preprocess + detect + describe for ALL cameras in one compiled
    program (vmap over the camera axis)."""

    def one(img, g):
        im = image_ops.preprocess(
            img,
            resize_factor=resize_factor,
            histogram_method=histogram_method,
            clahe_clip_limit=clahe_clip_limit,
            clahe_tiles=clahe_tiles,
        )
        kp = detection.detect(
            im, max_keypoints=max_keypoints, octaves=octaves,
            threshold=threshold.astype(im.dtype),
        )
        ang = desc_ops.gravity_angles(kp.uv, g.astype(im.dtype))
        d = desc_ops.describe(
            im, kp.uv, ang, kp.valid, octave=kp.octave, max_octave=octaves
        )
        im8 = jnp.clip(im * 255.0, 0.0, 255.0).astype(jnp.uint8)
        return kp.uv, d, kp.valid, kp.score, kp.octave, im8

    uv, d, valid, score, octv, im8 = jax.vmap(one)(imgs, g_C)
    # only cam0's processed image leaves the device (keyframe export);
    # the other cameras' uint8 conversions are DCE'd by XLA
    return uv, d, valid, score, octv, im8[0]


def _as_upload(img):
    """Host image → the cheapest-to-upload representation.

    The tunnel's host→device bandwidth is the single largest component of
    the measured frame (54 MB/s probed; a float32 480x752 stereo pair is
    2.9 MB ≈ 53 ms, artifacts/FRAME_ATTRIBUTION.json). Real cameras are
    8-bit mono (the reference consumes mono8 images, Subscriber.cpp:123),
    so quantizing a float renderer output to uint8 before upload is
    lossless with respect to what the reference pipeline ever sees and
    cuts the upload 4x. Device arrays pass through untouched (the async
    engine pre-uploads at intake)."""
    if isinstance(img, jax.Array):
        return img
    a = np.asarray(img)
    if a.dtype == np.uint8:
        return a
    return np.clip(a * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def _to_np(tree):
    """Device pytree → mutable host-numpy pytree (the engine's bookkeeping
    state lives on the host; only the fixed-shape jitted programs touch the
    device). MUST go through ``jax.device_get`` — it fetches the whole tree
    in one batched transfer, while per-leaf ``np.array(leaf)`` issues one
    RPC per leaf (catastrophic on remote/tunneled backends: ~6 s/leaf
    observed on axon vs 44 ms for the whole tree)."""
    host = jax.device_get(tree)
    return jax.tree_util.tree_map(np.array, host)  # mutable copies


def _make_stereo_match_tri(cam_a, cam_b, ray_sigma_base: float,
                           pose_var: float):
    """Stereo intra-frame association + probabilistic triangulation as ONE
    device program (Frontend::matchStereo + triangulateFast): descriptor
    matching, per-octave ray sigmas, world-frame midpoint triangulation
    with covariance, depth sanity, and dedup against the existing map —
    the host fetches once and only allocates slots. Camera poses compose
    ON DEVICE from (T_WS, extrinsics) so the un-fetched IMU-propagated
    prediction (and an un-fetched optimize output's landmark table) can
    chain straight in without a host round trip."""

    @jax.jit
    def fn(descA, descB, valA, valB, uvA, uvB, octA, octB,
           T_WS_r, T_WS_q, eAr, eAq, eBr, eBq, hp_W, lm_valid):
        T_WS = Transformation(r=T_WS_r, q=T_WS_q)
        TA = compose(T_WS, Transformation(r=eAr, q=eAq))
        TB = compose(T_WS, Transformation(r=eBr, q=eBq))
        rA, qA, rB, qB = TA.r, TA.q, TB.r, TB.q
        res = hamming.match_descriptors(
            descA, descB, valA, valB, max_distance=60, mutual=True
        )
        ib = res.idx_b
        dtype = uvA.dtype
        sigA = ray_sigma_base * jnp.exp2(octA.astype(dtype)) / cam_a.fu
        sigB = ray_sigma_base * jnp.exp2(octB[ib].astype(dtype)) / cam_b.fu
        rays_a = back_project(cam_a, uvA)
        rays_b = back_project(cam_b, uvB[ib])
        eA = quat.rotate(qA, rays_a)
        eB = quat.rotate(qB, rays_b)
        pA = jnp.broadcast_to(rA, eA.shape)
        pB = jnp.broadcast_to(rB, eB.shape)
        sigma = jnp.sqrt(sigA * sigA + sigB * sigB)
        tri = triangulate_fast(pA, eA, pB, eB, sigma)
        pts = point_from_homogeneous(tri.hp)
        cov = triangulation_covariance(
            pts, pA, pB, sigA, sigB,
            jnp.broadcast_to(jnp.asarray(pose_var, dtype), sigA.shape),
        )
        depth = jnp.linalg.norm(pts - rA, axis=1)
        good = (
            res.valid & tri.valid & ~tri.parallel
            & (depth > 0.1) & (depth < 60.0)
        )
        # dedup against the existing map (never spawn a duplicate landmark)
        d = jnp.linalg.norm(
            pts[:, None, :] - hp_W[None, :, :3], axis=-1
        )
        d = jnp.where(lm_valid[None, :], d, jnp.inf)
        min_d = jnp.min(d, axis=1)
        good = good & (min_d > jnp.maximum(0.1, 0.04 * depth))
        return ib, pts, good, cov

    return fn


def _make_temporal_match_tri(cam, ray_sigma_base: float, diag: float):
    """Temporal 2D-2D bootstrap for one camera as ONE device program
    (Frontend::matchToKeyframes/matchToLastFrame 2D-2D + runRansac2d2d +
    triangulation, Frontend.cpp:336-465,832-980): optical-flow-gated
    matching, probabilistic triangulation, rotation-only vs relative-pose
    RANSAC disambiguation, depth/epipolar/parallax gates, and map dedup —
    one fetch replaces three."""

    @jax.jit
    def fn(k1, k2, descC, descP, valC, valP, uvC, uvP, octC, octP,
           rA, qA, rB, qB, pose_var, hp_W, lm_valid):
        dtype = uvC.dtype
        d2_uv = jnp.sum(
            (uvC[:, None, :] - uvP[None, :, :]) ** 2, axis=-1
        )
        flow_mask = d2_uv < (0.25 * diag) ** 2
        res = hamming.match_descriptors(
            descC, descP, valC, valP, mask=flow_mask,
            max_distance=60, mutual=True,
        )
        ib = res.idx_b
        ok = res.valid
        npair = jnp.sum(ok)
        sigA = ray_sigma_base * jnp.exp2(octC.astype(dtype)) / cam.fu
        sigB = ray_sigma_base * jnp.exp2(octP[ib].astype(dtype)) / cam.fu
        rays_a = back_project(cam, uvC)
        rays_b = back_project(cam, uvP[ib])
        eA = quat.rotate(qA, rays_a)
        eB = quat.rotate(qB, rays_b)
        pA = jnp.broadcast_to(rA, eA.shape)
        pB = jnp.broadcast_to(rB, eB.shape)
        sigma = jnp.sqrt(sigA * sigA + sigB * sigB)
        tri = triangulate_fast(pA, eA, pB, eB, sigma)
        pts = point_from_homogeneous(tri.hp)
        cov = triangulation_covariance(
            pts, pA, pB, sigA, sigB,
            jnp.broadcast_to(pose_var, sigA.shape),
        )
        good = ok & tri.valid & ~tri.parallel

        # 2D-2D RANSAC disambiguation (Frontend::runRansac2d2d): try
        # rotation-only AND relative-pose models; a translation-dominated
        # pass uses the 5-pt inlier set as the mismatch filter, a
        # rotation-dominated one defers to the parallax gate below
        bA = quat.rotate(quat.conjugate(qA), eA)
        bB = quat.rotate(quat.conjugate(qB), eB)
        T_AB = compose(
            inverse(Transformation(r=rA, q=qA)),
            Transformation(r=rB, q=qB),
        )
        focal = float(cam.fu)
        rot_rr = rotation_only_ransac(
            k1, bA, bB, ok, focal_px=focal, num_hypotheses=32
        )
        rel_rr = relative_pose_ransac(
            k2, bA, bB, ok, T_AB, focal_px=focal, num_hypotheses=32
        )
        npf = jnp.maximum(npair, 1).astype(dtype)
        rot_ratio = rot_rr.num_inliers.astype(dtype) / npf
        rel_ratio = rel_rr.num_inliers.astype(dtype) / npf
        rot_decision = (rot_ratio > rel_ratio) | (rot_ratio > 0.8)
        enough = npair >= 10
        apply_rel = enough & (~rot_decision) & rel_rr.success
        good = good & jnp.where(apply_rel, rel_rr.inliers, True)

        depth = jnp.linalg.norm(pts - rA, axis=1)
        good = good & (depth > 0.1) & (depth < 60.0)
        # epipolar-consistency gate (coplanarity with the baseline)
        t_ab = rB - rA
        t_hat = t_ab / jnp.maximum(jnp.linalg.norm(t_ab), 1e-12)
        n_ep = jnp.cross(jnp.broadcast_to(t_hat, eB.shape), eB)
        nn = jnp.linalg.norm(n_ep, axis=1)
        n_ep = n_ep / jnp.maximum(nn, 1e-12)[:, None]
        good = good & (nn > 1e-6) & (
            jnp.abs(jnp.sum(eA * n_ep, axis=1)) < jnp.sin(jnp.radians(0.7))
        )
        # parallax gate (≈1° minimum triangulation angle)
        cos_ang = jnp.sum(eA * eB, axis=-1)
        good = good & (cos_ang < jnp.cos(jnp.radians(1.0)))
        # dedup against the existing map
        d = jnp.linalg.norm(pts[:, None, :] - hp_W[None, :, :3], axis=-1)
        d = jnp.where(lm_valid[None, :], d, jnp.inf)
        good = good & (jnp.min(d, axis=1) > jnp.maximum(0.1, 0.04 * depth))
        return ib, pts, good, cov, enough & rot_decision

    return fn


@dataclass
class FrameResult:
    """Per-frame output (state callback payload)."""

    timestamp: float
    T_WS: Transformation
    speed_bias: np.ndarray
    is_keyframe: bool
    num_tracked: int
    num_new_landmarks: int
    cost: float
    keyframe_export: Optional[dict] = None
    # accepted LM steps in this frame's optimize (reference: Ceres
    # summary.iterations under CeresIterationCallback)
    lm_iterations: int = 0


@dataclass
class _PendingOpt:
    """An in-flight optimize(+marginalize) program (pipelined backend):
    device handles + the host context needed to finalize the frame once
    the next backend step (or flush) fetches it."""

    opt_out: tuple  # device handles of _optimize_fn / _opt_marg_fn output
    win_dev: object  # device WindowState (post-marg) for chaining
    victim: Optional[int]
    lm_valid_before: Optional[np.ndarray]
    slot_post: int  # the frame's slot AFTER the fused marginalization
    t: float
    images: list
    is_kf: bool
    n_tracked: int
    n_new: int
    t_dispatch: float
    static_iters: int = 0


@dataclass
class _FrameData:
    """Host-side per-frame record for matching (per camera arrays)."""

    timestamp: float
    kp_uv: List[jnp.ndarray]
    kp_desc: List[jnp.ndarray]
    kp_valid: List[jnp.ndarray]
    kp_landmark: List[np.ndarray]  # (K,) landmark slot per keypoint or -1
    kp_score: List[jnp.ndarray]
    kp_octave: List[np.ndarray]  # (K,) pyramid level per keypoint
    # preprocessed (resized/CLAHE'd) cam0 image, uint8 — what the keyframe
    # export ships so loop-closure BRIEF recomputation sees pixels in the
    # same coordinate frame as the exported keypoints (Subscriber.cpp
    # preprocesses BEFORE addImage, so the reference pipeline only ever
    # sees the processed image)
    image0: Optional[np.ndarray] = None


class VioEngine:
    """Deterministic sonar-visual-inertial-depth odometry engine."""

    def __init__(
        self,
        config: VioConfig,
        rig: Optional[NCameraSystem] = None,
        dtype=None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.cfg = config
        self.rig = rig if rig is not None else config.build_rig()
        self.rig_p = rig_params(self.rig, dtype)
        S = config.num_keyframes + config.num_imu_frames
        estimate_ext = (
            config.sigma_absolute_translation > 1e-16
            and config.sigma_absolute_orientation > 1e-16
        ) or (
            config.sigma_c_relative_translation > 1e-12
            and config.sigma_c_relative_orientation > 1e-12
        )
        self.wcfg = WindowConfig(
            num_states=S,
            num_landmarks=512,
            num_obs=4096,
            max_iterations=config.max_iterations,
            num_cameras=self.rig.num_cameras,
            estimate_extrinsics=estimate_ext,
        )
        self.dtype = dtype
        self.window = empty_window(self.wcfg, dtype, rig=self.rig_p)
        self.factors = empty_factors(self.wcfg, dtype)
        if estimate_ext:
            # absolute extrinsics prior at the config values
            # (Estimator.cpp:332-345); with only a random-walk sigma the
            # initial anchor is one second of walk
            sat = config.sigma_absolute_translation or (
                config.sigma_c_relative_translation
            )
            sao = config.sigma_absolute_orientation or (
                config.sigma_c_relative_orientation
            )
            si = jnp.diag(
                jnp.asarray([1.0 / sat] * 3 + [1.0 / sao] * 3, dtype)
            )
            ep = self.factors.ext_prior
            self.factors = self.factors._replace(
                ext_prior=ep._replace(
                    mean_r=self.window.ext_r,
                    mean_q=self.window.ext_q,
                    sqrt_info=jnp.tile(si, (self.rig.num_cameras, 1, 1)),
                    valid=jnp.ones(self.rig.num_cameras, bool),
                )
            )
        # ---- bookkeeping state lives on the HOST as numpy; only the
        # fixed-shape jitted programs below touch the device ----
        self.window = _to_np(self.window)
        self.factors = _to_np(self.factors)
        self._lm_desc = np.zeros((self.wcfg.num_landmarks, 8), np.uint32)
        self._lm_cov = np.tile(
            np.eye(3) * self._LM_COV_DEFAULT,
            (self.wcfg.num_landmarks, 1, 1),
        )

        # ---- the engine's device program set (compiled once each; stages
        # that run back-to-back with no host decision between them are FUSED
        # so each frame pays the fewest possible host↔device round trips) ----
        rig_p, imu_p, wcfg = self.rig_p, self.cfg.imu, self.wcfg

        def _reproj_px_err(w, f):
            from ..estimator import eval_reprojection

            ev = eval_reprojection(w, f, rig_p, wcfg)
            wt = jnp.sqrt(jnp.maximum(ev.weight, 1e-9))
            # octave-NORMALIZED pixel error: divide by the constant base
            # info (not the per-observation sqrt_info) so a coarse-octave
            # keypoint's larger sigma scales its prune threshold too —
            # raw-pixel thresholding would destroy perfectly consistent
            # octave>=2 tracks (sigma = 2^octave px)
            err = jnp.linalg.norm(ev.res, axis=-1) / (VioEngine._KP_SQRT_INFO * wt)
            return ev.valid, err

        def _make_opt_program(static_iters: int, with_marg: bool):
            """Build one compiled optimize(+marginalize)+prune program.

            ``with_marg`` fuses the marginalization of the host-chosen
            victim (the RSS'13 policy over is_keyframe flags, never the
            newest slot) into the SAME device program: in steady state
            every frame both optimizes and marginalizes, so fusing removes
            a full tunnel round trip plus a duplicate window+factors
            upload per frame (artifacts/FRAME_ATTRIBUTION.json: the
            separate marginalization step cost ~64 ms/frame of the 215 ms
            median). Marginalization at the post-optimize estimates is
            identical to running it at the start of the next frame
            (nothing touches the window in between).

            ``static_iters`` is the compiled LM scan length. Iterations
            past the traced ``n_it`` budget are masked and change NOTHING,
            so a program compiled at a shorter static bound returns
            bit-identical results for any ``n_it ≤ static_iters`` while
            paying proportionally less device compute — the engine picks
            the shortest compiled bound covering the frame's budget (the
            CeresIterationCallback real-time envelope with the FLOPs
            actually truncated, not just masked)."""
            cfg_k = wcfg._replace(max_iterations=static_iters)

            if with_marg:
                def prog(w, f, n_it, victim):
                    res = optimize(w, f, rig_p, imu_p, cfg_k, n_iters=n_it)
                    w2, f2 = marginalize_slot(
                        res.window, f, victim, rig_p, imu_p, cfg_k
                    )
                    pv, pe = _reproj_px_err(w2, f2)
                    return (
                        w2, f2, res.cost, res.iterations, res.lm_cov, pv, pe
                    )
            else:
                def prog(w, f, n_it):
                    res = optimize(w, f, rig_p, imu_p, cfg_k, n_iters=n_it)
                    pv, pe = _reproj_px_err(res.window, f)
                    return (
                        res.window, res.cost, res.iterations, res.lm_cov,
                        pv, pe,
                    )

            return jax.jit(prog)

        self._opt_programs: Dict[tuple, Callable] = {}
        self._make_opt_program = _make_opt_program
        # the two static LM bounds: the full config bound and a short
        # variant at half (≥ minIterations) for budget-limited frames
        self._opt_bounds = sorted({
            max(self.cfg.min_iterations, 1,
                (config.max_iterations + 1) // 2),
            config.max_iterations,
        })
        # real-time iteration governor (CeresIterationCallback analog,
        # ThreadedKFVio.cpp:760-764): rolling per-LM-iteration wall time;
        # the per-frame budget ``timeLimit`` caps iterations at
        # clip(timeLimit / iter_time, minIterations, maxIterations)
        self._opt_iter_ema: Optional[float] = None
        self._opt_calls = 0
        self._marginalize_fn = jax.jit(
            lambda w, f, s: marginalize_slot(w, f, s, rig_p, imu_p, wcfg)
        )

        def _opt_program_for(n_it: int, with_marg: bool):
            """The compiled optimize program with the SHORTEST static LM
            bound covering this frame's iteration budget (built lazily,
            cached per (bound, with_marg))."""
            bound = next(
                (b for b in self._opt_bounds if b >= n_it),
                self._opt_bounds[-1],
            )
            key = (bound, with_marg)
            if key not in self._opt_programs:
                self._opt_programs[key] = self._make_opt_program(
                    bound, with_marg
                )
            return self._opt_programs[key], bound

        self._opt_program_for = _opt_program_for

        def _preint_prop(ts, gy, ac, mask, t0, t1, r, q, sb):
            pre = preintegrate(ts, gy, ac, mask, t0, t1, sb[3:9], imu_p)
            T_pred, sb_pred = propagate(
                Transformation(r=r, q=q), sb, pre, imu_p
            )
            return pre, T_pred, sb_pred, sqrt_information(pre)

        self._preint_prop_fn = jax.jit(_preint_prop)

        def _grav(q_WS, ext_q):
            def one(qe):
                q_WC = quat.multiply(q_WS, qe)
                return quat.rotate(
                    quat.conjugate(q_WC),
                    jnp.asarray([0.0, 0.0, -1.0], q_WS.dtype),
                )

            return jax.vmap(one)(ext_q)

        # device gravity directions: lets detection consume the UN-FETCHED
        # IMU propagation output (its fetch merges with the keypoint fetch)
        self._gravity_fn = jax.jit(_grav)
        self._preintegrate_fn = jax.jit(
            lambda ts, gy, ac, mask, t0, t1, bias: preintegrate(
                ts, gy, ac, mask, t0, t1, bias, imu_p
            )
        )

        C = self.rig.num_cameras

        def _gate_match_all(
            uv, desc, kp_valid,  # (C,K,...) stacked over cameras
            hp_W, lm_valid, lm_desc,
            lm_cov,  # (L,3,3) world-frame landmark position covariance
            T_WS_r, T_WS_q, ext_r, ext_q,
            kp_sigma,  # (C,K) per-keypoint pixel std (octave-scaled)
            pos_var,  # () pose translation variance (velocity-scaled
            # UOplus, inflated by the tracking-miss streak)
        ):
            """Projection gating with PROJECTED COVARIANCE: the search
            region around each predicted landmark projection is the χ²(2)
            99.9% ellipse of J (Σ_lm + pos_var·I) Jᵀ + σ_kp² I — the
            reference's projectionsIntoBUncertainties gate
            (VioKeyframeWindowMatchingAlgorithm::doSetup:196-206) with the
            landmark covariance from the triangulator/window Hessian
            instead of a fixed pixel radius."""
            CHI2_2_999 = 13.816
            eye3 = jnp.eye(3, dtype=hp_W.dtype)

            def one(ci, uv_c, desc_c, val_c, er, eq, kps_c):
                T_WC = compose(
                    Transformation(r=T_WS_r, q=T_WS_q),
                    Transformation(r=er, q=eq),
                )
                T_CW = inverse(T_WC)
                p_C = transform_point(T_CW, hp_W[:, :3])
                cam = rig_p.camera(ci)
                uv_pred, proj_ok = project(cam, p_C)
                proj_ok = proj_ok & lm_valid
                J = project_jacobian(cam, p_C)  # (L,2,3)
                C_CW = quat.to_rotation_matrix(T_CW.q)
                Sig_C = C_CW @ (lm_cov + pos_var * eye3) @ C_CW.T  # (L,3,3)
                S = jnp.einsum(
                    "lab,lbc,ldc->lad", J, Sig_C, J
                )  # (L,2,2) projected covariance
                r = uv_c[:, None, :] - uv_pred[None, :, :]  # (K,L,2)
                s2 = (kps_c * kps_c)[:, None]  # (K,1)
                a = S[None, :, 0, 0] + s2
                bq = S[None, :, 0, 1]
                cq = S[None, :, 1, 1] + s2
                det = jnp.maximum(a * cq - bq * bq, 1e-12)
                mahal = (
                    cq * r[..., 0] ** 2
                    - 2.0 * bq * r[..., 0] * r[..., 1]
                    + a * r[..., 1] ** 2
                ) / det
                d2 = jnp.sum(r * r, axis=-1)
                # χ² ellipse, with a hard pixel cap against runaway
                # covariances and a small floor so a sharply-converged
                # landmark still tolerates detector jitter
                mask = (
                    ((mahal < CHI2_2_999) | (d2 < 9.0))
                    & (d2 < 150.0 ** 2)
                    & proj_ok[None, :]
                )
                res = hamming.match_descriptors(
                    desc_c, lm_desc, val_c, lm_valid, mask=mask,
                    max_distance=60, mutual=True,
                )
                return res.valid, res.idx_b, back_project(cam, uv_c)

            return jax.vmap(one)(
                jnp.arange(C), uv, desc, kp_valid, ext_r, ext_q, kp_sigma
            )

        self._gate_match_all = jax.jit(_gate_match_all)

        def _match_stage(
            uv, desc, kp_valid, free,  # (C,K,...) stacked over cameras
            hp_W, lm_valid, lm_desc, lm_cov,
            T_WS_r, T_WS_q, ext_r, ext_q, kp_sigma, pos_var,
            key,
        ):
            """The WHOLE data-association stage as one device program —
            projection-gated matching, 3D-2D RANSAC over the cam0
            candidates, and reprojection acceptance through the fitted
            pose — so the host pays ONE round trip instead of three
            (matchToKeyframes + runRansac3d2d + the verify pass,
            Frontend.cpp:336-414,617-676)."""
            mv, midx, rays = _gate_match_all(
                uv, desc, kp_valid, hp_W, lm_valid, lm_desc, lm_cov,
                T_WS_r, T_WS_q, ext_r, ext_q, kp_sigma, pos_var,
            )
            cand = mv & free  # (C,K) gated, unassociated keypoints
            n_cand = jnp.sum(cand)
            p_cand = hp_W[midx, :3]  # (C,K,3)

            # cam0 RANSAC for a pose model (prior-seeded GP3P analog)
            T_WC0 = compose(
                Transformation(r=T_WS_r, q=T_WS_q),
                Transformation(r=ext_r[0], q=ext_q[0]),
            )
            n0 = jnp.sum(cand[0])
            rr = absolute_pose_ransac(
                key, p_cand[0], rays[0], cand[0],
                T_WC0,
                focal_px=float(self.rig.cameras[0].fu),
                threshold_px=4.0, num_hypotheses=50,
                min_inliers=jnp.maximum(8, n0 // 3),
            )
            success = rr.success & (n0 >= 6)
            # T_WS from the fitted cam0 pose
            ri, qi = inverse(Transformation(r=ext_r[0], q=ext_q[0])).r, \
                inverse(Transformation(r=ext_r[0], q=ext_q[0])).q
            T_fit = compose(rr.T, Transformation(r=ri, q=qi))
            T_WS_fit_r = jnp.where(success, T_fit.r, T_WS_r)
            T_WS_fit_q = jnp.where(success, T_fit.q, T_WS_q)
            accept_px = jnp.where(success, 4.0, 8.0)

            # reprojection acceptance of EVERY candidate through the
            # fitted pose (all cameras)
            def accept_cam(ci, uv_c, cand_c, p_c, er, eq):
                T_WC = compose(
                    Transformation(r=T_WS_fit_r, q=T_WS_fit_q),
                    Transformation(r=er, q=eq),
                )
                p_C = transform_point(inverse(T_WC), p_c)
                uv_hat, ok = project(rig_p.camera(ci), p_C)
                err = jnp.linalg.norm(uv_hat - uv_c, axis=-1)
                return cand_c & ok & (err < accept_px)

            accept = jax.vmap(accept_cam)(
                jnp.arange(C), uv, cand, p_cand, ext_r, ext_q
            )
            return (
                accept, midx, n_cand, success, T_WS_fit_r, T_WS_fit_q,
            )

        self._match_stage_fn = jax.jit(_match_stage)
        self._stereo_fns = {}  # (cam_a, cam_b) -> fused match+triangulate
        self._temporal_fns = {}  # cam -> fused temporal bootstrap

        self.imu_t: List[float] = []
        self.imu_gyro: List[np.ndarray] = []
        self.imu_acc: List[np.ndarray] = []
        # pipelined-backend state: the in-flight optimize of the previous
        # frame, and the lock serializing IMU-buffer access between the
        # feeding thread and the frontend/backend stages
        self._pending: Optional[_PendingOpt] = None
        self._imu_mutex = threading.Lock()
        self.depth_buffer: List[tuple] = []  # (t, depth)
        self.sonar_buffer: List[tuple] = []  # (t, range, heading)
        self.first_depth: Optional[float] = None
        self.n_states = 0  # valid slots in window
        self.frames: Dict[int, _FrameData] = {}  # slot -> frame data
        self.last_kf_slot: Optional[int] = None
        self._track_miss_streak = 0  # widens the projection gate on losses
        self._cost_last = 0.0
        self._lm_iterations_last = 0
        # count of camera-pair passes where rotation-only RANSAC beat the
        # relative-pose model (Frontend::runRansac2d2d rotationOnly)
        self.rotation_only_detections = 0
        # detection_options.threshold (reference default 40,
        # Frontend.cpp:74-82) mapped into our Harris response units
        self._detect_threshold = jnp.asarray(
            config.detection_threshold * detection.BRISK_THRESHOLD_SCALE,
            jnp.float32,
        )
        self.frame_count = 0
        self.kf_count = 0
        # state-id → exported keyframe index (kf_count at export time): lets
        # the export translate window covisibilities into keyframe indices
        # the loop closer can resolve (the reference's kfMapper_ contract,
        # LoopClosure.cpp:103-130)
        self._kf_index_by_state_id: Dict[int, int] = {}
        # sequence counter: bumped on VIO reset so the pose graph can
        # re-anchor instead of smearing drift across the discontinuity
        # (reference Keyframe::sequence, PoseGraph.cpp:50-61)
        self.sequence = 0
        self.next_state_id = 0
        self.next_lm_id = 0
        self.state_callback: Optional[Callable[[FrameResult], None]] = None
        self.keyframe_callback: Optional[Callable[[dict], None]] = None
        self.trajectory: List[tuple] = []  # (t, r, q) of latest estimates
        self._rng = np.random.RandomState(1234)
        # one-shot scale-refinement diagnostic over the first keyframes
        # (Frontend.cpp:469-614; like the reference it reports, not rescales)
        self.scale_refiner = ScaleRefiner(
            r_SC=np.asarray(self.rig.T_SC[0].r, float)
        )
        self._last_ransac_T_WS: Optional[Transformation] = None
        self._scale_last_t: Optional[float] = None

    # ------------------------------------------------------------------ IMU
    def add_imu_measurement(self, t: float, gyro, acc) -> None:
        with self._imu_mutex:
            self.imu_t.append(float(t))
            self.imu_gyro.append(np.asarray(gyro, float))
            self.imu_acc.append(np.asarray(acc, float))
            # trim very old IMU (deleteImuMeasurements analog)
            if len(self.imu_t) > 10000:
                del self.imu_t[:2000], self.imu_gyro[:2000], self.imu_acc[:2000]

    def add_depth_measurement(self, t: float, depth: float) -> None:
        if self.first_depth is None:
            self.first_depth = float(depth)
        self.depth_buffer.append((float(t), float(depth)))

    def add_sonar_measurement(self, t: float, range_m: float, heading: float) -> None:
        self.sonar_buffer.append((float(t), float(range_m), float(heading)))

    # IMU slice capacity: slices are padded (mask False) to the next
    # multiple of this so the preintegration scan compiles for a handful of
    # lengths instead of once per distinct sample count
    _IMU_SLICE_QUANTUM = 64

    def _imu_slice(self, t0: float, t1: float):
        with self._imu_mutex:
            t = np.asarray(self.imu_t)
            m = (
                (t >= t0 - TEMPORAL_IMU_OVERLAP)
                & (t <= t1 + TEMPORAL_IMU_OVERLAP)
            )
            idx = np.nonzero(m)[0]
            if len(idx) < 2:
                return None
            n = len(idx)
            cap = -(-n // self._IMU_SLICE_QUANTUM) * self._IMU_SLICE_QUANTUM
            ts = np.full(cap, t[idx[-1]])
            gy = np.zeros((cap, 3))
            ac = np.zeros((cap, 3))
            mask = np.zeros(cap, bool)
            ts[:n] = t[idx]
            gy[:n] = np.stack([self.imu_gyro[i] for i in idx])
            ac[:n] = np.stack([self.imu_acc[i] for i in idx])
            mask[:n] = True
            return ts, gy, ac, mask

    def _preintegrate(self, t0: float, t1: float, bias):
        """Returns a host-numpy Preintegral (or None without IMU data)."""
        sl = self._imu_slice(t0, t1)
        if sl is None:
            return None
        ts, gy, ac, mask = sl
        return _to_np(
            self._preintegrate_fn(
                jnp.asarray(ts, self.dtype), jnp.asarray(gy, self.dtype),
                jnp.asarray(ac, self.dtype), mask,
                jnp.asarray(t0, self.dtype), jnp.asarray(t1, self.dtype),
                jnp.asarray(bias, self.dtype),
            )
        )

    def _T_SC(self, ci: int) -> Transformation:
        """Current camera extrinsics — the window estimate when online
        calibration is active, otherwise the (seeded) config values."""
        return Transformation(
            r=self.window.ext_r[ci], q=self.window.ext_q[ci]
        )

    def _T_WC_np(self, T_WS: Transformation, ci: int):
        """(r, q) of T_WS ∘ T_SC as host numpy."""
        return npq.compose_rq(
            np.asarray(T_WS.r), np.asarray(T_WS.q),
            self.window.ext_r[ci], self.window.ext_q[ci],
        )

    # ------------------------------------------------------------- frontend
    def _detect_describe(
        self, images: List[np.ndarray], T_WS_pred: Transformation,
        extra=None,
    ):
        """Stage 1: preprocess + detect + describe each camera image.

        All same-shape cameras run as ONE batched device program (vmap over
        the camera axis) — the reference's per-camera frameConsumer threads
        (ThreadedKFVio.cpp:421-633) collapse into a single dispatch whose
        convolutions/matmuls batch onto the MXU. Outputs are HOST numpy.

        ``T_WS_pred`` may hold DEVICE arrays (the un-fetched IMU
        propagation output): the gravity directions then compute on-device
        and ``extra`` (any device pytree, e.g. the propagation results) is
        fetched in the SAME transfer as the keypoints — one round trip
        instead of two on tunneled backends. Returns an extra trailing
        element with the fetched ``extra`` when given."""
        if isinstance(T_WS_pred.q, jax.Array):
            # device path: q_WC = q_WS ⊗ q_ext per camera, g = R(q_WC)ᵀ(-z)
            g_C_all = self._gravity_fn(
                T_WS_pred.q, jnp.asarray(self.window.ext_q, self.dtype)
            )
        else:
            # gravity-aligned extraction direction (Frontend.cpp:91-113)
            r_WS = np.asarray(T_WS_pred.r)
            q_WS = np.asarray(T_WS_pred.q)
            g_Cs = []
            for ci in range(len(images)):
                _, q_WC = npq.compose_rq(
                    r_WS, q_WS, self.window.ext_r[ci], self.window.ext_q[ci]
                )
                g_Cs.append(
                    npq.rotate(npq.conjugate(q_WC), np.array([0.0, 0.0, -1.0]))
                )
            g_C_all = np.stack(g_Cs)
        ups = [_as_upload(i) for i in images]
        shapes = {tuple(u.shape) for u in ups}
        if len(images) > 1 and len(shapes) == 1:
            stacked = (
                jnp.stack(ups)
                if all(isinstance(u, jax.Array) for u in ups)
                else jnp.asarray(np.stack(ups))
            )
            out = _frontend_batch(
                stacked,
                jnp.asarray(g_C_all, jnp.float32),
                self._detect_threshold,
                max_keypoints=self.cfg.max_keypoints,
                octaves=self.cfg.detection_octaves,
                histogram_method=self.cfg.histogram_method,
                clahe_clip_limit=self.cfg.clahe_clip_limit,
                resize_factor=self.cfg.resize_factor,
                clahe_tiles=self.cfg.clahe_tiles,
            )
            fetch = out[:5] if extra is None else (out[:5], extra)
            with Timer("2.1.2 detect_fetch"):
                host = _to_np(fetch)
            uv, d, valid, score, octv = host if extra is None else host[0]
            # the processed cam0 image STAYS on device; it transfers only
            # when a keyframe export materializes it (most frames are not
            # keyframes, and on tunneled backends the image dominates the
            # per-frame transfer volume)
            img0 = out[5]
            n = len(images)
            res = (
                [uv[c] for c in range(n)], [d[c] for c in range(n)],
                [valid[c] for c in range(n)], [score[c] for c in range(n)],
                [octv[c] for c in range(n)], img0,
            )
            return res if extra is None else res + (host[1],)
        uvs, descs, valids, scores, octs = [], [], [], [], []
        img0 = None
        outs = []
        for ci, img in enumerate(ups):
            outs.append(_frontend_batch(
                jnp.asarray(img)[None],
                jnp.asarray(g_C_all[ci], jnp.float32)[None],
                self._detect_threshold,
                max_keypoints=self.cfg.max_keypoints,
                octaves=self.cfg.detection_octaves,
                histogram_method=self.cfg.histogram_method,
                clahe_clip_limit=self.cfg.clahe_clip_limit,
                resize_factor=self.cfg.resize_factor,
                clahe_tiles=self.cfg.clahe_tiles,
            ))
        # dispatch all cameras, then one fetch
        fetch = [o[:5] for o in outs]
        host = _to_np(fetch if extra is None else (fetch, extra))
        per_cam = host if extra is None else host[0]
        for ci, (uv, d, valid, score, octv) in enumerate(per_cam):
            uvs.append(uv[0])
            descs.append(d[0])
            valids.append(valid[0])
            scores.append(score[0])
            octs.append(octv[0])
            if ci == 0:
                img0 = outs[0][5]
        res = (uvs, descs, valids, scores, octs, img0)
        return res if extra is None else res + (host[1],)

    def _landmark_descriptors(self):
        """(L, 8) uint32 descriptor per landmark slot (latest observation)."""
        return self._lm_desc

    # --------------------------------------------------------- factor admin
    def _host_obs(self):
        f = self.factors.reproj
        return (
            np.asarray(f.valid), np.asarray(f.state_idx), np.asarray(f.lm_idx)
        )

    def _add_observations(self, rows: List[tuple]):
        """rows: (uv(2,), state_slot, lm_slot, cam_idx, sqrt_info)"""
        if not rows:
            return
        valid, _, _ = self._host_obs()
        free = np.nonzero(~valid)[0]
        n = min(len(rows), len(free))
        if n < len(rows):
            # observation table full: tail factors are dropped (the window
            # still holds the association; the rows re-enter on later
            # frames via match-to-map). Loud, not silent — persistent
            # saturation means num_obs is undersized for the rig.
            _LOG.warning(
                "observation table full: dropping %d of %d new rows "
                "(num_obs=%d)", len(rows) - n, len(rows),
                self.wcfg.num_obs,
            )
            rows = rows[:n]
        idx = free[:n]
        f = self.factors.reproj
        f.uv[idx] = np.stack([r[0] for r in rows])
        f.state_idx[idx] = [r[1] for r in rows]
        f.lm_idx[idx] = [r[2] for r in rows]
        f.cam_idx[idx] = [r[3] for r in rows]
        f.sqrt_info[idx] = [r[4] for r in rows]
        f.valid[idx] = True

    def _allocate_landmarks(
        self, points_W: np.ndarray, descs, covs: np.ndarray = None
    ) -> np.ndarray:
        """Allocate landmark slots; returns slot indices (-1 on overflow).
        ``covs`` (n,3,3) is the creation-time triangulation covariance
        (projected-covariance matching gates use it until the first
        optimize refreshes it from the window Hessian)."""
        free = np.nonzero(~self.window.lm_valid)[0]
        n = min(len(points_W), len(free))
        slots = np.full(len(points_W), -1, np.int32)
        if n == 0:
            return slots
        slots[:n] = free[:n]
        sl = free[:n]
        self.window.hp_W[sl, :3] = points_W[:n]
        self.window.hp_W[sl, 3] = 1.0
        self.window.lm_valid[sl] = True
        self.window.lm_id[sl] = np.arange(
            self.next_lm_id, self.next_lm_id + n, dtype=np.int32
        )
        self._lm_desc[sl] = np.asarray(descs[:n])
        if covs is not None:
            self._lm_cov[sl] = np.asarray(covs[:n])
        else:
            self._lm_cov[sl] = np.eye(3) * self._LM_COV_DEFAULT
        # a reclaimed slot must not inherit the previous landmark's prior
        self.factors.lm_prior.valid[sl] = False
        self.next_lm_id += n
        return slots

    def set_landmark_prior(
        self, slot: int, mean, sigma: float = 0.05
    ) -> None:
        """Anchor a landmark with a Gaussian position prior (the reference's
        HomogeneousPointError) — e.g. a surveyed marker at a known point."""
        lp = self.factors.lm_prior
        lp.mean[slot] = np.asarray(mean, float)
        lp.sqrt_info[slot] = np.eye(3) / float(sigma)
        lp.valid[slot] = True

    # ------------------------------------------------------------ main step
    def add_frame(self, t: float, images: List[np.ndarray]) -> Optional[FrameResult]:
        """Feed one synchronized multi-camera frame (blocking mode).

        The image timestamp is shifted by ``imageDelay`` (camera-vs-IMU
        latency, Subscriber.cpp:154-155: ``t -= imageDelay``) before the
        frame enters the pipeline."""
        t = float(t) - self.cfg.image_delay
        if self.n_states == 0:
            return self._initialize(t, images)

        with Timer("2.0 frame_total"):
            return self._track(t, images)

    # ------------------------------------------------- pipelined backend
    def frontend_stage(self, t: float, images: List[np.ndarray]):
        """Stage 1 of the PIPELINED engine (the frameConsumerLoop analog,
        ThreadedKFVio.cpp:421-633): preprocess + detect + describe, with
        the gravity-aligned extraction direction from a host dead-reckoned
        attitude (the reference likewise detects off the last optimized
        state propagated through the IMU while the optimizer still runs).
        Touches NO mutable engine state — safe to run concurrently with
        ``backend_step`` in another thread. Returns (shifted t, fd)."""
        t = float(t) - self.cfg.image_delay
        T_att = self._attitude_prediction(t)
        uvs, descs, valids, scores, octs, img0 = self._detect_describe(
            images, T_att
        )
        fd = _FrameData(
            timestamp=t, kp_uv=uvs, kp_desc=descs, kp_valid=valids,
            kp_landmark=[
                np.full(self.cfg.max_keypoints, -1, np.int64) for _ in images
            ],
            kp_score=scores,
            kp_octave=[np.asarray(o) for o in octs],
            image0=img0,
        )
        return t, fd

    def _attitude_prediction(self, t: float) -> Transformation:
        """Attitude at ``t`` by integrating buffered gyro from the newest
        window state — degree-level accuracy is plenty for the descriptor
        gravity direction, and it needs no device round trip and no
        backend synchronization."""
        slot = max(self.n_states - 1, 0)
        w = self.window  # local ref: rebinding by the backend is atomic
        r = w.r[slot].copy()
        q = w.q[slot].copy()
        bg = w.speed_bias[slot][3:6].copy()
        t0 = float(w.timestamp[slot])
        with self._imu_mutex:
            tt = np.asarray(self.imu_t)
            sel = np.nonzero((tt > t0) & (tt <= t))[0]
            ts = tt[sel]
            gy = [self.imu_gyro[i] for i in sel]
        t_prev = t0
        for ti, wg in zip(ts, gy):
            dt = float(ti) - t_prev
            if dt <= 0:
                continue
            phi = (wg - bg) * dt
            ang = float(np.linalg.norm(phi))
            half = 0.5 * ang
            fac = 0.5 if ang < 1e-12 else np.sin(half) / ang
            dq = np.concatenate([phi * fac, [np.cos(half)]])
            q = npq.normalize(npq.multiply(q, dq))
            t_prev = float(ti)
        return Transformation(r=r, q=q)

    def backend_step(
        self, t: float, images, fd: _FrameData
    ) -> Optional[FrameResult]:
        """Stages 2–7 for one detected frame in PIPELINED mode.

        The previous frame's optimize(+marginalize) program is still in
        flight on the device; this frame's IMU preintegration, projection-
        gated association, and speculative stereo dispatch BEHIND it —
        chaining the un-fetched post-optimize window (poses, landmark
        table) as their inputs — and ONE blocking ``device_get`` then
        retrieves everything. While the next frame's solve runs, the host
        finalizes THIS fetch's frame (export, callbacks) — the pipelining
        the reference gets from its matching/optimization threads
        (ThreadedKFVio.cpp:167-195), re-expressed as device-program
        chaining + a one-frame-deep result latency.

        Returns the PREVIOUS frame's FrameResult (or None on the first
        pipelined frame); ``backend_flush`` drains the last one."""
        if self.n_states == 0:
            return self._initialize(t, images)
        if self._pending is None and self.n_states >= self.wcfg.num_states:
            # restored/handover sessions only — steady state marginalizes
            # inside the fused program
            self._apply_marginalization_policy()

        p = self._pending
        if p is not None:
            prev_slot = p.slot_post
            t_prev = p.t
            w_dev = p.win_dev
            base_r = w_dev.r[prev_slot]
            base_q = w_dev.q[prev_slot]
            base_sb = w_dev.speed_bias[prev_slot]
            hp_dev, lmv_dev = w_dev.hp_W, w_dev.lm_valid
        else:
            prev_slot = self.n_states - 1
            t_prev = float(self.window.timestamp[prev_slot])
            base_r = self.window.r[prev_slot]
            base_q = self.window.q[prev_slot]
            base_sb = self.window.speed_bias[prev_slot]
            hp_dev = lmv_dev = None

        sl = self._imu_slice(t_prev, t)
        preint_out = None
        if sl is not None:
            ts, gy, ac, mask = sl
            cast = (
                (lambda a: a) if isinstance(base_r, jax.Array)
                else (lambda a: jnp.asarray(a, self.dtype))
            )
            preint_out = self._preint_prop_fn(
                jnp.asarray(ts, self.dtype), jnp.asarray(gy, self.dtype),
                jnp.asarray(ac, self.dtype), mask,
                jnp.asarray(t_prev, self.dtype), jnp.asarray(t, self.dtype),
                cast(base_r), cast(base_q), cast(base_sb),
            )
            _, T_d, _, _ = preint_out
            T_r_m, T_q_m = T_d.r, T_d.q
        else:
            T_r_m, T_q_m = base_r, base_q

        # association + speculative stereo chained behind the in-flight
        # solve (device executes programs in dispatch order)
        m_out = self._dispatch_match(
            fd, T_r_m, T_q_m, hp_W=hp_dev, lm_valid=lmv_dev
        )
        s_out = self._dispatch_stereo(
            fd, T_r_m, T_q_m, hp_W=hp_dev, lm_valid=lmv_dev
        )

        with Timer("2.4.2 match_fetch"):
            opt_f, pre_f, m_f, s_f = jax.device_get(
                (None if p is None else p.opt_out, preint_out, m_out, s_out)
            )
        prev_result = None
        if p is not None:
            prev_result = self._finalize_pending(opt_f)

        # ---- frame k+1 host stages on the now-consistent window ----
        slot = self.n_states
        if pre_f is not None:
            pre, T_h, sb_pred, W_imu = pre_f
            T_pred = Transformation(r=np.array(T_h.r), q=np.array(T_h.q))
            sb_pred = np.array(sb_pred)
        else:
            pre = W_imu = None
            T_pred = Transformation(
                r=np.array(jax.device_get(base_r)),
                q=np.array(jax.device_get(base_q)),
            )
            sb_pred = np.array(jax.device_get(base_sb))
        self._create_state(slot, t, t_prev, T_pred, sb_pred, fd, pre, W_imu)
        n_tracked = self._apply_match(m_f, slot, fd) if m_f is not None else 0
        is_kf, n_new = self._keyframe_decision(slot, t, fd, T_pred, s_f)

        # ---- dispatch this frame's solve; finalize on the NEXT step ----
        n_it = self._iteration_budget()
        victim = (
            self._choose_marg_victim()
            if self.n_states >= self.wcfg.num_states else None
        )
        lm_valid_before = (
            self.window.lm_valid.copy() if victim is not None else None
        )
        prog, bound = self._opt_program_for(n_it, victim is not None)
        with Timer("3.1.1 opt_dispatch"):
            if victim is None:
                opt_out = prog(self.window, self.factors, jnp.int32(n_it))
            else:
                opt_out = prog(
                    self.window, self.factors, jnp.int32(n_it),
                    jnp.int32(victim),
                )
        self._pending = _PendingOpt(
            opt_out=opt_out, win_dev=opt_out[0], victim=victim,
            lm_valid_before=lm_valid_before,
            slot_post=slot - (1 if victim is not None else 0),
            t=t, images=images, is_kf=is_kf, n_tracked=n_tracked,
            n_new=n_new, t_dispatch=time.perf_counter(),
            static_iters=bound,
        )
        return prev_result

    def _finalize_pending(self, opt_f) -> FrameResult:
        """Apply a fetched in-flight optimize and emit its FrameResult."""
        p = self._pending
        self._pending = None
        if p.victim is None:
            win_h, cost_h, iters_h, lm_cov_h, pr_valid, pr_err = opt_f
            fac_h = None
        else:
            (win_h, fac_h, cost_h, iters_h, lm_cov_h, pr_valid,
             pr_err) = opt_f
        self._apply_opt_results(
            win_h, fac_h, cost_h, iters_h, lm_cov_h, pr_valid, pr_err,
            p.victim, p.lm_valid_before,
            time.perf_counter() - p.t_dispatch,
            static_iters=p.static_iters,
        )
        slot = p.slot_post
        self.frame_count += 1
        T_WS = self.window.pose(slot)
        result = FrameResult(
            timestamp=p.t,
            T_WS=Transformation(r=T_WS.r.copy(), q=T_WS.q.copy()),
            speed_bias=self.window.speed_bias[slot].copy(),
            is_keyframe=p.is_kf,
            num_tracked=p.n_tracked,
            num_new_landmarks=p.n_new,
            cost=self._cost_last,
            keyframe_export=(
                self._timed_export(slot, p.images) if p.is_kf else None
            ),
            lm_iterations=self._lm_iterations_last,
        )
        self.trajectory.append((p.t, result.T_WS.r, result.T_WS.q))
        if self.state_callback:
            self.state_callback(result)
        if result.keyframe_export is not None and self.keyframe_callback:
            self.keyframe_callback(result.keyframe_export)
        return result

    def backend_flush(self) -> Optional[FrameResult]:
        """Fetch + finalize the last in-flight frame (end of stream)."""
        if self._pending is None:
            return None
        opt_f = jax.device_get(self._pending.opt_out)
        return self._finalize_pending(opt_f)

    def _iteration_budget(self) -> int:
        """Per-frame LM iteration budget from the config's real-time
        envelope (``ceres_options: timeLimit/minIterations``) and the
        measured per-iteration wall time — the reference's
        CeresIterationCallback re-expressed for a compiled fixed-shape
        solver: iterations past the budget are masked in-program."""
        max_it = self.wcfg.max_iterations
        if self.cfg.time_limit <= 0 or self._opt_iter_ema is None:
            return max_it
        fit = int(self.cfg.time_limit / max(self._opt_iter_ema, 1e-9))
        return int(np.clip(fit, max(1, self.cfg.min_iterations), max_it))

    # The per-keypoint sqrt information: reference scales by keypoint size
    # (64/size²); sigma = 1 px at octave 0, doubling per octave.
    _KP_SQRT_INFO = 1.0

    def _kp_info(self, fd: "_FrameData", ci: int, k: int) -> float:
        return self._KP_SQRT_INFO / float(1 << int(fd.kp_octave[ci][k]))

    # per-keypoint ray angular sigma (raySigma of
    # VioKeyframeWindowMatchingAlgorithm.cpp:208-212:
    # sqrt(sqrt(2)) · (0.8·kpSize/12) / f, kpSize = 12·2^octave)
    _RAY_SIGMA_BASE = (2.0 ** 0.25) * 0.8
    # fallback landmark position variance [m²] before any covariance is
    # known (wide: ~0.5 m std)
    _LM_COV_DEFAULT = 0.25

    # relative-pose translation variance for triangulation covariance
    # (UOplus of VioKeyframeWindowMatchingAlgorithm::doSetup:133-141)
    _POSE_VAR_STEREO = 4e-8  # within one multiframe

    def _pose_var_temporal(self, slot: int) -> float:
        v = float(np.linalg.norm(self.window.speed_bias[slot][:3]))
        return 1e-2 * max(1.0, v) ** 2

    def _initialize(self, t: float, images: List[np.ndarray]) -> Optional[FrameResult]:
        if len(self.imu_t) < 3:
            return None  # wait for IMU (ImuFrameSynchronizer analog)
        self._lm_desc = np.zeros((self.wcfg.num_landmarks, 8), np.uint32)
        self._lm_cov = np.tile(
            np.eye(3) * self._LM_COV_DEFAULT,
            (self.wcfg.num_landmarks, 1, 1),
        )
        acc_mean = jnp.asarray(np.mean(self.imu_acc[-20:], axis=0), self.dtype)
        T0_h = jax.device_get(init_pose_from_imu(acc_mean))
        T0 = Transformation(r=np.array(T0_h.r), q=np.array(T0_h.q))
        slot = 0
        w = self.window
        w.r[slot] = T0.r
        w.q[slot] = T0.q
        w.speed_bias[slot] = 0.0
        w.state_valid[slot] = True
        w.is_keyframe[slot] = True
        w.timestamp[slot] = t
        w.state_id[slot] = self.next_state_id
        self.next_state_id += 1
        # gauge priors (reference: first-pose information 1e8, sb prior)
        pr = self.factors.priors
        sbi = np.diag(
            np.concatenate([
                np.full(3, 10.0),
                np.full(3, 1.0 / self.cfg.imu.sigma_bg),
                np.full(3, 1.0 / self.cfg.imu.sigma_ba),
            ])
        )
        # gauge prior: strong on position + yaw (the unobservable directions),
        # weak on roll/pitch (gravity-observable — a hard prior would pin any
        # initialization error from non-static starts)
        pose_si = np.diag([1e4, 1e4, 1e4, 5.0, 5.0, 1e4])
        pr.pose_mean_r[slot] = T0.r
        pr.pose_mean_q[slot] = T0.q
        pr.pose_sqrt_info[slot] = pose_si
        pr.pose_valid[slot] = True
        pr.sb_mean[slot] = 0.0
        pr.sb_sqrt_info[slot] = sbi
        pr.sb_valid[slot] = True
        self._attach_depth_factor(slot, t)

        uvs, descs, valids, scores, octs, img0 = self._detect_describe(images, T0)
        fd = _FrameData(
            timestamp=t, kp_uv=uvs, kp_desc=descs, kp_valid=valids,
            kp_landmark=[np.full(self.cfg.max_keypoints, -1, np.int64) for _ in images],
            kp_score=scores,
            kp_octave=[np.asarray(o) for o in octs],
            image0=img0,
        )
        self.frames[slot] = fd
        n_new = self._stereo_initialize_landmarks(slot, fd, T0)
        self.n_states = 1
        self.last_kf_slot = slot
        self.frame_count += 1
        self.kf_count += 1
        self._kf_index_by_state_id[int(self.window.state_id[slot])] = (
            self.kf_count
        )
        res = FrameResult(
            timestamp=t, T_WS=T0,
            speed_bias=np.zeros(9), is_keyframe=True,
            num_tracked=0, num_new_landmarks=n_new, cost=0.0,
        )
        self.trajectory.append((t, np.asarray(T0.r), np.asarray(T0.q)))
        if self.state_callback:
            self.state_callback(res)
        return res

    def _attach_depth_factor(self, slot: int, t: float):
        if not self.cfg.is_depth_used or not self.depth_buffer:
            return
        # mean of depth measurements near the state time (Estimator.cpp:248-262)
        near = [d for (td, d) in self.depth_buffer if abs(td - t) < 0.6]
        if not near:
            return
        dep = self.factors.depth
        dep.depth[slot] = float(np.mean(near))
        dep.first_depth[...] = self.first_depth or 0.0
        dep.valid[slot] = True

    def _attach_sonar_factor(self, slot: int, t: float, T_WS: Transformation):
        if not self.cfg.is_sonar_used or not self.sonar_buffer:
            return
        near = [s for s in self.sonar_buffer if abs(s[0] - t) < 0.2]
        if not near:
            return
        _, rng, heading = near[-1]
        # beam point in world: T_WS * T_SSo * (r cosθ, r sinθ, 0) — host math
        M = np.asarray(self.cfg.T_SSo, float)
        p_So = np.asarray([rng * np.cos(heading), rng * np.sin(heading), 0.0])
        p_S = M[:3, :3] @ p_So + M[:3, 3]
        beam_W = npq.rotate(np.asarray(T_WS.q), p_S) + np.asarray(T_WS.r)
        # landmark subset within ±0.1 m box of the beam point
        lms = self.window.hp_W[:, :3]
        ok = self.window.lm_valid & (np.all(np.abs(lms - beam_W) < 0.1, axis=1))
        if ok.sum() == 0:
            return
        target = lms[ok].mean(axis=0)
        so = self.factors.sonar
        so.range[slot] = float(rng)
        so.target_W[slot] = target
        so.valid[slot] = True

    def _dispatch_stereo(
        self, fd: _FrameData, T_r, T_q, hp_W=None, lm_valid=None,
    ):
        """Dispatch the fused stereo match+triangulate program. ``T_r/T_q``
        may be device handles (un-fetched IMU prediction); ``hp_W``/
        ``lm_valid`` likewise (un-fetched optimize output) — defaults are
        the host window tables. The candidate masks are the RAW detection
        masks: this dispatch is SPECULATIVE (before the frame's map
        associations are known); ``_apply_stereo`` drops pairs that the
        match stage associated in the meantime, and the in-program map
        dedup kills near-duplicates of existing landmarks."""
        if self.rig.num_cameras < 2:
            return None
        if (0, 1) not in self._stereo_fns:
            self._stereo_fns[(0, 1)] = _make_stereo_match_tri(
                self.rig.cameras[0], self.rig.cameras[1],
                self._RAY_SIGMA_BASE, self._POSE_VAR_STEREO,
            )
        un_a = fd.kp_landmark[0] < 0
        un_b = fd.kp_landmark[1] < 0
        if hp_W is None:
            hp_W = jnp.asarray(self.window.hp_W, self.dtype)
        if lm_valid is None:
            lm_valid = self.window.lm_valid
        cast = (
            (lambda a: a) if isinstance(T_r, jax.Array)
            else (lambda a: jnp.asarray(a, self.dtype))
        )
        return self._stereo_fns[(0, 1)](
            fd.kp_desc[0], fd.kp_desc[1],
            fd.kp_valid[0] & un_a, fd.kp_valid[1] & un_b,
            jnp.asarray(fd.kp_uv[0], self.dtype),
            jnp.asarray(fd.kp_uv[1], self.dtype),
            fd.kp_octave[0], fd.kp_octave[1],
            cast(T_r), cast(T_q),
            jnp.asarray(self.window.ext_r[0], self.dtype),
            jnp.asarray(self.window.ext_q[0], self.dtype),
            jnp.asarray(self.window.ext_r[1], self.dtype),
            jnp.asarray(self.window.ext_q[1], self.dtype),
            hp_W, lm_valid,
        )

    def _apply_stereo(self, fetched, slot: int, fd: _FrameData) -> int:
        """Allocate landmarks + observations from a fetched stereo dispatch
        (host side of Frontend::matchStereo)."""
        if fetched is None:
            return 0
        ib_all, pts_all, good, cov_all = fetched
        ia = np.nonzero(good)[0]
        if len(ia) == 0:
            return 0
        # drop pairs associated to the map since the (speculative) dispatch
        keep = (fd.kp_landmark[0][ia] < 0) & (fd.kp_landmark[1][ib_all[ia]] < 0)
        ia = ia[keep]
        if len(ia) == 0:
            return 0
        ib = ib_all[ia]
        pts = pts_all[ia]
        cov = cov_all[ia]
        slots = self._allocate_landmarks(pts, fd.kp_desc[0][ia], cov)
        rows = []
        for k, (a, b_) in enumerate(zip(ia, ib)):
            if slots[k] < 0:
                continue
            fd.kp_landmark[0][a] = slots[k]
            fd.kp_landmark[1][b_] = slots[k]
            rows.append((fd.kp_uv[0][a], slot, slots[k], 0,
                         self._kp_info(fd, 0, a)))
            rows.append((fd.kp_uv[1][b_], slot, slots[k], 1,
                         self._kp_info(fd, 1, b_)))
        self._add_observations(rows)
        return int((slots >= 0).sum())

    def _stereo_initialize_landmarks(
        self, slot: int, fd: _FrameData, T_WS: Transformation
    ) -> int:
        """Stereo intra-frame matching + triangulation → new landmarks
        (Frontend::matchStereo analog): standalone dispatch+fetch."""
        out = self._dispatch_stereo(
            fd, np.asarray(T_WS.r), np.asarray(T_WS.q)
        )
        if out is None:
            return 0
        return self._apply_stereo(jax.device_get(out), slot, fd)

    def _temporal_initialize_landmarks(
        self, slot: int, fd: _FrameData, T_WS: Transformation
    ) -> int:
        """2D-2D matching to the LAST KEYFRAME + two-view triangulation →
        new landmarks (the reference's temporal landmark bootstrap:
        Frontend::matchToKeyframes / matchToLastFrame 2D-2D paths,
        Frontend.cpp:336-465, where untracked keypoints are matched across
        time and triangulated against the pose prior). This is the only
        landmark source for MONO rigs and adds temporal-baseline landmarks
        (useful at long range) for stereo rigs."""
        prev_slot = self.last_kf_slot
        if prev_slot is None or prev_slot == slot or prev_slot not in self.frames:
            return 0
        fd_prev = self.frames[prev_slot]
        T_prev = self.window.pose(prev_slot)
        # minimum-baseline gate: with no baseline every correct match has
        # zero parallax, so the angle gate below would invert the selection
        # and keep only MISmatches — defer until the platform has moved
        baseline = float(np.linalg.norm(np.asarray(T_WS.r) - np.asarray(T_prev.r)))
        if baseline < 0.02:
            return 0
        total = 0
        rows = []
        diag = float(
            np.hypot(self.rig.cameras[0].width, self.rig.cameras[0].height)
        )
        # dispatch the whole per-camera bootstrap (flow-gated match +
        # triangulation + rotation-only/relative RANSAC disambiguation +
        # all geometric gates + map dedup) as ONE device program per
        # camera, then ONE fetch for all cameras
        pending = []
        for ci in range(min(self.rig.num_cameras, len(fd_prev.kp_uv))):
            if ci not in self._temporal_fns:
                self._temporal_fns[ci] = _make_temporal_match_tri(
                    self.rig.cameras[ci], self._RAY_SIGMA_BASE, diag
                )
            rA, qA = self._T_WC_np(T_WS, ci)
            rB, qB = self._T_WC_np(T_prev, ci)
            kk = jax.random.PRNGKey(self._rng.randint(0, 2**31))
            k1, k2 = jax.random.split(kk)
            pending.append((ci, rA, self._temporal_fns[ci](
                k1, k2, fd.kp_desc[ci], fd_prev.kp_desc[ci],
                fd.kp_valid[ci] & (fd.kp_landmark[ci] < 0),
                fd_prev.kp_valid[ci] & (fd_prev.kp_landmark[ci] < 0),
                jnp.asarray(fd.kp_uv[ci], self.dtype),
                jnp.asarray(fd_prev.kp_uv[ci], self.dtype),
                fd.kp_octave[ci], fd_prev.kp_octave[ci],
                jnp.asarray(rA, self.dtype), jnp.asarray(qA, self.dtype),
                jnp.asarray(rB, self.dtype), jnp.asarray(qB, self.dtype),
                jnp.asarray(self._pose_var_temporal(slot), self.dtype),
                jnp.asarray(self.window.hp_W, self.dtype),
                self.window.lm_valid,
            )))
        fetched = jax.device_get([p[2] for p in pending])
        for (ci, rA, _), (ib_all, pts_all, good, cov_all, rot_only) in zip(
            pending, fetched
        ):
            if bool(rot_only):
                # rotationOnly (Frontend.cpp:893): the epipolar t is
                # ill-determined; the parallax gate blocks garbage
                # triangulation and the event feeds the health story
                self.rotation_only_detections += 1
            ia = np.nonzero(good)[0]
            if len(ia) == 0:
                continue
            ib = ib_all[ia]
            pts = pts_all[ia]
            cov = cov_all[ia]
            slots = self._allocate_landmarks(pts, fd.kp_desc[ci][ia], cov)
            for k, (a, b_) in enumerate(zip(ia, ib)):
                if slots[k] < 0:
                    continue
                fd.kp_landmark[ci][a] = slots[k]
                fd_prev.kp_landmark[ci][b_] = slots[k]
                rows.append((fd.kp_uv[ci][a], slot, slots[k], ci,
                             self._kp_info(fd, ci, a)))
                rows.append((fd_prev.kp_uv[ci][b_], prev_slot,
                             slots[k], ci, self._kp_info(fd_prev, ci, b_)))
                total += 1
        self._add_observations(rows)
        return total

    def _dispatch_match(
        self, fd: _FrameData, T_r, T_q,
        hp_W=None, lm_valid=None, lm_cov=None,
    ):
        """Dispatch the fused association stage (projection-gated matching
        + 3D-2D RANSAC + reprojection acceptance — one device program,
        VioKeyframeWindowMatchingAlgorithm::doSetup + runRansac3d2d).

        ``T_r/T_q`` (predicted pose) and ``hp_W/lm_valid/lm_cov`` (landmark
        tables) may be DEVICE handles — un-fetched outputs of the IMU
        propagation and of the previous frame's optimize program — so the
        pipelined backend chains frame k+1's association behind frame k's
        solve without a host round trip in between.

        Uncertainty-propagated gating (the reference's velocity-scaled
        UOplus + projected landmark covariance,
        VioKeyframeWindowMatchingAlgorithm::doSetup:133-206): the pose
        translation variance is velocity-scaled and inflated by the
        tracking-miss streak, and each landmark contributes its own 3×3
        covariance."""
        slot_prev = self.last_kf_slot if self.last_kf_slot is not None else 0
        pos_var = self._pose_var_temporal(slot_prev) * (
            4.0 ** min(self._track_miss_streak, 2)
        )
        kp_sigma = 0.8 * np.stack(
            [np.ldexp(1.0, fd.kp_octave[ci]) for ci in range(len(fd.kp_uv))]
        )
        free = np.stack(
            [fd.kp_landmark[ci] < 0 for ci in range(len(fd.kp_uv))]
        )
        cast = (
            (lambda a: a) if isinstance(T_r, jax.Array)
            else (lambda a: jnp.asarray(np.asarray(a), self.dtype))
        )
        with Timer("2.4.1 match_dispatch"):
            return self._match_stage_fn(
                np.stack(fd.kp_uv), np.stack(fd.kp_desc),
                np.stack(fd.kp_valid), free,
                self.window.hp_W if hp_W is None else hp_W,
                self.window.lm_valid if lm_valid is None else lm_valid,
                self._lm_desc,
                (
                    jnp.asarray(self._lm_cov, self.dtype)
                    if lm_cov is None else lm_cov
                ),
                cast(T_r), cast(T_q),
                jnp.asarray(self.window.ext_r, self.dtype),
                jnp.asarray(self.window.ext_q, self.dtype),
                jnp.asarray(kp_sigma, self.dtype),
                jnp.asarray(pos_var, self.dtype),
                jax.random.PRNGKey(self._rng.randint(0, 2**31)),
            )

    def _apply_match(self, fetched, slot: int, fd: _FrameData) -> int:
        """Host side of the association stage: landmark bookkeeping +
        observation-row insertion from the fetched match outputs."""
        accept, midx, n_cand, success, fit_r, fit_q = fetched
        if int(n_cand) < 6:
            self._track_miss_streak += 1
            return 0
        self._last_ransac_T_WS = (
            Transformation(r=np.array(fit_r), q=np.array(fit_q))
            if bool(success) else None
        )
        n_tracked = 0
        rows = []
        refresh_l, refresh_d = [], []
        for ci in range(self.rig.num_cameras):
            for k in np.nonzero(accept[ci])[0]:
                l = int(midx[ci][k])
                fd.kp_landmark[ci][k] = l
                rows.append((
                    fd.kp_uv[ci][k], slot, l, ci, self._kp_info(fd, ci, k)
                ))
                refresh_l.append(l)
                refresh_d.append(fd.kp_desc[ci][k])
                n_tracked += 1
        if refresh_l:
            self._lm_desc[refresh_l] = np.stack(refresh_d)
        self._add_observations(rows)
        self._track_miss_streak = 0 if n_tracked >= 6 else self._track_miss_streak + 1
        return n_tracked

    def _match_to_map(
        self, slot: int, fd: _FrameData, T_WS_pred: Transformation
    ) -> int:
        """Standalone dispatch+fetch association (the serial engine path)."""
        if self.window.lm_valid.sum() == 0:
            return 0
        out = self._dispatch_match(fd, T_WS_pred.r, T_WS_pred.q)
        with Timer("2.4.2 match_fetch"):
            fetched = jax.device_get(out)
        return self._apply_match(fetched, slot, fd)

    def _decay_extrinsics_prior(self, dt: float) -> None:
        """Extrinsics random walk (reference sigma_c_relative_*: per-state
        T_SC blocks chained by RelativePoseError, Estimator.cpp:384-404).
        On the shared block the chain's marginal is a prior re-centered at
        the running estimate whose covariance grows by Q·dt each frame."""
        st = self.cfg.sigma_c_relative_translation
        so = self.cfg.sigma_c_relative_orientation
        if not self.wcfg.estimate_extrinsics or st < 1e-12 or so < 1e-12:
            return
        dt = max(float(dt), 1e-6)
        Q = np.diag([st * st * dt] * 3 + [so * so * dt] * 3)
        ep = self.factors.ext_prior
        S = ep.sqrt_info  # (C,6,6)
        for c in range(S.shape[0]):
            info = S[c].T @ S[c]
            P = np.linalg.inv(info + 1e-12 * np.eye(6)) + Q
            info_new = np.linalg.inv(P)
            S[c] = np.linalg.cholesky(info_new).T
        ep.mean_r[:] = self.window.ext_r
        ep.mean_q[:] = self.window.ext_q

    def _accumulate_scale_state(self, t: float) -> None:
        """One-shot scale refinement over the first keyframes
        (Frontend.cpp:510-588): accumulate the RANSAC vision pose + the IMU
        preintegral bridging from the previously accumulated keyframe; a
        small linear alignment solves for velocities/gravity/scale and the
        result is logged as a diagnostic (the reference prints it)."""
        sr = self.scale_refiner
        if sr.refined or self._last_ransac_T_WS is None:
            return
        T = self._last_ransac_T_WS
        C_WS = npq.to_rotation_matrix(np.asarray(T.q))
        p_C = self._T_WC_np(T, 0)[0]
        if not sr.C_WS:  # first accumulated state
            sr.add_state(C_WS, p_C)
            self._scale_last_t = t
            return
        slot = self.n_states - 1
        pre = self._preintegrate(
            self._scale_last_t, t, self.window.speed_bias[slot][3:9]
        )
        if pre is None:
            return
        sr.add_state(
            C_WS, p_C,
            delta_p=np.asarray(pre.acc_doubleintegral),
            delta_v=np.asarray(pre.acc_integral),
            dt=float(pre.Delta_t),
        )
        self._scale_last_t = t
        if sr.refined:
            est = sr.result
            _LOG.info(
                "scale refinement: s=%.4f |g|=%.3f over %d keyframes",
                est.scale, est.gravity_norm, est.n_states,
            )

    def _keyframe_decision(
        self, slot: int, t: float, fd: _FrameData,
        T_pred: Transformation, s_f,
    ):
        """Hull-overlap keyframe decision + (on keyframes) new-landmark
        creation from the speculatively fetched stereo candidates, with the
        temporal 2D-2D bootstrap fallback (the only landmark source for
        mono rigs; for stereo it adds long-baseline landmarks when the
        stereo pass left keypoints unassociated)."""
        is_kf = self._need_new_keyframe(fd)
        n_new = 0
        if is_kf:
            with Timer("2.5 stereo_init"):
                n_new = self._apply_stereo(s_f, slot, fd)
            if self.rig.num_cameras < 2 or n_new == 0:
                with Timer("2.6 temporal_init"):
                    n_new += self._temporal_initialize_landmarks(
                        slot, fd, T_pred
                    )
            self.window.is_keyframe[slot] = True
            self.last_kf_slot = slot
            self.kf_count += 1
            self._kf_index_by_state_id[int(self.window.state_id[slot])] = (
                self.kf_count
            )
            self._accumulate_scale_state(t)
        return is_kf, n_new

    def _create_state(
        self, slot: int, t: float, t_prev: float,
        T_pred: Transformation, sb_pred, fd: _FrameData, pre, W_imu,
    ) -> None:
        """New window state at the IMU-predicted pose + its factors
        (Estimator::addStates analog: pose/speed-bias blocks, the bridging
        ImuError, SVIn depth/sonar factors, extrinsics random walk)."""
        w = self.window
        w.r[slot] = np.asarray(T_pred.r)
        w.q[slot] = np.asarray(T_pred.q)
        w.speed_bias[slot] = sb_pred
        w.state_valid[slot] = True
        w.timestamp[slot] = t
        w.state_id[slot] = self.next_state_id
        w.is_keyframe[slot] = False
        self.next_state_id += 1
        self.frames[slot] = fd
        self.n_states += 1

        # IMU factor prev_slot -> slot
        if pre is not None:
            imf = self.factors.imu
            k = slot - 1
            for full, new in zip(
                jax.tree_util.tree_leaves(imf.pre),
                jax.tree_util.tree_leaves(pre),
            ):
                full[k] = new
            imf.sqrt_info[k] = W_imu
            # guard against degenerate preintegrals (IMU dropout /
            # non-positive segment): a zero-Δt factor has no information
            imf.valid[k] = float(np.asarray(pre.Delta_t)) > 0.0

        self._attach_depth_factor(slot, t)
        self._attach_sonar_factor(slot, t, T_pred)
        self._decay_extrinsics_prior(t - t_prev)

    def _need_new_keyframe(self, fd: _FrameData) -> bool:
        """Convex-hull overlap/matching-ratio heuristic, exact reference
        semantics (Frontend::doWeNeedANewKeyframe, Frontend.cpp:265-332):
        per camera, overlap = area(hull of matched kps) / area(hull of all
        kps) and ratio = n_matched / #kps strictly inside the matched hull;
        max over cameras; keep the frame a non-keyframe only when
        overlap > 0.6 and ratio > 0.2 (defaults Frontend.cpp:81-82)."""
        if self.last_kf_slot is None:
            return True
        all_uv, matched_uv = [], []
        for ci in range(self.rig.num_cameras):
            v = np.asarray(fd.kp_valid[ci])
            uv = np.asarray(fd.kp_uv[ci])[v]
            m = (np.asarray(fd.kp_landmark[ci]) >= 0)[v]
            all_uv.append(uv)
            matched_uv.append(uv[m])
        overlap, ratio = keyframe_overlap_ratio(all_uv, matched_uv)
        return not (overlap > 0.6 and ratio > 0.2)

    def _track(self, t: float, images: List[np.ndarray]) -> FrameResult:
        # ---- 2. IMU propagation for prediction ----
        prev_slot = self.n_states - 1
        t_prev = float(self.window.timestamp[prev_slot])
        sb_prev = self.window.speed_bias[prev_slot]
        T_prev = self.window.pose(prev_slot)
        sl = self._imu_slice(t_prev, t)
        pre = None
        W_imu = None
        if sl is not None:
            ts, gy, ac, mask = sl
            pre_d, T_d, sb_d, W_d = self._preint_prop_fn(
                jnp.asarray(ts, self.dtype), jnp.asarray(gy, self.dtype),
                jnp.asarray(ac, self.dtype), mask,
                jnp.asarray(t_prev, self.dtype), jnp.asarray(t, self.dtype),
                jnp.asarray(T_prev.r, self.dtype),
                jnp.asarray(T_prev.q, self.dtype),
                jnp.asarray(sb_prev, self.dtype),
            )
            # do NOT fetch yet: detection consumes the device-side attitude
            # (gravity dirs computed on-device) and the propagation results
            # ride the keypoint fetch — one round trip instead of two
            with Timer("2.1 detect_describe"):
                (uvs, descs, valids, scores, octs, img0,
                 (pre, T_h, sb_pred, W_imu)) = self._detect_describe(
                    images, Transformation(r=T_d.r, q=T_d.q),
                    extra=(pre_d, T_d, sb_d, W_d),
                )
            T_pred = Transformation(r=np.array(T_h.r), q=np.array(T_h.q))
            sb_pred = np.array(sb_pred)
        else:
            T_pred, sb_pred = T_prev, sb_prev
            # ---- 1. detection/description at predicted attitude ----
            with Timer("2.1 detect_describe"):
                uvs, descs, valids, scores, octs, img0 = (
                    self._detect_describe(images, T_pred)
                )
        fd = _FrameData(
            timestamp=t, kp_uv=uvs, kp_desc=descs, kp_valid=valids,
            kp_landmark=[np.full(self.cfg.max_keypoints, -1, np.int64) for _ in images],
            kp_score=scores,
            kp_octave=[np.asarray(o) for o in octs],
            image0=img0,
        )

        # ---- marginalization BEFORE adding if window is full ----
        if self.n_states >= self.wcfg.num_states:
            with Timer("2.2 marginalization"):
                self._apply_marginalization_policy()
        slot = self.n_states

        # ---- state creation ----
        self._create_state(slot, t, t_prev, T_pred, sb_pred, fd, pre, W_imu)

        # ---- 3. data association + SPECULATIVE stereo, ONE fetch ----
        # the stereo match+triangulate program runs every frame (its
        # device cost is a few ms) so that on keyframes the new-landmark
        # candidates are already in hand — the separate keyframe-only
        # stereo round trip is gone; _apply_stereo drops pairs the match
        # stage claimed
        with Timer("2.4 matching"):
            m_out = (
                self._dispatch_match(fd, T_pred.r, T_pred.q)
                if self.window.lm_valid.sum() > 0 else None
            )
            s_out = self._dispatch_stereo(
                fd, np.asarray(T_pred.r), np.asarray(T_pred.q)
            )
            with Timer("2.4.2 match_fetch"):
                m_f, s_f = jax.device_get((m_out, s_out))
            n_tracked = (
                self._apply_match(m_f, slot, fd) if m_f is not None else 0
            )
        is_kf, n_new = self._keyframe_decision(slot, t, fd, T_pred, s_f)

        # ---- 6. optimize (+ fused marginalization in steady state) ----
        n_it = self._iteration_budget()
        victim = (
            self._choose_marg_victim()
            if self.n_states >= self.wcfg.num_states
            else None
        )
        prog, bound = self._opt_program_for(n_it, victim is not None)
        with Timer("3.1 optimization"):
            t_opt0 = time.perf_counter()
            if victim is None:
                with Timer("3.1.1 opt_dispatch"):
                    opt_out = prog(
                        self.window, self.factors, jnp.int32(n_it)
                    )
                with Timer("3.1.2 opt_fetch"):
                    win_h, cost_h, iters_h, lm_cov_h, pr_valid, pr_err = (
                        jax.device_get(opt_out)
                    )
                fac_h = None
            else:
                lm_valid_before = self.window.lm_valid.copy()
                with Timer("3.1.1 opt_dispatch"):
                    opt_out = prog(
                        self.window, self.factors, jnp.int32(n_it),
                        jnp.int32(victim),
                    )
                with Timer("3.1.2 opt_fetch"):
                    (win_h, fac_h, cost_h, iters_h, lm_cov_h, pr_valid,
                     pr_err) = jax.device_get(opt_out)
            dt_opt = time.perf_counter() - t_opt0
        self._apply_opt_results(
            win_h, fac_h, cost_h, iters_h, lm_cov_h, pr_valid, pr_err,
            victim, lm_valid_before if victim is not None else None, dt_opt,
            static_iters=bound,
        )
        if victim is not None:
            slot -= 1  # the newest slot shifted down by one

        self.frame_count += 1
        T_WS = self.window.pose(slot)
        result = FrameResult(
            timestamp=t,
            T_WS=Transformation(
                r=T_WS.r.copy(), q=T_WS.q.copy()
            ),
            speed_bias=self.window.speed_bias[slot].copy(),
            is_keyframe=is_kf,
            num_tracked=n_tracked,
            num_new_landmarks=n_new,
            cost=self._cost_last,
            keyframe_export=(
                self._timed_export(slot, images) if is_kf else None
            ),
            lm_iterations=self._lm_iterations_last,
        )
        self.trajectory.append((t, result.T_WS.r, result.T_WS.q))
        if self.state_callback:
            self.state_callback(result)
        if result.keyframe_export is not None and self.keyframe_callback:
            self.keyframe_callback(result.keyframe_export)
        return result

    _PRUNE_PX = 3.0

    def _apply_opt_results(
        self, win_h, fac_h, cost_h, iters_h, lm_cov_h, pr_valid, pr_err,
        victim, lm_valid_before, dt_opt, static_iters: int = 0,
    ) -> None:
        """Host side of a fetched optimize(+marginalize) program: window/
        factor writeback, iteration-budget EMA, landmark-covariance refresh,
        observation pruning, marginalization bookkeeping.

        The per-iteration EMA: the compiled program always executes
        max_iterations of FLOPs (masked past the budget), so
        wall / max_iterations is the honest per-iteration cost (slightly
        conservative on fused frames, which also pay the marginalization
        compute). The very first call is compile-dominated — skip it, and
        reject >10x outliers (host hiccups) once an estimate exists."""
        per_it = dt_opt / max(static_iters or self.wcfg.max_iterations, 1)
        if self._opt_calls > 0 and (
            self._opt_iter_ema is None or per_it < 10.0 * self._opt_iter_ema
        ):
            self._opt_iter_ema = (
                per_it if self._opt_iter_ema is None
                else 0.8 * self._opt_iter_ema + 0.2 * per_it
            )
        self._opt_calls += 1
        self.window = jax.tree_util.tree_map(np.array, win_h)
        if fac_h is not None:
            self.factors = jax.tree_util.tree_map(np.array, fac_h)
        self._cost_last = float(cost_h)
        self._lm_iterations_last = int(iters_h)
        # refresh landmark covariances (pose-conditioned inv(Hll)) for the
        # projected-covariance matching gate; landmarks without enough
        # observations keep their creation-time triangulation covariance
        lv = self.window.lm_valid & (self.window.lm_quality > 1e-6)
        if lv.any():
            self._lm_cov[lv] = np.asarray(lm_cov_h)[lv]
        bad = pr_valid & (pr_err > self._PRUNE_PX)
        if bad.any():
            self.factors.reproj.valid[bad] = False
        if victim is not None:
            # host bookkeeping for the fused marginalization (the device
            # shift already happened inside the program)
            self._post_marginalize_bookkeeping(victim, lm_valid_before)

    # --------------------------------------------------- marginalization
    def _choose_marg_victim(self) -> int:
        """RSS'13 policy (Estimator::applyMarginalizationStrategy analog):
        keep the newest numImuFrames; if the oldest of those is not a
        keyframe, drop it; otherwise drop the oldest keyframe slot. Never
        the newest slot: the incoming frame's IMU factor and pose
        prediction chain from it (the reference marginalizes after state
        creation, so the current frame is likewise never a victim)."""
        S = self.wcfg.num_states
        is_kf = self.window.is_keyframe
        recent_start = S - self.cfg.num_imu_frames
        for s in range(recent_start, S - 1):
            if not is_kf[s]:
                return s
        return 0  # oldest keyframe

    def _apply_marginalization_policy(self):
        self._marginalize(self._choose_marg_victim())

    def _marginalize(self, slot: int):
        lm_valid_before = self.window.lm_valid.copy()
        with Timer("2.2.1 marg_dispatch"):
            w_d, f_d = self._marginalize_fn(
                self.window, self.factors, jnp.int32(slot)
            )
        with Timer("2.2.2 marg_fetch"):
            self.window = _to_np(w_d)
            self.factors = _to_np(f_d)
        self._post_marginalize_bookkeeping(slot, lm_valid_before)

    def _post_marginalize_bookkeeping(
        self, slot: int, lm_valid_before: np.ndarray
    ) -> None:
        """Host-side record shift after a device marginalization (standalone
        or fused into the optimize program)."""
        # scrub frame records referencing landmark slots freed above —
        # a freed slot is reused by _allocate_landmarks, and a stale
        # kp_landmark would export the unrelated new landmark's 3D point
        # through the keyframe ABI and block re-association
        freed = lm_valid_before & ~self.window.lm_valid
        if freed.any():
            freed_slots = np.nonzero(freed)[0]
            for fdta in self.frames.values():
                for kl in fdta.kp_landmark:
                    kl[np.isin(kl, freed_slots)] = -1
        # host bookkeeping shift
        new_frames = {}
        for s, fdta in self.frames.items():
            if s == slot:
                continue
            new_frames[s - 1 if s > slot else s] = fdta
        self.frames = new_frames
        if self.last_kf_slot is not None:
            if self.last_kf_slot == slot:
                self.last_kf_slot = None
            elif self.last_kf_slot > slot:
                self.last_kf_slot -= 1
        self.n_states -= 1

    # --------------------------------------------------------- kf export
    def _timed_export(self, slot: int, images) -> dict:
        with Timer("3.2 kf_export"):
            return self._export_keyframe(slot, images)

    def _export_keyframe(self, slot: int, images) -> dict:
        """Keyframe payload for the loop-closure module — preserves the
        reference's inter-process ABI (ThreadedKFVio.cpp:1147-1247 →
        pose_graph Subscriber.cpp:116-193): left image, T_WC, per-point
        [3D point, landmark id, pose id, keypoint uv, quality], covisible
        keyframe indices, and health fields."""
        fd = self.frames[slot]
        T_WS = self.window.pose(slot)
        r_WC, q_WC = self._T_WC_np(T_WS, 0)
        T_WC = Transformation(r=r_WC, q=q_WC)
        kp_lm = fd.kp_landmark[0]
        sel = np.nonzero(kp_lm >= 0)[0]
        lm_slots = kp_lm[sel]
        pts = self.window.hp_W[lm_slots, :3]
        qual = self.window.lm_quality[lm_slots]
        lm_ids = self.window.lm_id[lm_slots]
        # per-quadrant counts — host numpy (SvinHealth analog)
        W_, H_ = self.rig.cameras[0].width, self.rig.cameras[0].height
        v = fd.kp_valid[0]
        qx = (fd.kp_uv[0][:, 0] >= W_ / 2).astype(int)
        qy = (fd.kp_uv[0][:, 1] >= H_ / 2).astype(int)
        q = np.bincount((qy * 2 + qx)[v], minlength=4)[:4]
        # per-point covisibility: for each exported landmark, the EXPORT
        # keyframe indices of other window keyframes observing it (the
        # reference ships exactly this as per-point channel lists,
        # ThreadedKFVio.cpp:1147-1247 → pose_graph builds KFcounter from
        # them, LoopClosure.cpp:103-114). Plus the per-keyframe summary
        # (kf_index → shared-landmark count) for SvinHealth parity.
        lm_observers: Dict[int, List[int]] = {}
        for s2, fd2 in self.frames.items():
            if s2 == slot:
                continue
            kf_idx2 = self._kf_index_by_state_id.get(
                int(self.window.state_id[s2])
            )
            if kf_idx2 is None:
                continue  # non-keyframe window state
            for l in np.unique(fd2.kp_landmark[0][fd2.kp_landmark[0] >= 0]):
                lm_observers.setdefault(int(l), []).append(kf_idx2)
        point_covis = [lm_observers.get(int(l), []) for l in lm_slots]
        covis: Dict[int, int] = {}
        for lst in point_covis:
            for k2 in lst:
                covis[k2] = covis.get(k2, 0) + 1
        return {
            "kf_index": self.kf_count,
            "timestamp": fd.timestamp,
            # the PREPROCESSED (resized/CLAHE'd) cam0 image — keypoint uv
            # and pixel coordinates share one frame (Subscriber.cpp
            # preprocesses before the pipeline ever sees the image).
            # fd.image0 is a device array; the transfer happens HERE, only
            # for keyframes.
            "image": (
                np.asarray(fd.image0) if fd.image0 is not None
                else np.asarray(images[0])
            ),
            "T_WC_r": np.asarray(T_WC.r),
            "T_WC_q": np.asarray(T_WC.q),
            "points_W": pts,
            "landmark_ids": lm_ids,
            "keypoints_uv": fd.kp_uv[0][sel],
            "quality": qual,
            "num_tracked": int(len(sel)),
            # fresh (untracked) keypoints on the exported camera — the
            # SvinHealth new_kps field (Publisher.cpp:147-270)
            "num_new": int(
                (np.asarray(fd.kp_valid[0]) & (fd.kp_landmark[0] < 0)).sum()
            ),
            "quadrant_counts": np.asarray(q),
            "response_strengths": fd.kp_score[0][sel],
            "covisibilities": covis,  # kf_index -> shared landmark count
            # per exported point: export kf indices of other keyframes
            # observing it (order matches points_W / keypoints_uv)
            "point_covisibilities": point_covis,
            "sequence": self.sequence,
        }

    # ------------------------------------------------------------- output
    def current_pose(self) -> Transformation:
        slot = max(self.n_states - 1, 0)
        T = self.window.pose(slot)
        return Transformation(r=np.asarray(T.r), q=np.asarray(T.q))

    def save_trajectory_tum(self, path: str):
        """TUM format: timestamp tx ty tz qx qy qz qw (reference
        Publisher::saveTrajectory)."""
        with open(path, "w") as f:
            for t, r, q in self.trajectory:
                f.write(
                    f"{t:.6f} {r[0]:.6f} {r[1]:.6f} {r[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
                )
