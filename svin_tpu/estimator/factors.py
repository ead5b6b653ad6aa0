"""Batched residual + minimal-Jacobian evaluation for every factor type.

Replaces the reference's per-factor Ceres cost functions
(``okvis_ceres/src/ReprojectionError*``, ``SonarError.cpp``, ``DepthError.cpp``,
``PoseError.cpp``, ``SpeedAndBiasError.cpp``, ``ImuError.cpp``) with vmapped
closed-form evaluation over the fixed-shape factor tables. All residuals are
returned weighted (sqrt-information applied); Jacobians are in minimal
coordinates ordered [δp, δα, δv, δb_g, δb_a] per state.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..cameras.pinhole import project, project_jacobian
from ..imu import ImuParameters, error_and_jacobians
from ..kinematics import Transformation, quaternion as quat
from .rig import RigParams
from .window import Factors, WindowConfig, WindowState

# Reference: points closer than 0.2 m are treated as invalid (Jacobians zeroed,
# implementation/ReprojectionError.hpp point-behind-camera handling).
MIN_LANDMARK_DEPTH = 0.2


class ReprojEval(NamedTuple):
    res: jnp.ndarray  # (O,2) weighted residual
    J_pose: jnp.ndarray  # (O,2,6) weighted d res / d [δp, δα]
    J_lm: jnp.ndarray  # (O,2,3) weighted d res / d δl
    J_ext: jnp.ndarray  # (O,2,6) weighted d res / d [δp_SC, δα_SC]
    valid: jnp.ndarray  # (O,) effective validity (input mask ∧ in-front)
    rho_cost: jnp.ndarray  # (O,) robustified cost contribution (0.5·ρ)
    weight: jnp.ndarray  # (O,) IRLS robust weight ρ'(s)


def eval_reprojection(
    window: WindowState, factors: Factors, rig: RigParams, cfg: WindowConfig
) -> ReprojEval:
    """Extrinsics T_SC are read from the window (seeded from the rig; only
    optimized when cfg.estimate_extrinsics); rig supplies intrinsics. The
    extrinsics Jacobian mirrors the reference's chained analytic form
    (implementation/ReprojectionError.hpp:85-229, J wrt T_SC)."""
    f = factors.reproj

    def one(uv, s, l, c, w_info, ok):
        T_WS = Transformation(r=window.r[s], q=window.q[s])
        T_SC = Transformation(r=window.ext_r[c], q=window.ext_q[c])
        p_W = window.hp_W[l, :3]
        # p_C = C_CS (C_SW (p_W - r_WS) - r_SC)
        C_SW = quat.to_rotation_matrix(T_WS.q).T
        p_S = C_SW @ (p_W - T_WS.r)
        C_CS = quat.to_rotation_matrix(T_SC.q).T
        p_C = C_CS @ (p_S - T_SC.r)
        cam = rig.camera(c)
        uv_hat, _ = project(cam, p_C)
        in_front = p_C[2] > MIN_LANDMARK_DEPTH
        ok = ok & in_front & window.state_valid[s] & window.lm_valid[l]

        Juv = project_jacobian(cam, p_C)  # (2,3)
        C_CW = C_CS @ C_SW
        J_pC_dp = -C_CW
        J_pC_da = C_CW @ quat.cross_mx(p_W - T_WS.r)
        # minimal perturbation of T_SC: r_SC += δp; C_SC ← exp(δα^) C_SC,
        # so p_C = C_CS exp(-δα^)(p_S - r_SC):
        #   d p_C / d δp_SC = -C_CS,  d p_C / d δα_SC = C_CS (p_S - r_SC)^
        J_pC_dpe = -C_CS
        J_pC_dae = C_CS @ quat.cross_mx(p_S - T_SC.r)
        # residual = measured - predicted → J_res = -J_pred
        Jp = -Juv @ jnp.concatenate([J_pC_dp, J_pC_da], axis=1)  # (2,6)
        Je = -Juv @ jnp.concatenate([J_pC_dpe, J_pC_dae], axis=1)  # (2,6)
        Jl = -Juv @ C_CW  # (2,3)
        r = uv - uv_hat
        # robust (Cauchy) IRLS weight on the squared weighted norm
        s2 = (w_info * w_info) * jnp.dot(r, r)
        c2 = cfg.cauchy_c * cfg.cauchy_c
        rho_p = 1.0 / (1.0 + s2 / c2)
        rho = c2 * jnp.log1p(s2 / c2)
        w_tot = w_info * jnp.sqrt(rho_p)
        w_tot = jnp.where(ok, w_tot, 0.0)
        return ReprojEval(
            res=w_tot * r,
            J_pose=w_tot * Jp,
            J_lm=w_tot * Jl,
            J_ext=w_tot * Je,
            valid=ok,
            rho_cost=jnp.where(ok, 0.5 * rho, 0.0),
            weight=rho_p,
        )

    return jax.vmap(one)(f.uv, f.state_idx, f.lm_idx, f.cam_idx, f.sqrt_info, f.valid)


class ImuEval(NamedTuple):
    res: jnp.ndarray  # (S-1,15)
    J0: jnp.ndarray  # (S-1,15,15)
    J1: jnp.ndarray  # (S-1,15,15)
    valid: jnp.ndarray  # (S-1,)


def eval_imu(
    window: WindowState, factors: Factors, params: ImuParameters
) -> ImuEval:
    f = factors.imu
    S = window.r.shape[0]
    idx0 = jnp.arange(S - 1)
    idx1 = idx0 + 1

    def one(i0, i1, pre, W, ok):
        T0 = Transformation(r=window.r[i0], q=window.q[i0])
        T1 = Transformation(r=window.r[i1], q=window.q[i1])
        e, F0, F1 = error_and_jacobians(
            T0, window.speed_bias[i0], T1, window.speed_bias[i1], pre, params
        )
        ok = ok & window.state_valid[i0] & window.state_valid[i1]
        w = jnp.where(ok, 1.0, 0.0)
        return ImuEval(res=w * (W @ e), J0=w * (W @ F0), J1=w * (W @ F1), valid=ok)

    return jax.vmap(one)(idx0, idx1, f.pre, f.sqrt_info, f.valid)


class ScalarEval(NamedTuple):
    res: jnp.ndarray  # (S,) weighted scalar residual
    J_p: jnp.ndarray  # (S,3) d res / d δp
    valid: jnp.ndarray  # (S,)


def eval_depth(window: WindowState, factors: Factors) -> ScalarEval:
    """e = z_WS − (−depth + first_depth), weighted (DepthError.cpp:70-139)."""
    f = factors.depth
    ok = f.valid & window.state_valid
    w = jnp.where(ok, f.sqrt_info, 0.0)
    e = w * (window.r[:, 2] - (-f.depth + f.first_depth))
    J = jnp.zeros((window.r.shape[0], 3), window.r.dtype).at[:, 2].set(w)
    return ScalarEval(res=e, J_p=J, valid=ok)


def eval_sonar(window: WindowState, factors: Factors) -> ScalarEval:
    """e = range − ‖r_WS − target_W‖ (SonarError.cpp:113-183: Jacobian wrt
    position only; target is the pre-resolved nearby-landmark mean)."""
    f = factors.sonar
    ok = f.valid & window.state_valid
    w = jnp.where(ok, f.sqrt_info, 0.0)
    d = window.r - f.target_W
    n = jnp.linalg.norm(d, axis=-1)
    n_safe = jnp.maximum(n, 1e-9)
    e = w * (f.range - n)
    J = -w[:, None] * d / n_safe[:, None]
    return ScalarEval(res=e, J_p=J, valid=ok)


class PriorEval(NamedTuple):
    pose_res: jnp.ndarray  # (S,6)
    pose_J: jnp.ndarray  # (S,6,6)
    pose_valid: jnp.ndarray  # (S,)
    sb_res: jnp.ndarray  # (S,9)
    sb_J: jnp.ndarray  # (S,9,9)
    sb_valid: jnp.ndarray  # (S,)


def eval_priors(window: WindowState, factors: Factors) -> PriorEval:
    """Pose / speed-bias Gaussian priors (PoseError.cpp, SpeedAndBiasError.cpp).
    e_pose = [r − r̄, log(q q̄⁻¹)] — J ≈ I in minimal coords (exact for
    position; standard small-angle approximation for rotation)."""
    p = factors.priors
    dq = quat.multiply(window.q, quat.conjugate(p.pose_mean_q))
    e_pose = jnp.concatenate([window.r - p.pose_mean_r, quat.log(dq)], axis=-1)
    ok_p = p.pose_valid & window.state_valid
    wp = jnp.where(ok_p, 1.0, 0.0)[:, None]
    pose_res = wp * jnp.einsum("sij,sj->si", p.pose_sqrt_info, e_pose)
    pose_J = wp[..., None] * p.pose_sqrt_info

    e_sb = window.speed_bias - p.sb_mean
    ok_s = p.sb_valid & window.state_valid
    ws = jnp.where(ok_s, 1.0, 0.0)[:, None]
    sb_res = ws * jnp.einsum("sij,sj->si", p.sb_sqrt_info, e_sb)
    sb_J = ws[..., None] * p.sb_sqrt_info
    return PriorEval(
        pose_res=pose_res, pose_J=pose_J, pose_valid=ok_p,
        sb_res=sb_res, sb_J=sb_J, sb_valid=ok_s,
    )


class LmPriorEval(NamedTuple):
    res: jnp.ndarray  # (L,3) weighted residual
    J: jnp.ndarray  # (L,3,3) weighted Jacobian
    valid: jnp.ndarray  # (L,)


def eval_lm_prior(window: WindowState, factors: Factors) -> LmPriorEval:
    """3-dim landmark position prior (reference
    ``HomogeneousPointError::EvaluateWithMinimalJacobians``,
    HomogeneousPointError.cpp:120): e = p_W − p̄, J = sqrt_info (the
    homogeneous-minimal lift is the identity on the Euclidean part)."""
    p = factors.lm_prior
    e = window.hp_W[:, :3] - p.mean
    w = jnp.where(p.valid & window.lm_valid, 1.0, 0.0)[:, None]
    return LmPriorEval(
        res=w * jnp.einsum("lij,lj->li", p.sqrt_info, e),
        J=w[..., None] * p.sqrt_info,
        valid=p.valid & window.lm_valid,
    )


class ExtPriorEval(NamedTuple):
    res: jnp.ndarray  # (C,6) weighted residual
    J: jnp.ndarray  # (C,6,6) weighted Jacobian
    valid: jnp.ndarray  # (C,)


def eval_ext_prior(window: WindowState, factors: Factors) -> ExtPriorEval:
    """Absolute extrinsics prior (reference Estimator.cpp:332-345:
    ceres::PoseError on T_SC with sigma_absolute variances)."""
    p = factors.ext_prior
    dq = quat.multiply(window.ext_q, quat.conjugate(p.mean_q))
    e = jnp.concatenate([window.ext_r - p.mean_r, quat.log(dq)], axis=-1)
    w = jnp.where(p.valid, 1.0, 0.0)[:, None]
    return ExtPriorEval(
        res=w * jnp.einsum("cij,cj->ci", p.sqrt_info, e),
        J=w[..., None] * p.sqrt_info,
        valid=p.valid,
    )


def marg_delta(window: WindowState, factors: Factors) -> jnp.ndarray:
    """χ ⊟ χ_lin over the full minimal state + extrinsics, (Dx,) — the FEJ
    offset the marginal prior is evaluated at
    (MarginalizationError.cpp:798-844). Layout matches MarginalPrior.H:
    S·15 state coords then C·6 extrinsics coords."""
    m = factors.marg
    dq = quat.multiply(window.q, quat.conjugate(m.lin_q))
    d = jnp.concatenate(
        [window.r - m.lin_r, quat.log(dq), window.speed_bias - m.lin_sb], axis=-1
    )  # (S,15)
    dqe = quat.multiply(window.ext_q, quat.conjugate(m.lin_ext_q))
    de = jnp.concatenate(
        [window.ext_r - m.lin_ext_r, quat.log(dqe)], axis=-1
    )  # (C,6)
    return jnp.concatenate([d.reshape(-1), de.reshape(-1)])
