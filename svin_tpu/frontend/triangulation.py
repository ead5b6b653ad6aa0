"""Two-view triangulation with validity/parallax classification.

Replaces the reference's ``triangulateFast``
(``okvis_frontend/src/stereo_triangulation.cpp:129``) and the probabilistic
wrapper (``ProbabilisticStereoTriangulator.cpp:154-235``): closed-form
midpoint of the common perpendicular between two rays, parallel-ray
handling, and a reprojection-style angular check — all batched (vmap over
correspondence sets).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TriangulationResult(NamedTuple):
    hp: jnp.ndarray  # (...,4) homogeneous point in frame A
    valid: jnp.ndarray  # (...,) rays (nearly) intersect in front
    parallel: jnp.ndarray  # (...,) rays are (nearly) parallel


def triangulate_fast(
    p1: jnp.ndarray,  # (...,3) origin of ray 1 (frame A)
    e1: jnp.ndarray,  # (...,3) unit direction 1 (frame A)
    p2: jnp.ndarray,  # (...,3) origin of ray 2 (frame A)
    e2: jnp.ndarray,  # (...,3) unit direction 2 (frame A)
    sigma: jnp.ndarray,  # (...,) ray angular uncertainty [rad]
) -> TriangulationResult:
    """Midpoint triangulation. For parallel rays returns a far point along
    the mean direction with w→0 (homogeneous infinity handling like the
    reference) and flags ``parallel``.
    """
    t12 = p2 - p1
    d = jnp.sum(e1 * e2, axis=-1)
    denom = 1.0 - d * d  # |e1 x e2|^2
    parallel = denom < jnp.maximum(1e-12, (sigma * sigma))

    b1 = jnp.sum(t12 * e1, axis=-1)
    b2 = jnp.sum(t12 * e2, axis=-1)
    denom_safe = jnp.where(parallel, 1.0, denom)
    lam1 = (b1 - d * b2) / denom_safe
    lam2 = (d * b1 - b2) / denom_safe
    x1 = p1 + lam1[..., None] * e1
    x2 = p2 + lam2[..., None] * e2
    midpoint = 0.5 * (x1 + x2)

    # parallel fallback: far point along the bisecting direction
    mean_dir = e1 + e2
    far = 0.5 * (p1 + p2) + mean_dir * 1e6
    xyz = jnp.where(parallel[..., None], far, midpoint)
    w = jnp.where(parallel, 1e-6, 1.0)
    hp = jnp.concatenate([xyz * jnp.where(parallel, 1e-6, 1.0)[..., None],
                          w[..., None]], axis=-1)

    # validity: both depths positive and gap small vs distance
    gap = jnp.linalg.norm(x2 - x1, axis=-1)
    dist = jnp.linalg.norm(midpoint - p1, axis=-1)
    max_gap = jnp.maximum(4.0 * sigma * dist, 1e-3)
    valid = (lam1 > 0) & (lam2 > 0) & (gap < max_gap)
    valid = jnp.where(parallel, jnp.sum(e1 * e2, axis=-1) > 0.999, valid)
    return TriangulationResult(hp=hp, valid=valid, parallel=parallel)


def point_from_homogeneous(hp: jnp.ndarray) -> jnp.ndarray:
    w = hp[..., 3:4]
    return hp[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)


def triangulation_covariance(
    p_W: jnp.ndarray,  # (...,3) triangulated point (world)
    c1: jnp.ndarray,  # (...,3) camera-1 center
    c2: jnp.ndarray,  # (...,3) camera-2 center
    sigma1: jnp.ndarray,  # (...,) ray-1 angular std [rad]
    sigma2: jnp.ndarray,  # (...,) ray-2 angular std [rad]
    pose_var: jnp.ndarray,  # (...,) relative-pose translation variance [m²]
) -> jnp.ndarray:
    """3×3 landmark covariance from the two-view Gauss-Newton system with a
    relative-pose prior, Schur-marginalizing the second camera's pose.

    The TPU-native closed form of
    ``ProbabilisticStereoTriangulator::getUncertainty``
    (``ProbabilisticStereoTriangulator.cpp:239+``): with unit-bearing
    residuals r_i = (p−c_i)/|p−c_i| − e_i, the Jacobians are the
    perpendicular projectors P_i/d_i (P_i = I − e_i e_iᵀ), so the
    information is

        H_pp  = Σ_i P_i / (σ_i² d_i²)
        H_pc  = −P_2 / (σ_2² d_2²)      (only view 2's center is uncertain)
        H_cc  =  P_2 / (σ_2² d_2²) + I/pose_var

    and  cov = (H_pp − H_pc H_cc⁻¹ H_cp)⁻¹.  ``pose_var`` is the reference's
    velocity-scaled UOplus translation block
    (``VioKeyframeWindowMatchingAlgorithm.cpp:133-141``: 1e-2·max(1,|v|)²
    between frames, 4e-8 within a stereo pair); its rotation block (1e-8)
    is negligible and dropped. All ops are batched 3×3 — vmap-free
    broadcasting."""
    eye = jnp.eye(3, dtype=p_W.dtype)
    d1v = p_W - c1
    d2v = p_W - c2
    d1 = jnp.linalg.norm(d1v, axis=-1)
    d2 = jnp.linalg.norm(d2v, axis=-1)
    e1 = d1v / jnp.maximum(d1, 1e-9)[..., None]
    e2 = d2v / jnp.maximum(d2, 1e-9)[..., None]
    P1 = eye - e1[..., :, None] * e1[..., None, :]
    P2 = eye - e2[..., :, None] * e2[..., None, :]
    w1 = 1.0 / jnp.maximum(sigma1 * sigma1 * d1 * d1, 1e-18)
    w2 = 1.0 / jnp.maximum(sigma2 * sigma2 * d2 * d2, 1e-18)
    Hpp = w1[..., None, None] * P1 + w2[..., None, None] * P2
    Hcc = w2[..., None, None] * P2 + (1.0 / jnp.maximum(pose_var, 1e-12))[
        ..., None, None
    ] * eye
    Hpc = -w2[..., None, None] * P2
    # Schur: Hpp − Hpc Hcc⁻¹ Hcp  (3×3 solves, batched)
    Hcc_inv = jnp.linalg.inv(Hcc + 1e-12 * eye)
    Hs = Hpp - Hpc @ Hcc_inv @ jnp.swapaxes(Hpc, -1, -2)
    return jnp.linalg.inv(Hs + 1e-9 * eye)
