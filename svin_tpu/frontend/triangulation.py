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
