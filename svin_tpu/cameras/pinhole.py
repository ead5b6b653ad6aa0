"""Pinhole camera with pluggable distortion — project / backProject + Jacobians.

Functional re-design of ``okvis::cameras::PinholeCamera<DISTORTION>``
(reference: ``okvis_cv/include/okvis/cameras/PinholeCamera.hpp:130-198`` and
``implementation/PinholeCamera.hpp``). A camera is a static pytree
(``PinholeCamera``); all projection functions broadcast over leading batch
dims and are vmap/jit-safe. Projection validity is returned as a mask instead
of the reference's ``ProjectionStatus`` enum (fixed shapes, no branches).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import distortion as dist


class PinholeCamera(NamedTuple):
    """Static camera intrinsics. ``model`` is a Python string (trace-static)."""

    fu: jnp.ndarray
    fv: jnp.ndarray
    cu: jnp.ndarray
    cv: jnp.ndarray
    dist_params: jnp.ndarray  # model-specific, shape (P,)
    width: int
    height: int
    model: str = "radialtangential"

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fu, 0.0, self.cu], [0.0, self.fv, self.cv], [0.0, 0.0, 1.0]]
        )

    @property
    def focal_length(self) -> jnp.ndarray:
        return 0.5 * (self.fu + self.fv)


def make_camera(width, height, fu, fv, cu, cv, dist_params=None, model="radialtangential") -> PinholeCamera:
    if dist_params is None:
        dist_params = jnp.zeros((dist.NUM_PARAMS[model] or 1,))
    return PinholeCamera(
        fu=jnp.asarray(fu, jnp.float32),
        fv=jnp.asarray(fv, jnp.float32),
        cu=jnp.asarray(cu, jnp.float32),
        cv=jnp.asarray(cv, jnp.float32),
        dist_params=jnp.asarray(dist_params, jnp.float32),
        width=int(width),
        height=int(height),
        model=model,
    )


MIN_DEPTH = 1e-6


def project(cam: PinholeCamera, p_C: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project 3D camera-frame point(s) (..., 3) → pixel (..., 2), valid mask.

    Valid ⇔ depth > 0 and pixel inside the image (mirrors
    ``ProjectionStatus::Successful``). Invalid points still produce finite
    output (clamped depth) so gradients stay clean under masking.
    """
    z = p_C[..., 2]
    z_safe = jnp.where(jnp.abs(z) < MIN_DEPTH, MIN_DEPTH, z)
    un = p_C[..., :2] / z_safe[..., None]
    d = dist.distort(cam.model, un, cam.dist_params)
    uv = jnp.stack(
        [cam.fu * d[..., 0] + cam.cu, cam.fv * d[..., 1] + cam.cv], axis=-1
    )
    in_image = (
        (uv[..., 0] >= 0.0)
        & (uv[..., 0] <= cam.width - 1)
        & (uv[..., 1] >= 0.0)
        & (uv[..., 1] <= cam.height - 1)
    )
    valid = (z > MIN_DEPTH) & in_image
    return uv, valid


def project_homogeneous(cam: PinholeCamera, hp_C: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project homogeneous point; sign-flips by w so points behind stay invalid."""
    w = hp_C[..., 3]
    p = jnp.where(w[..., None] < 0, -hp_C[..., :3], hp_C[..., :3])
    return project(cam, p)


def project_jacobian(cam: PinholeCamera, p_C: jnp.ndarray) -> jnp.ndarray:
    """d(pixel)/d(point), shape (..., 2, 3). Analytic chain:
    J = diag(fu,fv) @ J_dist @ [1/z, 0, -x/z²; 0, 1/z, -y/z²].
    """
    x, y, z = p_C[..., 0], p_C[..., 1], p_C[..., 2]
    z_safe = jnp.where(jnp.abs(z) < MIN_DEPTH, MIN_DEPTH, z)
    rz = 1.0 / z_safe
    un = jnp.stack([x * rz, y * rz], axis=-1)
    Jd = dist.distort_jacobian(cam.model, un, cam.dist_params)
    # J_norm: (..., 2, 3)
    zero = jnp.zeros_like(rz)
    J_norm = jnp.stack(
        [
            jnp.stack([rz, zero, -x * rz * rz], axis=-1),
            jnp.stack([zero, rz, -y * rz * rz], axis=-1),
        ],
        axis=-2,
    )
    Jdn = Jd @ J_norm
    f = jnp.stack([cam.fu, cam.fv])
    return f[..., :, None] * Jdn


def back_project(cam: PinholeCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel(s) (..., 2) → unit-norm bearing vector(s) (..., 3) in camera frame."""
    d = jnp.stack(
        [(uv[..., 0] - cam.cu) / cam.fu, (uv[..., 1] - cam.cv) / cam.fv], axis=-1
    )
    un = dist.undistort(cam.model, d, cam.dist_params)
    ray = jnp.concatenate([un, jnp.ones_like(un[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
