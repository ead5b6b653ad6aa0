"""Lens distortion models as pure functions on normalized image coordinates.

Functional re-design of the reference's distortion classes
(``okvis_cv/include/okvis/cameras/RadialTangentialDistortion.hpp``,
``RadialTangentialDistortion8.hpp``, ``EquidistantDistortion.hpp``,
``NoDistortion.hpp``): each model is a (distort, undistort) pair operating on
(..., 2) normalized coordinates with a static parameter vector. Undistortion
uses a fixed-iteration Gauss-Newton (jit/vmap friendly — no data-dependent
termination).

Model names match the reference YAML ``distortion_type`` strings.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

UNDISTORT_ITERS = 8


def _no_distort(p, params):
    return p


def _radtan_distort(p, params):
    """radialtangential: params = [k1, k2, p1, p2]."""
    k1, k2, p1, p2 = params[0], params[1], params[2], params[3]
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _radtan8_distort(p, params):
    """radialtangential8: params = [k1, k2, p1, p2, k3, k4, k5, k6]."""
    k1, k2, p1, p2, k3, k4, k5, k6 = (params[i] for i in range(8))
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _equidistant_distort(p, params):
    """equidistant (fisheye): params = [k1, k2, k3, k4]."""
    k1, k2, k3, k4 = params[0], params[1], params[2], params[3]
    x, y = p[..., 0], p[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-16))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


_DISTORT_FNS = {
    "none": _no_distort,
    "radialtangential": _radtan_distort,
    "radialtangential8": _radtan8_distort,
    "equidistant": _equidistant_distort,
}

NUM_PARAMS = {"none": 0, "radialtangential": 4, "radialtangential8": 8, "equidistant": 4}


def distort(model: str, p: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    return _DISTORT_FNS[model](p, params)


def distort_jacobian(model: str, p: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """d(distorted)/d(undistorted), shape (..., 2, 2) via forward-mode AD."""
    fn = _DISTORT_FNS[model]
    flat = p.reshape(-1, 2)
    J = jax.vmap(jax.jacfwd(lambda u: fn(u, params)))(flat)
    return J.reshape(p.shape[:-1] + (2, 2))


def undistort(model: str, pd: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Invert distortion by fixed-iteration Gauss-Newton (2x2 solve per point).

    Mirrors the reference's iterative ``undistort`` but with a static iteration
    count so it stays a single compiled program.
    """
    if model == "none":
        return pd

    fn = _DISTORT_FNS[model]

    def body(_, u):
        flat = u.reshape(-1, 2)
        res = fn(flat, params) - pd.reshape(-1, 2)
        J = jax.vmap(jax.jacfwd(lambda x: fn(x, params)))(flat)
        # 2x2 solve: delta = J^-1 res
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (J[:, 1, 1] * res[:, 0] - J[:, 0, 1] * res[:, 1]) / det
        dy = (-J[:, 1, 0] * res[:, 0] + J[:, 0, 0] * res[:, 1]) / det
        return (u.reshape(-1, 2) - jnp.stack([dx, dy], axis=-1)).reshape(u.shape)

    return jax.lax.fori_loop(0, UNDISTORT_ITERS, body, pd)
