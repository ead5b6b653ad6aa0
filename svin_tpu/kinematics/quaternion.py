"""Hamilton quaternion algebra on JAX arrays.

Quaternions are stored as ``[x, y, z, w]`` (scalar last), matching the Eigen
coefficient order used by the reference
(``okvis_ros/okvis/okvis_kinematics/include/okvis/kinematics/operators.hpp``)
and the TUM trajectory format ``qx qy qz qw``.

All functions are pure, shape-polymorphic over leading batch dimensions where
noted, and safe to ``jax.vmap`` / ``jax.jit``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0])


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    # sign mask in q's own dtype: a bare jnp.array of Python floats is
    # STRONGLY f64 under x64 and would silently upcast an f32 pipeline
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (rotation composition: R(q1) @ R(q2))."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q: R(q) @ v."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix C(q), shape (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_rotation_matrix(C: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from rotation matrix, branch-free (Shepperd's method)."""
    m00, m01, m02 = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    m10, m11, m12 = C[..., 1, 0], C[..., 1, 1], C[..., 1, 2]
    m20, m21, m22 = C[..., 2, 0], C[..., 2, 1], C[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate forms, pick numerically best by largest pivot.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    return normalize(jnp.stack([qx, qy, qz, qw], axis=-1))


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential: rotation vector (..., 3) → quaternion.

    Taylor-safe at phi → 0 (sinc expansion mirrors the reference's
    ``okvis::kinematics::deltaQ`` / ``ode/ode.hpp sinc``).
    """
    angle2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS))
    half = 0.5 * angle
    # sin(half)/angle with series fallback
    small = angle2 < 1e-10
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small[..., 0], 1.0 - angle2[..., 0] / 8.0, jnp.cos(half[..., 0]))
    return jnp.concatenate([phi * k, w[..., None]], axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log: quaternion → rotation vector (..., 3). Taylor-safe."""
    qv = q[..., :3]
    qw = q[..., 3]
    # force positive scalar part (shortest rotation)
    sgn = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sgn[..., None]
    qw = qw * sgn
    # norm via clamped sqrt: d sqrt(max(n2, tiny))/d qv is 0 at qv == 0,
    # so autodiff through log(identity) stays NaN-free (plain
    # jnp.linalg.norm has a 0/0 gradient at the origin that poisons
    # cotangents even through masked `where` branches)
    n2 = jnp.sum(qv * qv, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, _EPS * _EPS))
    angle = 2.0 * jnp.arctan2(n, qw)
    small = n2 < 1e-14
    k = jnp.where(small, 2.0 / jnp.clip(qw, 1e-7), angle / n)
    return qv * k[..., None]


def delta_q(dalpha: jnp.ndarray) -> jnp.ndarray:
    """Small-rotation quaternion from minimal perturbation (exact exp map)."""
    return exp(dalpha)


def cross_mx(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [v]_x, shape (..., 3, 3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zeros = jnp.zeros_like(x)
    m = jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def plus_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplication matrix: multiply(q, p) == plus_matrix(q) @ p.

    Mirrors ``okvis::kinematics::plus`` (operators.hpp) in xyzw layout.
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            w, -z, y, x,
            z, w, -x, y,
            -y, x, w, z,
            -x, -y, -z, w,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (4, 4))


def oplus_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplication matrix: multiply(p, q) == oplus_matrix(q) @ p."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            w, z, -y, x,
            -z, w, x, y,
            y, -x, w, z,
            -x, -y, -z, w,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (4, 4))


def right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian J_r(phi), shape (..., 3, 3). Taylor-safe.

    Mirrors ``okvis::kinematics::rightJacobian`` (operators.hpp).
    """
    angle2 = jnp.sum(phi * phi, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS))
    px = cross_mx(phi)
    px2 = px @ px
    eye = jnp.broadcast_to(jnp.eye(3), px.shape)
    small = angle2 < 1e-10
    a = jnp.where(small, 0.5 - angle2 / 24.0, (1 - jnp.cos(angle)) / jnp.maximum(angle2, _EPS))
    b = jnp.where(
        small,
        1.0 / 6.0 - angle2 / 120.0,
        (angle - jnp.sin(angle)) / jnp.maximum(angle2 * angle, _EPS),
    )
    return eye - a[..., None, None] * px + b[..., None, None] * px2
