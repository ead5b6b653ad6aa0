"""SE(3) transformations as (r, q) array pairs with minimal-coords calculus.

Functional equivalent of ``okvis::kinematics::Transformation``
(reference: ``okvis_kinematics/include/okvis/kinematics/Transformation.hpp:78-206``),
re-designed as a JAX pytree so it vmaps/jits: a transformation T_AB is a
NamedTuple of ``r`` (position of frame B origin in A, shape (..., 3)) and ``q``
(Hamilton quaternion xyzw rotating B-vectors into A, shape (..., 4)).

Minimal perturbation (matches the reference's ``oplus``):
    T ⊞ δ = (r + δ_p,  exp(δ_α) ⊗ q)        δ ∈ R^6 = [δ_p, δ_α]
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import quaternion as quat


class Transformation(NamedTuple):
    r: jnp.ndarray  # (..., 3)
    q: jnp.ndarray  # (..., 4) xyzw

    @property
    def C(self) -> jnp.ndarray:
        return quat.to_rotation_matrix(self.q)

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix T, shape (..., 4, 4)."""
        C = self.C
        batch = self.r.shape[:-1]
        bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), batch + (1, 4))
        top = jnp.concatenate([C, self.r[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def identity(batch: tuple = ()) -> Transformation:
    return Transformation(
        r=jnp.zeros(batch + (3,)),
        q=jnp.broadcast_to(quat.identity(), batch + (4,)),
    )


def from_matrix(T: jnp.ndarray) -> Transformation:
    return Transformation(r=T[..., :3, 3], q=quat.from_rotation_matrix(T[..., :3, :3]))


def from_rq(r, q) -> Transformation:
    return Transformation(r=jnp.asarray(r, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
                          q=quat.normalize(jnp.asarray(q, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)))


def compose(T_AB: Transformation, T_BC: Transformation) -> Transformation:
    """T_AC = T_AB * T_BC."""
    return Transformation(
        r=quat.rotate(T_AB.q, T_BC.r) + T_AB.r,
        q=quat.normalize(quat.multiply(T_AB.q, T_BC.q)),
    )


def inverse(T_AB: Transformation) -> Transformation:
    q_inv = quat.conjugate(T_AB.q)
    return Transformation(r=-quat.rotate(q_inv, T_AB.r), q=q_inv)


def transform_point(T_AB: Transformation, p_B: jnp.ndarray) -> jnp.ndarray:
    """Apply to 3D point: p_A = C_AB p_B + r_AB."""
    return quat.rotate(T_AB.q, p_B) + T_AB.r


def transform_homogeneous(T_AB: Transformation, hp_B: jnp.ndarray) -> jnp.ndarray:
    """Apply to homogeneous 4-vector (matches reference operator*(Vector4d))."""
    s = hp_B[..., 3:4]
    top = quat.rotate(T_AB.q, hp_B[..., :3]) + T_AB.r * s
    return jnp.concatenate([top, s], axis=-1)


def oplus(T: Transformation, delta: jnp.ndarray) -> Transformation:
    """Minimal-coordinates retraction, delta shape (..., 6) = [dp, dalpha]."""
    dq = quat.exp(delta[..., 3:6])
    return Transformation(
        r=T.r + delta[..., :3],
        q=quat.normalize(quat.multiply(dq, T.q)),
    )


def ominus(T_a: Transformation, T_b: Transformation) -> jnp.ndarray:
    """Local coordinates of T_a around T_b: delta s.t. oplus(T_b, delta) ≈ T_a."""
    dq = quat.multiply(T_a.q, quat.conjugate(T_b.q))
    return jnp.concatenate([T_a.r - T_b.r, quat.log(dq)], axis=-1)


def oplus_jacobian(T: Transformation) -> jnp.ndarray:
    """d(parameters)/d(delta): 7x6 (params = [r(3), q(4)]).

    Matches the reference's ``oplusJacobian``: top-left I3, bottom-right
    oplus_matrix(q)[:, :3] * 0.5 (derivative of (delta_q ⊗ q) wrt delta_alpha
    at delta=0).
    """
    batch = T.r.shape[:-1]
    J = jnp.zeros(batch + (7, 6))
    J = J.at[..., :3, :3].set(jnp.broadcast_to(jnp.eye(3), batch + (3, 3)))
    # d(dq ⊗ q)/d(dq) = oplus_matrix(q); d(dq)/d(dalpha)|_0 = 0.5 * [I3; 0]
    Oq = quat.oplus_matrix(T.q)
    J = J.at[..., 3:7, 3:6].set(0.5 * Oq[..., :, :3])
    return J


def lift_jacobian(T: Transformation) -> jnp.ndarray:
    """d(delta)/d(parameters): 6x7 pseudo-inverse of oplus_jacobian.

    Matches the reference's ``liftJacobian`` (used to turn full-parameter
    Jacobians into minimal-coordinate ones).
    """
    batch = T.r.shape[:-1]
    J = jnp.zeros(batch + (6, 7))
    J = J.at[..., :3, :3].set(jnp.broadcast_to(jnp.eye(3), batch + (3, 3)))
    Oqi = quat.oplus_matrix(quat.conjugate(T.q))
    J = J.at[..., 3:6, 3:7].set(2.0 * Oqi[..., :3, :])
    return J


def random(key, translation_scale: float = 1.0) -> Transformation:
    """Random transformation for tests (uniform quaternion, gaussian position)."""
    k1, k2 = jax.random.split(key)
    v = jax.random.normal(k1, (4,))
    return Transformation(
        r=jax.random.normal(k2, (3,)) * translation_scale,
        q=quat.normalize(v),
    )
