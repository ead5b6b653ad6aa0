"""SE(3)/quaternion algebra tests.

Mirrors the reference's test coverage in
``okvis_kinematics/test/TestTransformation.cpp``: inverse, composition,
oplus vs left-multiplicative quaternion update, oplusJacobian numeric check —
plus exp/log round trips and lift∘oplus = identity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.kinematics import (
    Transformation,
    compose,
    inverse,
    lift_jacobian,
    ominus,
    oplus,
    oplus_jacobian,
    quaternion as quat,
    transform_homogeneous,
    transform_point,
)
from svin_tpu.kinematics.transformation import from_matrix, random as random_T


KEYS = jax.random.split(jax.random.PRNGKey(0), 16)


def test_quat_multiply_matches_matrix():
    q1 = quat.normalize(jax.random.normal(KEYS[0], (4,)))
    q2 = quat.normalize(jax.random.normal(KEYS[1], (4,)))
    C12 = quat.to_rotation_matrix(quat.multiply(q1, q2))
    C1C2 = quat.to_rotation_matrix(q1) @ quat.to_rotation_matrix(q2)
    np.testing.assert_allclose(C12, C1C2, atol=1e-9)


def test_rotate_matches_matrix():
    q = quat.normalize(jax.random.normal(KEYS[2], (4,)))
    v = jax.random.normal(KEYS[3], (5, 3))
    np.testing.assert_allclose(
        quat.rotate(q, v), v @ quat.to_rotation_matrix(q).T, atol=1e-9
    )


def test_from_rotation_matrix_roundtrip():
    for k in KEYS[:8]:
        q = quat.normalize(jax.random.normal(k, (4,)))
        q2 = quat.from_rotation_matrix(quat.to_rotation_matrix(q))
        # q and -q are the same rotation
        assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-7


def test_exp_log_roundtrip():
    phi = jnp.array([[0.3, -0.2, 0.9], [1e-9, 0, 0], [0, 0, 0], [2.0, 1.0, -0.5]])
    np.testing.assert_allclose(quat.log(quat.exp(phi)), phi, atol=1e-7)


def test_plus_oplus_matrices():
    q1 = quat.normalize(jax.random.normal(KEYS[4], (4,)))
    q2 = quat.normalize(jax.random.normal(KEYS[5], (4,)))
    prod = quat.multiply(q1, q2)
    np.testing.assert_allclose(quat.plus_matrix(q1) @ q2, prod, atol=1e-9)
    np.testing.assert_allclose(quat.oplus_matrix(q2) @ q1, prod, atol=1e-9)


def test_right_jacobian_numeric():
    phi = jnp.array([0.4, -0.3, 0.7])
    Jr = quat.right_jacobian(phi)
    eps = 1e-6
    for i in range(3):
        d = jnp.zeros(3).at[i].set(eps)
        # right jacobian: exp(phi + d) ≈ exp(phi) * exp(Jr d)
        lhs = quat.log(
            quat.multiply(quat.conjugate(quat.exp(phi)), quat.exp(phi + d))
        )
        np.testing.assert_allclose(lhs / eps, Jr[:, i], atol=1e-5)


def test_compose_inverse():
    T1 = random_T(KEYS[6])
    T2 = random_T(KEYS[7])
    T12 = compose(T1, T2)
    np.testing.assert_allclose(
        T12.matrix(), np.array(T1.matrix()) @ np.array(T2.matrix()), atol=1e-9
    )
    Tid = compose(T1, inverse(T1))
    np.testing.assert_allclose(Tid.matrix(), np.eye(4), atol=1e-9)


def test_from_matrix_roundtrip():
    T = random_T(KEYS[8])
    T2 = from_matrix(T.matrix())
    np.testing.assert_allclose(T2.matrix(), T.matrix(), atol=1e-7)


def test_transform_point_homogeneous():
    T = random_T(KEYS[9])
    p = jax.random.normal(KEYS[10], (3,))
    hp = jnp.concatenate([p, jnp.ones(1)])
    np.testing.assert_allclose(
        transform_homogeneous(T, hp)[:3], transform_point(T, p), atol=1e-9
    )


def test_oplus_ominus():
    T = random_T(KEYS[11])
    delta = 0.1 * jax.random.normal(KEYS[12], (6,))
    T2 = oplus(T, delta)
    np.testing.assert_allclose(ominus(T2, T), delta, atol=1e-9)


def test_oplus_jacobian_numeric():
    T = random_T(KEYS[13])
    J = oplus_jacobian(T)

    def params(delta):
        T2 = oplus(T, delta)
        return jnp.concatenate([T2.r, T2.q])

    J_num = jax.jacfwd(params)(jnp.zeros(6))
    np.testing.assert_allclose(J, J_num, atol=1e-7)


def test_lift_oplus_identity():
    T = random_T(KEYS[14])
    # lift @ oplus should be the 6x6 identity (minimal → params → minimal)
    np.testing.assert_allclose(
        lift_jacobian(T) @ oplus_jacobian(T), jnp.eye(6), atol=1e-9
    )


def test_vmap_batch():
    Ts = Transformation(
        r=jax.random.normal(KEYS[15], (7, 3)),
        q=quat.normalize(jax.random.normal(KEYS[0], (7, 4))),
    )
    ps = jax.random.normal(KEYS[1], (7, 3))
    batched = transform_point(Ts, ps)
    single = jax.vmap(transform_point)(Ts, ps)
    np.testing.assert_allclose(batched, single, atol=1e-9)


def test_npq_matches_device_quaternion():
    """The host-numpy quaternion helpers (kinematics.npq) must agree with
    the jnp implementations bit-for-bit in convention (xyzw, Hamilton,
    body->world rotation)."""
    import numpy as np
    from svin_tpu.kinematics import npq, quaternion as quat
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    for _ in range(10):
        q1 = rng.randn(4); q1 /= np.linalg.norm(q1)
        q2 = rng.randn(4); q2 /= np.linalg.norm(q2)
        v = rng.randn(3)
        np.testing.assert_allclose(
            npq.multiply(q1, q2), np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2))),
            atol=1e-12)
        np.testing.assert_allclose(
            npq.to_rotation_matrix(q1),
            np.asarray(quat.to_rotation_matrix(jnp.asarray(q1))), atol=1e-12)
        np.testing.assert_allclose(
            npq.rotate(q1, v), np.asarray(quat.rotate(jnp.asarray(q1), jnp.asarray(v))),
            atol=1e-12)
        np.testing.assert_allclose(npq.conjugate(q1), np.asarray(quat.conjugate(jnp.asarray(q1))), atol=1e-15)
        # from_rotation_matrix round trip (sign-free comparison)
        R = npq.to_rotation_matrix(q1)
        qb = npq.from_rotation_matrix(R)
        np.testing.assert_allclose(npq.to_rotation_matrix(qb), R, atol=1e-9)


def test_npq_compose_inverse_transform():
    import numpy as np
    from svin_tpu.kinematics import npq

    rng = np.random.RandomState(5)
    r1, r2, p = rng.randn(3), rng.randn(3), rng.randn(3)
    q1 = rng.randn(4); q1 /= np.linalg.norm(q1)
    q2 = rng.randn(4); q2 /= np.linalg.norm(q2)
    rc, qc = npq.compose_rq(r1, q1, r2, q2)
    # (T1∘T2)(p) == T1(T2(p))
    np.testing.assert_allclose(
        npq.transform_point_rq(rc, qc, p),
        npq.transform_point_rq(r1, q1, npq.transform_point_rq(r2, q2, p)),
        atol=1e-12)
    ri, qi = npq.inverse_rq(rc, qc)
    np.testing.assert_allclose(
        npq.transform_point_rq(ri, qi, npq.transform_point_rq(rc, qc, p)),
        p, atol=1e-12)
