"""Batched RANSAC: absolute pose (3D-2D), relative rotation (2D-2D), all
hypotheses solved in parallel with `vmap`.

TPU-native replacement for OpenGV's sample-consensus stack
(``Frontend.cpp:617-980``: GP3P absolute-pose RANSAC with 50 iterations and
threshold 9 px², Stewenius 5-pt and 2-pt rotation-only relative RANSAC).
Instead of algebraic minimal solvers (quartic/Groebner root finding — host
friendly, TPU hostile), each hypothesis is a prior-seeded Gauss-Newton on
its minimal sample: SLAM always has an IMU-propagated pose prediction, so a
few damped GN steps on 3 points converge to the same basin the algebraic
P3P solution would be disambiguated to — and the whole hypothesis batch is
one fused program. Rotation-only uses closed-form Kabsch (batched SVD).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kinematics import Transformation, quaternion as quat


class RansacResult(NamedTuple):
    T: Transformation  # best model (meaning depends on call)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # ()
    success: jnp.ndarray  # ()


def _project_bearing(T_CW: Transformation, p_W: jnp.ndarray) -> jnp.ndarray:
    """World point → unit bearing in camera frame."""
    p_C = quat.rotate(T_CW.q, p_W) + T_CW.r
    return p_C / jnp.maximum(jnp.linalg.norm(p_C, axis=-1, keepdims=True), 1e-12)


def _bearing_residual(T_WC: Transformation, p_W, bearing):
    """Angular residual: measured bearing vs predicted direction (tangent)."""
    q_inv = quat.conjugate(T_WC.q)
    p_C = quat.rotate(q_inv, p_W - T_WC.r)
    pred = p_C / jnp.maximum(jnp.linalg.norm(p_C, axis=-1, keepdims=True), 1e-12)
    return (pred - bearing).reshape(-1)  # (3N,) small-angle proxy


@partial(jax.jit, static_argnames=("iters",))
def _gn_pose_fit(
    T0: Transformation, p_W: jnp.ndarray, bearings: jnp.ndarray,
    weights: jnp.ndarray, iters: int = 7, damping: float = 1e-6,
):
    """Damped GN on SE(3) minimizing weighted bearing residuals.
    p_W (N,3), bearings (N,3) unit (camera frame), weights (N,)."""

    def step(T, _):
        def res_of(delta):
            Td = Transformation(
                r=T.r + delta[:3],
                q=quat.normalize(quat.multiply(quat.exp(delta[3:6]), T.q)),
            )
            r = _bearing_residual(Td, p_W, bearings)
            return r * jnp.repeat(weights, 3)

        r0 = res_of(jnp.zeros(6))
        J = jax.jacfwd(res_of)(jnp.zeros(6))
        H = J.T @ J + damping * jnp.eye(6, dtype=r0.dtype)
        g = J.T @ r0
        delta = -jnp.linalg.solve(H, g)
        T_new = Transformation(
            r=T.r + delta[:3],
            q=quat.normalize(quat.multiply(quat.exp(delta[3:6]), T.q)),
        )
        return T_new, None

    T_fit, _ = jax.lax.scan(step, T0, None, length=iters)
    return T_fit


@partial(
    jax.jit,
    static_argnames=(
        # min_inliers is deliberately TRACED: callers derive it from the
        # candidate count (max(8, n//3)) — static would recompile per value
        "focal_px", "threshold_px", "num_hypotheses",
        "sample_size", "refine_iters",
    ),
)
def absolute_pose_ransac(
    key,
    p_W: jnp.ndarray,  # (N,3) landmark positions
    bearings: jnp.ndarray,  # (N,3) measured unit bearings in camera frame
    valid: jnp.ndarray,  # (N,)
    T_WC_prior: Transformation,  # IMU-predicted camera pose (seed)
    focal_px: float = 450.0,
    threshold_px: float = 3.0,  # reference: thr 9 (px²) → 3 px
    num_hypotheses: int = 50,  # reference: 50 iterations
    min_inliers: int = 10,
    sample_size: int = 3,
    refine_iters: int = 5,
) -> RansacResult:
    """3D-2D absolute-pose RANSAC (replaces FrameAbsolutePoseSacProblem/GP3P).

    Angular inlier threshold = threshold_px / focal_px (the reference converts
    the same way, Frontend.cpp:641-644).
    """
    N = p_W.shape[0]
    dtype = p_W.dtype
    thr = threshold_px / focal_px

    # sample: random indices over valid entries (invalid get weight 0)
    probs = jnp.where(valid, 1.0, 1e-9)
    keys = jax.random.split(key, num_hypotheses)

    def one_hypothesis(k):
        idx = jax.random.choice(k, N, shape=(sample_size,), replace=False, p=probs / jnp.sum(probs))
        w = valid[idx].astype(dtype)
        T_fit = _gn_pose_fit(T_WC_prior, p_W[idx], bearings[idx], w, iters=7)
        # inlier count
        r = _bearing_residual(T_fit, p_W, bearings).reshape(N, 3)
        err = jnp.linalg.norm(r, axis=-1)
        inl = valid & (err < thr)
        return T_fit, inl, jnp.sum(inl)

    Ts, inls, counts = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(counts)
    T_best = Transformation(r=Ts.r[best], q=Ts.q[best])
    inl_best = inls[best]

    # final refinement on inliers
    T_ref = _gn_pose_fit(
        T_best, p_W, bearings, inl_best.astype(dtype), iters=refine_iters
    )
    r = _bearing_residual(T_ref, p_W, bearings).reshape(N, 3)
    err = jnp.linalg.norm(r, axis=-1)
    inl_final = valid & (err < thr)
    n = jnp.sum(inl_final)
    ok = n >= min_inliers
    T_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), T_ref, T_WC_prior
    )
    return RansacResult(T=T_out, inliers=inl_final, num_inliers=n, success=ok)


def _kabsch_quat(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Rotation q minimizing Σ w‖a − R b‖² via SVD of the covariance."""
    C = jnp.einsum("n,ni,nj->ij", w, a, b)
    U, _, Vt = jnp.linalg.svd(C)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, d], C.dtype))
    return quat.from_rotation_matrix(U @ S @ Vt)


@partial(
    jax.jit,
    static_argnames=(
        "threshold_px", "focal_px", "num_hypotheses", "min_inliers"
    ),
)
def rotation_only_ransac(
    key,
    bearings_a: jnp.ndarray,  # (N,3) unit bearings, frame A
    bearings_b: jnp.ndarray,  # (N,3) unit bearings, frame B
    valid: jnp.ndarray,
    threshold_px: float = 3.0,
    focal_px: float = 450.0,
    num_hypotheses: int = 32,
    min_inliers: int = 10,
) -> RansacResult:
    """2-point rotation-only RANSAC (replaces FrameRotationOnlySacProblem):
    hypotheses are closed-form Kabsch fits on bearing pairs."""
    N = bearings_a.shape[0]
    dtype = bearings_a.dtype
    thr = threshold_px / focal_px
    probs = jnp.where(valid, 1.0, 1e-9)
    keys = jax.random.split(key, num_hypotheses)

    def one(k):
        idx = jax.random.choice(k, N, shape=(2,), replace=False, p=probs / jnp.sum(probs))
        q_ab = _kabsch_quat(
            bearings_a[idx], bearings_b[idx], valid[idx].astype(dtype)
        )
        pred = quat.rotate(q_ab, bearings_b)
        err = jnp.linalg.norm(pred - bearings_a, axis=-1)
        inl = valid & (err < thr)
        return q_ab, inl, jnp.sum(inl)

    qs, inls, counts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    inl_best = inls[best]
    # refine on all inliers
    q_ref = _kabsch_quat(bearings_a, bearings_b, inl_best.astype(dtype))
    pred = quat.rotate(q_ref, bearings_b)
    err = jnp.linalg.norm(pred - bearings_a, axis=-1)
    inl = valid & (err < thr)
    n = jnp.sum(inl)
    T = Transformation(r=jnp.zeros(3, dtype), q=q_ref)
    return RansacResult(T=T, inliers=inl, num_inliers=n, success=n >= min_inliers)


# ------------------------------------------------- relative pose (5-pt class)
def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """(2,3) orthonormal basis of the plane ⊥ t (branchless helper pick)."""
    helper = jnp.where(
        jnp.abs(t[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], t.dtype),
        jnp.array([0.0, 1.0, 0.0], t.dtype),
    )
    e1 = jnp.cross(t, helper)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
    e2 = jnp.cross(t, e1)
    return jnp.stack([e1, e2])


def _epipolar_residual(q_ab, t_hat, bA, bB):
    """Per-pair epipolar coplanarity residual bAᵀ (t̂ × R bB)  (N,)."""
    Rb = quat.rotate(q_ab, bB)
    n = jnp.cross(jnp.broadcast_to(t_hat, Rb.shape), Rb)
    return jnp.sum(bA * n, axis=-1)


@partial(jax.jit, static_argnames=("iters",))
def _gn_rel_fit(
    q0: jnp.ndarray, t0: jnp.ndarray,
    bA: jnp.ndarray, bB: jnp.ndarray, weights: jnp.ndarray,
    iters: int = 10, damping: float = 1e-8,
):
    """Damped GN on (rotation, unit-translation direction) minimizing the
    weighted epipolar residuals — the prior-seeded analog of the Stewenius
    5-pt minimal solver (5 DoF: 3 rotation + 2 direction-on-sphere)."""

    def step(carry, _):
        q, t = carry

        def res_of(d):
            qq = quat.normalize(quat.multiply(quat.exp(d[:3]), q))
            B = _tangent_basis(t)
            tt = t + d[3] * B[0] + d[4] * B[1]
            tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-12)
            return _epipolar_residual(qq, tt, bA, bB) * weights

        r0 = res_of(jnp.zeros(5, bA.dtype))
        J = jax.jacfwd(res_of)(jnp.zeros(5, bA.dtype))
        H = J.T @ J + damping * jnp.eye(5, dtype=bA.dtype)
        d = -jnp.linalg.solve(H, J.T @ r0)
        q_new = quat.normalize(quat.multiply(quat.exp(d[:3]), q))
        B = _tangent_basis(t)
        t_new = t + d[3] * B[0] + d[4] * B[1]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return (q_new, t_new), None

    (q_f, t_f), _ = jax.lax.scan(step, (q0, t0), None, length=iters)
    return q_f, t_f


@partial(
    jax.jit,
    static_argnames=(
        "threshold_px", "focal_px", "num_hypotheses", "sample_size",
        "refine_iters",
    ),
)
def relative_pose_ransac(
    key,
    bearings_a: jnp.ndarray,  # (N,3) unit bearings, frame A
    bearings_b: jnp.ndarray,  # (N,3) unit bearings, frame B
    valid: jnp.ndarray,
    T_AB_prior: Transformation,  # IMU-predicted relative pose A→B (seed)
    threshold_px: float = 3.0,
    focal_px: float = 450.0,
    num_hypotheses: int = 32,
    min_inliers: int = 10,
    sample_size: int = 5,
    refine_iters: int = 10,
) -> RansacResult:
    """2D-2D relative-pose RANSAC (replaces FrameRelativePoseSacProblem /
    Stewenius 5-pt, ``Frontend.cpp:832-980``): prior-seeded GN hypotheses on
    the epipolar objective over minimal 5-point samples, vmapped into one
    program. The returned T has a UNIT-NORM translation direction (epipolar
    geometry is scale-blind — the reference likewise rescales externally).
    Degenerate (pure-rotation) motion leaves t unobservable; callers should
    also run rotation_only_ransac and prefer it when its inlier count is
    comparable (the reference's runRansac2d2d does exactly this)."""
    N = bearings_a.shape[0]
    dtype = bearings_a.dtype
    thr = threshold_px / focal_px
    # prior: bearing convention bA ≈ R_AB bB scaled + t direction in A
    q_prior = T_AB_prior.q
    t_prior = T_AB_prior.r
    tn = jnp.linalg.norm(t_prior)
    t_prior = jnp.where(
        tn > 1e-9, t_prior / jnp.maximum(tn, 1e-12),
        jnp.array([1.0, 0.0, 0.0], dtype),
    )
    probs = jnp.where(valid, 1.0, 1e-9)
    keys = jax.random.split(key, num_hypotheses)

    def one(k):
        idx = jax.random.choice(
            k, N, shape=(sample_size,), replace=False, p=probs / jnp.sum(probs)
        )
        w = valid[idx].astype(dtype)
        q_f, t_f = _gn_rel_fit(
            q_prior, t_prior, bearings_a[idx], bearings_b[idx], w, iters=7
        )
        r = _epipolar_residual(q_f, t_f, bearings_a, bearings_b)
        inl = valid & (jnp.abs(r) < thr)
        return q_f, t_f, inl, jnp.sum(inl)

    qs, ts, inls, counts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    q_b, t_b, inl_b = qs[best], ts[best], inls[best]
    # refinement on all inliers
    q_r, t_r = _gn_rel_fit(
        q_b, t_b, bearings_a, bearings_b, inl_b.astype(dtype),
        iters=refine_iters,
    )
    r = _epipolar_residual(q_r, t_r, bearings_a, bearings_b)
    inl = valid & (jnp.abs(r) < thr)
    n = jnp.sum(inl)
    ok = n >= min_inliers
    q_out = jnp.where(ok, q_r, q_prior)
    t_out = jnp.where(ok, t_r, t_prior)
    return RansacResult(
        T=Transformation(r=t_out, q=q_out), inliers=inl, num_inliers=n,
        success=ok,
    )
