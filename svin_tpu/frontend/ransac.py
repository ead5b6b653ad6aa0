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


# ----------------------------------------------------------- closed-form P3P
def _quartic_roots(A, B, C, D, E, iters: int = 40):
    """All four (complex) roots of A v⁴ + B v³ + C v² + D v + E via
    Durand–Kerner simultaneous iteration — elementary complex arithmetic
    only (general `eig` does not exist on TPU, so no companion matrix; and
    unlike Ferrari's method there are no branch-selection hazards).
    Coefficients may be batched (...,). Returns (...,4) complex roots."""
    cdtype = jnp.complex128 if A.dtype == jnp.float64 else jnp.complex64
    A_ = jnp.where(jnp.abs(A) < 1e-12, 1e-12, A)
    a = (B / A_).astype(cdtype)
    b = (C / A_).astype(cdtype)
    c = (D / A_).astype(cdtype)
    d = (E / A_).astype(cdtype)

    def poly(x):
        return (((x + a[..., None]) * x + b[..., None]) * x
                + c[..., None]) * x + d[..., None]

    # Cauchy-style root bound scales the standard rotating starts
    bound = 1.0 + jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.abs(b)), jnp.maximum(jnp.abs(c), jnp.abs(d))
    )
    seed = jnp.asarray(0.4 + 0.9j, cdtype)
    z = bound[..., None] * seed ** jnp.arange(1, 5)

    def body(i, z):
        # z_i ← z_i − p(z_i) / ∏_{j≠i} (z_i − z_j)
        diff = z[..., :, None] - z[..., None, :]  # (...,4,4)
        eye = jnp.eye(4, dtype=cdtype)
        diff = diff + eye  # diagonal → 1 (excluded from the product)
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        return z - poly(z) / denom

    return jax.lax.fori_loop(0, iters, body, z)


def _p3p_grunert(f: jnp.ndarray, P: jnp.ndarray):
    """Closed-form P3P (Grunert 1841 / Haralick's review): unit bearings
    f (3,3) and world points P (3,3) → up to 4 candidate camera poses
    (T_WC). Returns (r (4,3), q (4,4), ok (4,)). The TPU-native analog of
    the unseeded ``cv::solvePnPRansac`` of the reference loop verification
    (``pose_graph/src/pose_graph/Keyframe.cpp:308-380``)."""
    dtype = f.dtype
    a2 = jnp.sum((P[1] - P[2]) ** 2)
    b2 = jnp.sum((P[0] - P[2]) ** 2)
    c2 = jnp.sum((P[0] - P[1]) ** 2)
    ca = jnp.dot(f[1], f[2])  # cos α (angle at rays 2-3)
    cb = jnp.dot(f[0], f[2])  # cos β (rays 1-3)
    cg = jnp.dot(f[0], f[1])  # cos γ (rays 1-2)
    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    m = (a2 - c2) / b2s
    n = (a2 + c2) / b2s
    A4 = (m - 1.0) ** 2 - 4.0 * (c2 / b2s) * ca * ca
    A3 = 4.0 * (
        m * (1.0 - m) * cb - (1.0 - n) * ca * cg
        + 2.0 * (c2 / b2s) * ca * ca * cb
    )
    A2 = 2.0 * (
        m * m - 1.0 + 2.0 * m * m * cb * cb + 2.0 * ((b2 - c2) / b2s) * ca * ca
        - 4.0 * n * ca * cb * cg + 2.0 * ((b2 - a2) / b2s) * cg * cg
    )
    A1 = 4.0 * (
        -m * (1.0 + m) * cb + 2.0 * (a2 / b2s) * cg * cg * cb
        - (1.0 - n) * ca * cg
    )
    A0 = (1.0 + m) ** 2 - 4.0 * (a2 / b2s) * cg * cg

    roots = _quartic_roots(
        jnp.asarray(A4), jnp.asarray(A3), jnp.asarray(A2), jnp.asarray(A1),
        jnp.asarray(A0),
    )  # (4,) complex
    v = jnp.real(roots)
    real_ok = jnp.abs(jnp.imag(roots)) < 1e-4 * (1.0 + jnp.abs(v))

    def pose_of(vk, okk):
        denom_u = 2.0 * (cg - vk * ca)
        denom_u = jnp.where(jnp.abs(denom_u) < 1e-9, 1e-9, denom_u)
        u = ((-1.0 + m) * vk * vk - 2.0 * m * cb * vk + 1.0 + m) / denom_u
        s1sq = b2 / jnp.maximum(1.0 + vk * vk - 2.0 * vk * cb, 1e-12)
        s1 = jnp.sqrt(jnp.maximum(s1sq, 0.0))
        s2 = u * s1
        s3 = vk * s1
        ok = okk & (vk > 0) & (u > 0) & (s1 > 1e-6)
        X = jnp.stack([s1 * f[0], s2 * f[1], s3 * f[2]])  # camera frame
        # absolute orientation: P ≈ R X + t
        Xc = X - X.mean(axis=0)
        Pc = P - P.mean(axis=0)
        q_WC = _kabsch_quat(Pc, Xc, jnp.ones(3, dtype))
        t = P.mean(axis=0) - quat.rotate(q_WC, X.mean(axis=0))
        # self-consistency: the recovered pose must reproduce the triple
        err = jnp.max(
            jnp.linalg.norm(
                quat.rotate(q_WC, X) + t - P, axis=-1
            )
        )
        scale = jnp.sqrt(jnp.maximum(a2 + b2 + c2, 1e-9))
        ok = ok & (err < 0.02 * scale)
        return t, q_WC, ok

    r4, q4, ok4 = jax.vmap(pose_of)(v.astype(dtype), real_ok)
    return r4, q4, ok4


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "min_inliers", "refine_iters"),
)
def absolute_pose_ransac_p3p(
    key,
    p_W: jnp.ndarray,  # (N,3)
    bearings: jnp.ndarray,  # (N,3) unit, camera frame
    valid: jnp.ndarray,  # (N,)
    focal_px,
    threshold_px=3.0,
    num_hypotheses: int = 64,
    min_inliers: int = 10,
    refine_iters: int = 7,
) -> RansacResult:
    """SEED-FREE absolute-pose RANSAC: closed-form P3P hypotheses (up to 4
    poses per minimal triple, all scored), best model refined by GN on its
    inliers. Unlike ``absolute_pose_ransac`` (prior-seeded GN) this needs
    NO initial pose — loop-closure verification must work under arbitrary
    drift, exactly why the reference uses unseeded ``cv::solvePnPRansac``
    (``Keyframe.cpp:308-380``)."""
    N = p_W.shape[0]
    dtype = p_W.dtype
    thr = threshold_px / focal_px
    probs = jnp.where(valid, 1.0, 1e-9)
    keys = jax.random.split(key, num_hypotheses)

    def one(k):
        idx = jax.random.choice(
            k, N, shape=(3,), replace=False, p=probs / jnp.sum(probs)
        )
        ok_sample = jnp.all(valid[idx])
        r4, q4, ok4 = _p3p_grunert(bearings[idx], p_W[idx])

        def score(rr, qq, ok):
            T = Transformation(r=rr, q=qq)
            res = _bearing_residual(T, p_W, bearings).reshape(N, 3)
            err = jnp.linalg.norm(res, axis=-1)
            inl = valid & (err < thr) & ok & ok_sample
            return inl, jnp.sum(inl)

        inl4, n4 = jax.vmap(score)(r4, q4, ok4)
        best = jnp.argmax(n4)
        return r4[best], q4[best], inl4[best], n4[best]

    rs, qs, inls, counts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    T_best = Transformation(r=rs[best], q=qs[best])
    inl_b = inls[best]
    # GN refinement on the best model's inliers (seeded by P3P itself)
    T_ref = _gn_pose_fit(
        T_best, p_W, bearings, inl_b.astype(dtype), iters=refine_iters
    )
    res = _bearing_residual(T_ref, p_W, bearings).reshape(N, 3)
    err = jnp.linalg.norm(res, axis=-1)
    inl = valid & (err < thr)
    n = jnp.sum(inl)
    ok = n >= min_inliers
    # fall back to the unrefined best if refinement lost inliers
    better = n >= counts[best]
    T_out = Transformation(
        r=jnp.where(better, T_ref.r, T_best.r),
        q=jnp.where(better, T_ref.q, T_best.q),
    )
    inl = jnp.where(better, inl, inl_b)
    n = jnp.where(better, n, counts[best])
    # SECOND, TIGHTENED refinement: the acceptance threshold is loose by
    # design (the reference runs cv::solvePnPRansac at 20 px,
    # Parameters.cpp:24-27 — at loop-closure focal lengths that is
    # several degrees), so the inlier set can contain near-miss
    # mismatches that bias the refit by 0.1–0.3 m; pose-graph edges built
    # from such poses plateau the 4-DoF solve at ~0.2 m per loop edge
    # (measured in the Cave-scale diagnostic). Re-select support at a
    # quarter of the threshold (floored at 3 px) and refit; keep the
    # tight pose only when it retains majority support. Inlier COUNT and
    # set stay at the original threshold — gate semantics unchanged.
    thr2 = jnp.maximum(thr * 0.25, 3.0 / focal_px)
    inl_t = inl & (err < thr2)
    n_t = jnp.sum(inl_t)
    T_tight = _gn_pose_fit(
        T_out, p_W, bearings, inl_t.astype(dtype), iters=refine_iters
    )
    err_t = jnp.linalg.norm(
        _bearing_residual(T_tight, p_W, bearings).reshape(N, 3), axis=-1
    )
    inl_chk = valid & (err_t < thr)
    use_tight = (n_t >= jnp.maximum(6, n // 2)) & (jnp.sum(inl_chk) >= n)
    T_out = Transformation(
        r=jnp.where(use_tight, T_tight.r, T_out.r),
        q=jnp.where(use_tight, T_tight.q, T_out.q),
    )
    inl = jnp.where(use_tight, inl_chk, inl)
    n = jnp.where(use_tight, jnp.sum(inl_chk), n)
    return RansacResult(
        T=T_out, inliers=inl, num_inliers=n, success=n >= min_inliers
    )
