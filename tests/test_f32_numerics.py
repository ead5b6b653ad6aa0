"""f32 numeric-hardening regressions (round 4).

The shipped TPU path runs f32 end to end while the reference gets its
stability from double-precision Ceres (Estimator.cpp:876-929). Round 4
found and fixed three f32-specific failure modes that made the engine
diverge at ~2 m/s on the 30 s gauntlet (all reproduced on CPU-f32, so
none are TPU-kernel bugs):

1. ``imu.preintegration.sqrt_information``: raw Cholesky of a covariance
   whose diagonal spans ~1e-8 (rad²) … ~1e-13 (bias walk) — cond ≥ 1e8,
   beyond f32. Fixed by factoring the correlation matrix.
2. ``estimator.gauss_newton._solve_step``: raw factorization of the
   reduced camera system with ~1e8 curvature spread. Fixed by Jacobi
   equilibration (exact algebra, f32-safe conditioning).
3. ``estimator.marginalization``: the marginal prior consumed as
   0.5·dmᵀHdm + bᵀdm is unbounded below when f32 truncation leaves
   (a) a null(H) component in b or (b) small NEGATIVE eigenvalues in H
   — LM then accepts divergent steps with monotonically "decreasing"
   negative cost. Fixed by PSD-clamping H and range-projecting b at
   prior creation (the reference avoids this structurally via its
   residual form, MarginalizationError::updateErrorComputation,
   MarginalizationError.cpp:725-758).

These tests pin each fix at the unit level in explicit f32 (the suite's
x64 flag only changes defaults, not explicit dtypes).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _scaled_spd(rng, scales):
    """SPD with per-coordinate scale spread (the realistic ill-conditioning:
    mixed units) and a well-conditioned correlation core — the structure
    diagonal equilibration is designed for. A randomly ROTATED spectrum of
    the same range would be genuinely f32-unsolvable by any method."""
    n = len(scales)
    C = np.eye(n) + 0.3 * rng.rand(n, n)
    C = 0.5 * (C + C.T) + n * np.eye(n)
    Cn = C / np.sqrt(np.outer(np.diag(C), np.diag(C)))
    d = np.asarray(scales)
    return np.sqrt(np.outer(d, d)) * Cn


def test_sqrt_information_f32_ill_conditioned():
    """Whitener of a realistically ill-conditioned preintegration
    covariance must satisfy WᵀW·P ≈ I in f32 (pre-fix: O(1) error)."""
    from svin_tpu.imu.preintegration import Preintegral, sqrt_information

    rng = np.random.RandomState(0)
    # diagonal scales mirror a 0.3 s segment: rotation ~1e-8, velocity
    # ~1e-6, position ~1e-8, gyro bias walk ~1e-13, accel bias walk ~1e-11
    d = np.concatenate([
        1e-8 * (1 + rng.rand(3)), 1e-6 * (1 + rng.rand(3)),
        1e-8 * (1 + rng.rand(3)), 1e-13 * (1 + rng.rand(3)),
        1e-11 * (1 + rng.rand(3)),
    ])
    P = _scaled_spd(rng, d).astype(np.float32)

    pre = Preintegral(
        Delta_q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        C_integral=jnp.eye(3, dtype=jnp.float32),
        C_doubleintegral=jnp.eye(3, dtype=jnp.float32),
        acc_integral=jnp.zeros(3, jnp.float32),
        acc_doubleintegral=jnp.zeros(3, jnp.float32),
        dalpha_db_g=jnp.zeros((3, 3), jnp.float32),
        dv_db_g=jnp.zeros((3, 3), jnp.float32),
        dp_db_g=jnp.zeros((3, 3), jnp.float32),
        P_delta=jnp.asarray(P),
        Delta_t=jnp.asarray(0.3, jnp.float32),
        bias_ref=jnp.zeros(6, jnp.float32),
    )
    W = np.asarray(sqrt_information(pre))
    assert W.dtype == np.float32
    G = W.T @ W @ P.astype(np.float64)
    err = np.abs(G - np.eye(15)).max()
    assert err < 1e-2, f"whitener error {err} (f32 Cholesky lost the factor)"


def test_pinv_sym_f32_wide_dynamic_range():
    """Equilibrated pseudo-inverse recovers the true inverse at 1e11
    dynamic range in f32 (pre-fix: small eigenvalues clipped to zero →
    entire velocity/position directions dropped from the fold)."""
    from svin_tpu.estimator.marginalization import _pinv_sym

    rng = np.random.RandomState(1)
    # realistic information spread (reprojection ~1e0 … bias-walk ~1e11;
    # the marginal prior never mixes scales wider than ~1e12)
    scales = np.asarray(
        [1e11, 1e9, 1e7, 1e5, 1e3, 1e2, 1e2, 1e1, 1e1, 1.0, 1.0, 1.0,
         1e-1, 1e-1, 1e-1]
    )
    A = _scaled_spd(rng, scales).astype(np.float32)
    Ainv = np.asarray(_pinv_sym(jnp.asarray(A)))
    R = np.asarray(A, np.float64) @ Ainv - np.eye(15)
    # A·A⁺−I = D(ÂÂ⁺−I)D⁻¹ — measure in the equilibrated metric, where
    # "correct" means correct per coordinate scale (the raw residual is
    # dominated by 1e6 cross-scale amplification of eps-level terms)
    d = np.sqrt(np.diag(A).astype(np.float64))
    err = np.abs(R / d[:, None] * d[None, :]).max()
    assert err < 1e-2, f"pinv error {err}"
    # pre-fix sanity: the un-equilibrated f32 eigh would have zeroed every
    # eigenvalue below eps·1e11 ≈ 2e4 — verify small-scale rows are LIVE
    assert np.abs(Ainv[-1]).max() > 0.1, "small-scale row dropped"


def test_pinv_sym_empty_rows_masked():
    """Zero/negative diagonals (f32 Schur cancellation) must yield zero
    rows, not overflow."""
    from svin_tpu.estimator.marginalization import _pinv_sym

    A = np.diag([4.0, 1.0, 0.0, -1e-7]).astype(np.float32)
    A[0, 2] = A[2, 0] = 1e-5  # off-diagonal residue on an empty row
    P = np.asarray(_pinv_sym(jnp.asarray(A)))
    assert np.isfinite(P).all()
    assert np.allclose(P[2], 0) and np.allclose(P[3], 0)
    assert abs(P[0, 0] - 0.25) < 1e-6 and abs(P[1, 1] - 1.0) < 1e-6


def test_project_to_range_bounds_prior_cost():
    """After projection, the prior quadratic 0.5·dᵀHd + bᵀd is bounded
    below along every direction (pre-fix: null-space b components and
    negative eigenvalues made it a descent funnel for LM)."""
    from svin_tpu.estimator.marginalization import _project_to_range

    rng = np.random.RandomState(2)
    n = 24
    # rank-deficient PSD with a negative eigenvalue ABOVE the f32 noise
    # floor (eps·λmax ≈ 10 here; the measured in-situ defect was ~1e-6 of
    # λmax too) and a null-space contamination in b
    Q, _ = np.linalg.qr(rng.randn(n, n))
    w = np.concatenate([1e8 * (1 + rng.rand(n - 6)), np.zeros(5), [-1e3]])
    H = (Q * w[None, :]) @ Q.T
    b_range = H @ (1e-3 * rng.randn(n))
    v_null, v_neg = Q[:, -3], Q[:, -1]
    b_null = v_null * 50.0  # contamination in a null direction
    Hf = jnp.asarray(H, jnp.float32)
    bf = jnp.asarray(b_range + b_null, jnp.float32)
    Hp, bp = _project_to_range(Hf, bf)
    Hp, bp = np.asarray(Hp, np.float64), np.asarray(bp, np.float64)
    # negative curvature reduced to the f32 noise floor (was -1e3)
    wmin = np.linalg.eigvalsh(Hp).min()
    noise = np.finfo(np.float32).eps * np.abs(w).max() * n
    assert wmin > -noise, (wmin, noise)
    assert v_neg @ Hp @ v_neg > -noise, v_neg @ Hp @ v_neg
    # null-direction gradient reduced to projection noise (was 50)
    assert abs(bp @ v_null) < 5.0, bp @ v_null
    # range components of b survive (not zeroed wholesale)
    assert np.linalg.norm(bp) > 0.1 * np.linalg.norm(b_range)


def test_optimize_4dof_f32_large_coordinates():
    """Pose-graph GN in f32 with Cave-scale coordinates (|p| ~ 2e2 m)
    must stay finite and non-divergent over 30 iterations (pre-fix: the
    un-equilibrated dense solve diverged 177 → 7e2 → 5e4 → NaN)."""
    from svin_tpu.loopclosure.posegraph import (
        PoseGraphEdges, PoseGraphNodes, optimize_4dof,
    )

    rng = np.random.RandomState(3)
    N = 64
    th = np.linspace(0, 4 * np.pi, N)
    p = np.stack([200 * np.cos(th), 200 * np.sin(th), 0.1 * th], 1)
    yaw = th + np.pi / 2
    p_n = p + 0.5 * rng.randn(N, 3)
    yaw_n = yaw + 0.02 * rng.randn(N)
    i = np.arange(N - 1)
    j = i + 1
    cy, sy = np.cos(yaw[i]), np.sin(yaw[i])
    d = p[j] - p[i]
    t_ij = np.stack([cy * d[:, 0] + sy * d[:, 1],
                     -sy * d[:, 0] + cy * d[:, 1], d[:, 2]], 1)
    il = np.array([5, 20])
    jl = il + 30
    cyl, syl = np.cos(yaw[il]), np.sin(yaw[il])
    dl = p[jl] - p[il]
    t_l = np.stack([cyl * dl[:, 0] + syl * dl[:, 1],
                    -syl * dl[:, 0] + cyl * dl[:, 1], dl[:, 2]], 1)
    E = N - 1 + 2
    nodes = PoseGraphNodes(
        p=jnp.asarray(p_n, jnp.float32), yaw=jnp.asarray(yaw_n, jnp.float32),
        pitch=jnp.zeros(N, jnp.float32), roll=jnp.zeros(N, jnp.float32),
        valid=jnp.ones(N, bool),
    )
    edges = PoseGraphEdges(
        i=jnp.asarray(np.concatenate([i, il]), jnp.int32),
        j=jnp.asarray(np.concatenate([j, jl]), jnp.int32),
        t_ij=jnp.asarray(np.concatenate([t_ij, t_l]), jnp.float32),
        yaw_ij=jnp.asarray(
            np.concatenate([yaw[j] - yaw[i], yaw[jl] - yaw[il]]), jnp.float32
        ),
        weight=jnp.asarray(np.concatenate([np.ones(N - 1), [5.0, 5.0]]), jnp.float32),
        is_loop=jnp.asarray(np.concatenate([np.zeros(N - 1, bool), [True, True]])),
        valid=jnp.ones(E, bool),
    )
    out = optimize_4dof(nodes, edges, jnp.int32(1), iters=30)
    p_out = np.asarray(out.p)
    assert np.isfinite(p_out).all()
    # stays near the (noisy) input scale — no runaway
    assert np.abs(p_out - p).max() < 5.0, np.abs(p_out - p).max()
