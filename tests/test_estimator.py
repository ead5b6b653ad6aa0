"""Sliding-window estimator tests — the analog of the reference's
``okvis_ceres/test/TestEstimator.cpp`` synthetic-trajectory convergence test
plus ``TestMarginalization.cpp``: LM convergence on a noisy stereo+IMU window
problem, cost monotonicity, masked-slot invariance, and marginalization
consistency.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svin_tpu.estimator import (
    WindowConfig,
    assemble,
    marginalize_slot,
    optimize,
    total_cost,
)
from svin_tpu.kinematics import oplus, quaternion as quat

from helpers import IMU_PARAMS, build_problem, pose_errors

CFG = WindowConfig(num_states=6, num_landmarks=96, num_obs=1024, max_iterations=8)


@pytest.fixture(scope="module")
def problem():
    return build_problem(jax.random.PRNGKey(7), CFG)


def test_assemble_shapes_and_symmetry(problem):
    window, factors, rig_p, truth = problem
    eqs = assemble(window, factors, rig_p, IMU_PARAMS, CFG)
    D = CFG.state_dim
    assert eqs.H.shape == (D, D)
    np.testing.assert_allclose(eqs.H, eqs.H.T, atol=1e-8)
    assert bool(jnp.isfinite(eqs.cost))


def test_gradient_matches_autodiff(problem):
    """b must equal the gradient of the robustified total cost wrt minimal
    coords — this validates every analytic Jacobian + assembly sign at once.
    (IRLS Gauss-Newton b uses weight ρ'; d/dδ of ρ(s(δ)) gives exactly ρ'·Jᵀr.)
    """
    window, factors, rig_p, truth = problem
    eqs = assemble(window, factors, rig_p, IMU_PARAMS, CFG)
    S = CFG.num_states

    def cost_of(delta):
        d = delta.reshape(S, 15)
        win = window._replace(
            r=window.r + d[:, :3],
            q=quat.normalize(
                quat.multiply(quat.exp(d[:, 3:6]), window.q)
            ),
            speed_bias=window.speed_bias + d[:, 6:15],
        )
        return total_cost(win, factors, rig_p, IMU_PARAMS, CFG)

    g = jax.grad(cost_of)(jnp.zeros(CFG.state_dim))
    np.testing.assert_allclose(eqs.b, g, rtol=2e-5, atol=1e-6)


def test_landmark_gradient_matches_autodiff(problem):
    window, factors, rig_p, truth = problem
    eqs = assemble(window, factors, rig_p, IMU_PARAMS, CFG)
    L = CFG.num_landmarks

    def cost_of(dl):
        win = window._replace(hp_W=window.hp_W.at[:, :3].add(dl))
        return total_cost(win, factors, rig_p, IMU_PARAMS, CFG)

    g = jax.grad(cost_of)(jnp.zeros((L, 3)))
    np.testing.assert_allclose(eqs.bl, g, rtol=2e-5, atol=1e-6)


def test_convergence_to_ground_truth(problem):
    """Reference thresholds (TestEstimator.cpp:209-212): translation < 0.1,
    rotation < 1e-2, speed/bias < 0.04."""
    window, factors, rig_p, truth = problem
    res = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    assert float(res.cost) < float(res.cost0)
    S = CFG.num_states
    dr, dq = pose_errors(res.window, truth, S)
    assert dr.max() < 0.05, dr
    assert dq.max() < 5e-3, dq
    dsb = np.abs(np.array(res.window.speed_bias[:S]) - np.array(truth["sb"]))
    assert dsb.max() < 0.04, dsb.max()
    # landmark quality populated for landmarks that have observations
    q = np.array(res.window.lm_quality)
    n_obs_per_lm = np.zeros(CFG.num_landmarks, int)
    np.add.at(
        n_obs_per_lm,
        np.array(factors.reproj.lm_idx)[np.array(factors.reproj.valid)],
        1,
    )
    observed = np.array(res.window.lm_valid) & (n_obs_per_lm >= 2)
    assert (q[observed] > 0).all()


def test_invalid_slots_untouched(problem):
    window, factors, rig_p, truth = problem
    res = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    S = CFG.num_states
    Smax = window.r.shape[0]
    if Smax > S:
        np.testing.assert_array_equal(
            np.array(res.window.r[S:]), np.array(window.r[S:])
        )


def test_marginalization_keeps_estimates_consistent(problem):
    """Marginalize slot 0 after convergence; re-optimization must not move
    the remaining states materially (the prior replaces the dropped factors)."""
    window, factors, rig_p, truth = problem
    res = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    win2, fac2 = marginalize_slot(
        res.window, factors, jnp.int32(0), rig_p, IMU_PARAMS, CFG
    )
    S = CFG.num_states
    # shifted bookkeeping
    assert bool(win2.state_valid[S - 2]) and not bool(win2.state_valid[S - 1])
    np.testing.assert_allclose(
        np.array(win2.r[: S - 1]), np.array(res.window.r[1:S]), atol=1e-12
    )
    # re-optimize: states should stay put (within noise-level tolerances)
    res2 = optimize(win2, fac2, rig_p, IMU_PARAMS, CFG)
    dr = np.linalg.norm(
        np.array(res2.window.r[: S - 1]) - np.array(res.window.r[1:S]), axis=1
    )
    assert dr.max() < 0.02, dr
    # the marginal prior must be active and PSD
    assert bool(fac2.marg.valid)
    evs = np.linalg.eigvalsh(np.array(fac2.marg.H))
    assert evs.min() > -1e-6 * max(evs.max(), 1.0), (evs.min(), evs.max())


def test_marginalization_prior_constrains_gauge(problem):
    """After marginalizing the gauge-prior state, the remaining window must
    still be fully constrained (no gauge drift): perturb state 0 of the new
    window and check the optimizer pulls it back."""
    window, factors, rig_p, truth = problem
    res = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    win2, fac2 = marginalize_slot(
        res.window, factors, jnp.int32(0), rig_p, IMU_PARAMS, CFG
    )
    r_ref = np.array(win2.r[0])
    T0 = win2.pose(0)
    T0p = oplus(T0, jnp.array([0.05, -0.05, 0.03, 0.02, -0.02, 0.01]))
    win_pert = win2._replace(
        r=win2.r.at[0].set(T0p.r), q=win2.q.at[0].set(T0p.q)
    )
    res2 = optimize(win_pert, fac2, rig_p, IMU_PARAMS, CFG)
    assert np.linalg.norm(np.array(res2.window.r[0]) - r_ref) < 0.02
