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
from svin_tpu.kinematics import Transformation, oplus, quaternion as quat

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


def test_landmark_prior_anchors_point(problem):
    """HomogeneousPointError analog: a strong 3-dim landmark position prior
    must pull that landmark's optimum toward the prior mean, and the
    assembled gradient must include the prior term (sign/assembly check via
    the b-vs-autodiff identity on the landmark block)."""
    window, factors, rig_p, truth = problem
    # baseline optimum without priors
    res0 = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    l0 = 3
    p_opt = np.asarray(res0.window.hp_W[l0, :3])
    target = p_opt + np.array([0.5, -0.3, 0.2])
    lp = factors.lm_prior
    factors2 = factors._replace(
        lm_prior=lp._replace(
            mean=lp.mean.at[l0].set(jnp.asarray(target, lp.mean.dtype)),
            sqrt_info=lp.sqrt_info.at[l0].set(
                jnp.eye(3, dtype=lp.sqrt_info.dtype) * 300.0
            ),
            valid=lp.valid.at[l0].set(True),
        )
    )
    res1 = optimize(window, factors2, rig_p, IMU_PARAMS, CFG)
    p_anchored = np.asarray(res1.window.hp_W[l0, :3])
    # the strong prior (σ≈3mm) dominates the handful of pixel observations
    assert np.linalg.norm(p_anchored - target) < 0.1, (p_anchored, target)
    assert np.linalg.norm(p_anchored - p_opt) > 0.3
    # other landmarks unaffected beyond numerical noise
    others = np.asarray(res1.window.hp_W[:, :3]) - np.asarray(
        res0.window.hp_W[:, :3]
    )
    others[l0] = 0
    lv = np.asarray(window.lm_valid)
    assert np.linalg.norm(others[lv], axis=1).max() < 0.05


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


def test_extrinsics_gradient_matches_autodiff(problem):
    """With online calibration on, the appended extrinsics coords of b must
    equal the autodiff gradient wrt minimal T_SC perturbations."""
    window, factors, rig_p, truth = problem
    cfg = CFG._replace(estimate_extrinsics=True)
    eqs = assemble(window, factors, rig_p, IMU_PARAMS, cfg)
    C = cfg.num_cameras
    D = cfg.state_dim
    assert eqs.H.shape == (cfg.full_dim, cfg.full_dim)
    np.testing.assert_allclose(eqs.H, eqs.H.T, atol=1e-8)

    def cost_of(de):
        d = de.reshape(C, 6)
        win = window._replace(
            ext_r=window.ext_r + d[:, :3],
            ext_q=quat.normalize(
                quat.multiply(quat.exp(d[:, 3:6]), window.ext_q)
            ),
        )
        return total_cost(win, factors, rig_p, IMU_PARAMS, cfg)

    g = jax.grad(cost_of)(jnp.zeros(C * 6))
    np.testing.assert_allclose(eqs.b[D:], g, rtol=2e-5, atol=1e-6)


def test_online_extrinsics_calibration(problem):
    """Reference online-calib mode (sigma_absolute_* > 0,
    Estimator.cpp:205-345): a miscalibrated T_SC with a loose absolute prior
    must be pulled back toward the true extrinsics by the reprojections."""
    window, factors, rig_p, truth = problem
    cfg = CFG._replace(estimate_extrinsics=True, max_iterations=10)
    # perturb camera-1 extrinsics: 15 mm translation + ~0.6° rotation
    dp = jnp.array([0.010, -0.008, 0.006])
    da = jnp.array([0.006, -0.005, 0.008])
    win_bad = window._replace(
        ext_r=window.ext_r.at[1].add(dp),
        ext_q=window.ext_q.at[1].set(
            quat.normalize(quat.multiply(quat.exp(da), window.ext_q[1]))
        ),
    )
    # loose prior centred at the (wrong) initial values — 5 cm / 3°
    ep = factors.ext_prior
    si = jnp.diag(jnp.concatenate([jnp.full(3, 1 / 0.05), jnp.full(3, 1 / 0.05)]))
    fac = factors._replace(
        ext_prior=ep._replace(
            mean_r=win_bad.ext_r,
            mean_q=win_bad.ext_q,
            sqrt_info=jnp.tile(si, (cfg.num_cameras, 1, 1)),
            valid=jnp.ones(cfg.num_cameras, bool),
        )
    )
    res = optimize(win_bad, fac, rig_p, IMU_PARAMS, cfg)
    # the observable component is the relative cam0→cam1 extrinsic (the
    # common mode trades off against the landmark field and is only weakly
    # excited by a short gentle trajectory — as in real camera-IMU calib)
    from svin_tpu.kinematics import compose, inverse

    def rel(w):
        T0 = Transformation(r=w.ext_r[0], q=w.ext_q[0])
        T1 = Transformation(r=w.ext_r[1], q=w.ext_q[1])
        return compose(inverse(T0), T1)

    rel_true = rel(window)
    rel0 = rel(win_bad)
    rel1 = rel(res.window)
    err0 = float(jnp.linalg.norm(rel0.r - rel_true.r))
    err1 = float(jnp.linalg.norm(rel1.r - rel_true.r))
    assert err0 > 0.01  # the perturbation was in the relative transform
    assert err1 < 0.3 * err0, (err0, err1)
    assert err1 < 4e-3, err1
    dq = quat.multiply(res.window.ext_q[1], quat.conjugate(window.ext_q[1]))
    ang1 = float(jnp.linalg.norm(quat.log(dq)))
    assert ang1 < 3e-3, ang1


def test_extrinsics_fixed_when_disabled(problem):
    window, factors, rig_p, truth = problem
    res = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    np.testing.assert_array_equal(
        np.array(res.window.ext_r), np.array(window.ext_r)
    )
    np.testing.assert_array_equal(
        np.array(res.window.ext_q), np.array(window.ext_q)
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


def test_marginalization_frees_orphaned_landmarks(problem):
    """A landmark whose observations have ALL been pruned must return its
    slot to the pool at the next marginalization (no slot leak)."""
    window, factors, rig_p, truth = problem
    from svin_tpu.estimator import marginalize_slot
    from svin_tpu.problems import IMU_PARAMS
    import svin_tpu.estimator as est

    f = factors.reproj
    lv = np.asarray(window.lm_valid)
    target = int(np.nonzero(lv)[0][0])
    # prune every observation of `target`
    new_valid = np.asarray(f.valid) & (np.asarray(f.lm_idx) != target)
    factors = factors._replace(reproj=f._replace(valid=jnp.asarray(new_valid)))
    w2, f2 = marginalize_slot(
        window, factors, jnp.int32(1), rig_p, IMU_PARAMS, CFG
    )
    assert not bool(w2.lm_valid[target]), "orphaned landmark slot not freed"
    # landmarks with live observations elsewhere survive
    alive = np.asarray(f2.reproj.lm_idx)[np.asarray(f2.reproj.valid)]
    assert np.asarray(w2.lm_valid)[np.unique(alive)].all()


def test_dynamic_iteration_budget_masks_updates(problem):
    """n_iters (the CeresIterationCallback timeLimit analog): a traced
    iteration budget must freeze the state after that many LM iterations —
    identical to a shorter static loop — without recompilation."""
    window, factors, rig_p, truth = problem
    res_full = optimize(window, factors, rig_p, IMU_PARAMS, CFG)
    res_b1 = optimize(
        window, factors, rig_p, IMU_PARAMS, CFG, n_iters=jnp.int32(1)
    )
    cfg1 = CFG._replace(max_iterations=1)
    res_static1 = optimize(window, factors, rig_p, IMU_PARAMS, cfg1)
    assert int(res_b1.iterations) <= 1
    np.testing.assert_allclose(
        np.asarray(res_b1.window.r), np.asarray(res_static1.window.r),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(float(res_b1.cost), float(res_static1.cost),
                               rtol=1e-6)
    # full budget (n_iters == max_iterations) reproduces the default path
    res_bmax = optimize(
        window, factors, rig_p, IMU_PARAMS, CFG,
        n_iters=jnp.int32(CFG.max_iterations),
    )
    np.testing.assert_allclose(
        np.asarray(res_bmax.window.r), np.asarray(res_full.window.r),
        rtol=1e-6, atol=1e-8,
    )
    # and the budgeted solve really stopped early (full run improves more)
    assert float(res_full.cost) <= float(res_b1.cost)
