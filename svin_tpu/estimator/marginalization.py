"""FEJ marginalization: fold one state slot (+ its exclusive landmarks) into
the dense marginal prior, then shift the window.

Re-designs the reference's ``MarginalizationError``
(``okvis_ceres/src/MarginalizationError.cpp``: addResidualBlock 126-397,
marginalizeOut 463-721 with the sparse landmark partition 557-619,
updateErrorComputation 725-758) as pure masked linear algebra on the
fixed-shape window:

1. evaluate every factor that touches the dropped slot at the *current*
   estimates (these become the prior's fixed linearization points),
2. Schur-eliminate landmarks observed **only** at the dropped slot (3x3
   block pseudo-inverses — the reference's landmark partition),
3. Schur-eliminate the dropped slot's 15 coords with an eigenvalue-clipped
   pseudo-inverse (the reference's pseudoInverseSymm),
4. add the result to the existing marginal prior (whose b is first shifted to
   the current linearization), and left-shift all slot-indexed arrays.

Observations of *surviving* landmarks at the dropped slot are discarded
(the reference's obsCount<2 drop path generalized: landmark info from the
marginalized frame is not folded, keeping the prior landmark-free and the
sparsity of the live problem intact).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..imu import ImuParameters
from .factors import (
    eval_depth,
    eval_imu,
    eval_priors,
    eval_reprojection,
    eval_sonar,
    marg_delta,
)
from .rig import RigParams
from .window import Factors, MarginalPrior, WindowConfig, WindowState


def _pinv_sym(A: jnp.ndarray, tol: float = None) -> jnp.ndarray:
    """Eigenvalue-clipped pseudo-inverse of a symmetric PSD matrix.

    Tolerance follows the reference's pseudoInverseSymm: machine epsilon ×
    dimension × largest eigenvalue (information spans ~1e2 velocity …
    ~1e11 bias-walk — a coarser relative cut zeroes real directions and
    biases the fold).

    The eigendecomposition runs on the diagonally equilibrated matrix
    Â = D⁻¹AD⁻¹ (D = sqrt(diag A)): in the shipped f32 precision an eigh
    across ~1e11 of dynamic range resolves small eigenvalues only to
    O(eps·λmax) ABSOLUTE error — real velocity/position information would
    be clipped to zero and the fold biased. Â is correlation-like (unit
    diagonal, cond ~1e2), where f32 is sufficient; A⁺ = D⁻¹Â⁺D⁻¹ is exact
    for the full-rank case and makes the rank cut per-coordinate-relative
    otherwise (zero-diagonal coords are genuinely empty rows).
    """
    n = A.shape[-1]
    if tol is None:
        tol = float(jnp.finfo(A.dtype).eps) * n
    A = 0.5 * (A + A.T)
    dg = jnp.diagonal(A)
    # rows whose diagonal is ~zero (or negative from f32 cancellation in an
    # upstream Schur step) carry no information: mask them out instead of
    # dividing by a tiny floor (which overflows the scaled matrix)
    # empty-row cut at 1e-15 RELATIVE: with bias-walk information reaching
    # ~1e11 the old 1e-13 cut was ~1e-2 absolute — only ~10x below the
    # smallest realistic information scale (~1e-1), so a slightly wider
    # real spread could zero a live coordinate out of the prior
    # (ADVICE r4 #4). 1e-15 keeps three orders of margin and the
    # equilibration divisors stay far above f32 denormals.
    good = dg > 1e-15 * jnp.maximum(jnp.max(jnp.maximum(dg, 0.0)), 1e-30)
    d = jnp.where(good, jnp.sqrt(jnp.where(good, dg, 1.0)), 1.0)
    gmask = good[:, None] & good[None, :]
    # PSD-consistent equilibrated entries satisfy |Ân| ≤ 1; the clamp only
    # bites on f32 cancellation junk that would otherwise skew the spectrum
    An = jnp.where(
        gmask, jnp.clip(A / (d[:, None] * d[None, :]), -8.0, 8.0), 0.0
    )
    w, V = jnp.linalg.eigh(An)
    w_max = jnp.maximum(jnp.max(w), 0.0)
    inv_w = jnp.where(w > tol * jnp.maximum(w_max, 1.0), 1.0 / w, 0.0)
    P = ((V * inv_w[None, :]) @ V.T) / (d[:, None] * d[None, :])
    return jnp.where(gmask, P, 0.0)


def _project_to_range(H: jnp.ndarray, b: jnp.ndarray):
    """PSD-clamp H and drop the null(H) component of b (in equilibrated
    coordinates); returns the consistent pair (H, b).

    The marginal prior is consumed as the quadratic 0.5·dmᵀHdm + bᵀdm
    (``assemble``/``total_cost``); that expression is bounded below ONLY
    when b ∈ range(H). Exact marginalization guarantees it, but the f32
    pseudo-inverse truncations leave a null-space residue in b — and LM
    then finds descent directions of arbitrarily negative "cost" along
    null(H), accepting divergent steps (measured: the shipped f32 path
    walked away at ~2 m/s with monotonically decreasing negative cost).
    The reference avoids this structurally by storing the prior in
    residual form e = e0 + JΔχ via an eigendecomposition that drops null
    directions (MarginalizationError::updateErrorComputation,
    MarginalizationError.cpp:725-758); this projection is the same
    operation expressed on (H, b).

    H is simultaneously clamped to PSD from the same eigendecomposition:
    the f32 Schur cancellation leaves slightly negative eigenvalues
    (~eps·λmax — up to ~1e5 in absolute terms at bias-walk information
    scales) along which 0.5·dmᵀHdm itself is a descent funnel.
    """
    dg = jnp.diagonal(H)
    # empty-row cut at 1e-15 RELATIVE: with bias-walk information reaching
    # ~1e11 the old 1e-13 cut was ~1e-2 absolute — only ~10x below the
    # smallest realistic information scale (~1e-1), so a slightly wider
    # real spread could zero a live coordinate out of the prior
    # (ADVICE r4 #4). 1e-15 keeps three orders of margin and the
    # equilibration divisors stay far above f32 denormals.
    good = dg > 1e-15 * jnp.maximum(jnp.max(jnp.maximum(dg, 0.0)), 1e-30)
    d = jnp.where(good, jnp.sqrt(jnp.where(good, dg, 1.0)), 1.0)
    gmask = good[:, None] & good[None, :]
    Hn = jnp.where(
        gmask, jnp.clip(H / (d[:, None] * d[None, :]), -8.0, 8.0), 0.0
    )
    w, V = jnp.linalg.eigh(0.5 * (Hn + Hn.T))
    tol = float(jnp.finfo(H.dtype).eps) * H.shape[-1]
    keep = w > tol * jnp.maximum(jnp.max(w), 1.0)
    w_psd = jnp.where(keep, w, 0.0)
    Hn_psd = (V * w_psd[None, :]) @ V.T
    H_out = jnp.where(gmask, Hn_psd * (d[:, None] * d[None, :]), 0.0)
    H_out = 0.5 * (H_out + H_out.T)
    bn = jnp.where(good, b / d, 0.0)  # empty-row gradients are pure null space
    b_out = jnp.where(
        good, d * (V @ (jnp.where(keep, 1.0, 0.0) * (V.T @ bn))), 0.0
    )
    return H_out, b_out


def _shift_rows(x: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """Delete row `slot` and shift the rest left; last row duplicates S-1
    (caller must invalidate it)."""
    S = x.shape[0]
    idx = jnp.arange(S)
    src = jnp.clip(idx + (idx >= slot), 0, S - 1)
    return x[src]


def marginalize_slot(
    window: WindowState,
    factors: Factors,
    slot: jnp.ndarray,
    rig: RigParams,
    imu_params: ImuParameters,
    cfg: WindowConfig,
) -> Tuple[WindowState, Factors]:
    """Fold state `slot` into the marginal prior and compact the window.

    When online extrinsics calibration is active (cfg.estimate_extrinsics)
    the folded observations' dependence on the still-uncertain T_SC
    (re.J_ext) is marginalized exactly: the prior spans the full
    state+extrinsics coords (cfg.full_dim) and the exclusive-landmark fold
    carries the [slot-pose | extrinsics] coupling through both Schur steps.
    With fixed extrinsics the extrinsics block stays identically zero.

    Note for the random-walk extrinsics mode (sigma_c_relative > 0,
    re-expressed as per-frame prior decay in VioEngine): the prior's
    extrinsics block is FEJ information like any other — the walk's
    information decay applies to the live ext_prior factor, not to
    already-marginalized information, matching the reference where folded
    RelativePoseError links stay in the MarginalizationError.
    """
    S, L, D = cfg.num_states, cfg.num_landmarks, cfg.state_dim
    C = cfg.num_cameras
    E = C * 6
    Dx = cfg.full_dim
    dtype = window.r.dtype
    slot = jnp.asarray(slot, jnp.int32)

    # ---------- 1. factor evaluations at current (FEJ) estimates ----------
    re = eval_reprojection(window, factors, rig, cfg)
    im = eval_imu(window, factors, imu_params)
    de = eval_depth(window, factors)
    so = eval_sonar(window, factors)
    pr = eval_priors(window, factors)

    s_idx = factors.reproj.state_idx
    l_idx = factors.reproj.lm_idx
    obs_at_slot = re.valid & (s_idx == slot)
    obs_elsewhere = re.valid & (s_idx != slot)
    n_elsewhere = jax.ops.segment_sum(
        obs_elsewhere.astype(jnp.int32), l_idx, num_segments=L
    )
    n_at_slot = jax.ops.segment_sum(
        obs_at_slot.astype(jnp.int32), l_idx, num_segments=L
    )
    lm_drop = window.lm_valid & (n_elsewhere == 0) & (n_at_slot > 0)
    # landmarks with NO live observation anywhere (all rows pruned or
    # truncated) are unconstrained dead weight: nothing to fold, but their
    # slots must return to the pool or the fixed-size landmark table leaks
    # one slot per pruned-out landmark until allocation fails
    lm_orphan = window.lm_valid & (n_elsewhere == 0) & (n_at_slot == 0)

    Hb = jnp.zeros((S, S, 15, 15), dtype)
    b = jnp.zeros((S, 15), dtype)

    # ---------- 2. exclusive-landmark fold (3x3 Schur) ----------
    # The folded observations couple {slot pose, (extrinsics), landmark}.
    # Stack the non-landmark coords as x = [slot-pose 6 | ext E] and reduce
    # the landmarks out of the joint (x, l) system.
    fold_o = obs_at_slot & lm_drop[l_idx]
    wf = jnp.where(fold_o, 1.0, 0.0)
    Jp = re.J_pose * wf[:, None, None]
    Jl = re.J_lm * wf[:, None, None]
    r = re.res * wf[:, None]
    if cfg.estimate_extrinsics:
        c_idx = factors.reproj.cam_idx
        oh_c = jax.nn.one_hot(c_idx, C, dtype=dtype)  # (O,C)
        Je = re.J_ext * wf[:, None, None]  # (O,2,6)
        Jef = (oh_c[:, None, :, None] * Je[:, :, None, :]).reshape(
            Je.shape[0], 2, E
        )
        Jx = jnp.concatenate([Jp, Jef], axis=2)  # (O,2,6+E)
    else:
        Jx = Jp  # (O,2,6)
    Hll = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jl, Jl), l_idx, num_segments=L
    )
    bl = jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jl, r), l_idx, num_segments=L)
    # coupling is only to x (exclusive landmarks) → reduce directly
    Wx = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jl, Jx), l_idx, num_segments=L
    )  # (L,3,X)
    Hll_inv = jax.vmap(_pinv_sym)(Hll)
    # all folded observations live at `slot`, so the x block is a plain sum
    Hxx_obs = jnp.einsum("oia,oib->ab", Jx, Jx)  # (X,X)
    bx_obs = jnp.einsum("oia,oi->a", Jx, r)
    Hxx_red = Hxx_obs - jnp.einsum("lab,lac,lcd->bd", Wx, Hll_inv, Wx)
    bx_red = bx_obs - jnp.einsum("lab,lac,lc->b", Wx, Hll_inv, bl)
    Hb = Hb.at[slot, slot, :6, :6].add(Hxx_red[:6, :6])
    b = b.at[slot, :6].add(bx_red[:6])
    # extrinsics rows/couplings are scattered after the (Dx,Dx) reshape below

    # ---------- IMU factors adjacent to the slot ----------
    i0 = jnp.arange(S - 1)
    i1 = i0 + 1
    touch = im.valid & ((i0 == slot) | (i1 == slot))
    wt = jnp.where(touch, 1.0, 0.0)
    J0 = im.J0 * wt[:, None, None]
    J1 = im.J1 * wt[:, None, None]
    ri = im.res * wt[:, None]
    Hb = Hb.at[i0, i0].add(jnp.einsum("kia,kib->kab", J0, J0))
    Hb = Hb.at[i0, i1].add(jnp.einsum("kia,kib->kab", J0, J1))
    Hb = Hb.at[i1, i0].add(jnp.einsum("kia,kib->kab", J1, J0))
    Hb = Hb.at[i1, i1].add(jnp.einsum("kia,kib->kab", J1, J1))
    b = b.at[i0].add(jnp.einsum("kia,ki->ka", J0, ri))
    b = b.at[i1].add(jnp.einsum("kia,ki->ka", J1, ri))

    # ---------- scalar + prior factors at the slot ----------
    at_slot = jnp.arange(S) == slot
    for ev in (de, so):
        w_s = jnp.where(at_slot & ev.valid, 1.0, 0.0)
        Jps = ev.J_p * w_s[:, None]
        rs = ev.res * w_s
        Hb = Hb.at[jnp.arange(S), jnp.arange(S), :3, :3].add(
            jnp.einsum("sa,sb->sab", Jps, Jps)
        )
        b = b.at[:, :3].add(Jps * rs[:, None])
    # pose priors at the slot are NOT folded — the reference drops the gauge
    # fixation instead of linearising it and re-fixes the new first pose
    # afterwards (Estimator.cpp:622-628 "avoids linearising initial pose
    # error", re-fixation at :799-812)
    redo_fixation = jnp.any(at_slot & factors.priors.pose_valid)
    ws_ = jnp.where(at_slot & pr.sb_valid, 1.0, 0.0)
    Jsb = pr.sb_J * ws_[:, None, None]
    Hb = Hb.at[jnp.arange(S), jnp.arange(S), 6:15, 6:15].add(
        jnp.einsum("sia,sib->sab", Jsb, Jsb)
    )
    b = b.at[:, 6:15].add(jnp.einsum("sia,si->sa", Jsb, pr.sb_res * ws_[:, None]))

    H_m = jnp.zeros((Dx, Dx), dtype)
    H_m = H_m.at[:D, :D].set(Hb.transpose(0, 2, 1, 3).reshape(D, D))
    b_m = jnp.zeros(Dx, dtype).at[:D].set(b.reshape(D))
    if cfg.estimate_extrinsics:
        # scatter the fold's extrinsics block + slot-pose↔extrinsics coupling
        erow = D + jnp.arange(E)
        prow = slot * 15 + jnp.arange(6)
        H_m = H_m.at[erow[:, None], erow[None, :]].add(Hxx_red[6:, 6:])
        H_m = H_m.at[prow[:, None], erow[None, :]].add(Hxx_red[:6, 6:])
        H_m = H_m.at[erow[:, None], prow[None, :]].add(Hxx_red[6:, :6])
        b_m = b_m.at[erow].add(bx_red[6:])

    # ---------- existing prior, re-centred at the current estimate ----------
    m = factors.marg
    mw = jnp.where(m.valid, 1.0, 0.0)
    dm = marg_delta(window, factors)
    H_m = H_m + mw * m.H
    b_m = b_m + mw * (m.b + m.H @ dm)

    # ---------- 3. Schur-eliminate the slot's 15 coords ----------
    key = jnp.where(jnp.arange(S) == slot, S, jnp.arange(S))
    perm_slots = jnp.argsort(key)  # kept slots in order, dropped slot last
    scols = (perm_slots[:, None] * 15 + jnp.arange(15)[None, :]).reshape(-1)
    # permuted order: kept state coords, extrinsics coords, dropped 15 last
    cperm = jnp.concatenate(
        [scols[: D - 15], D + jnp.arange(E), scols[D - 15 :]]
    )
    Hp = H_m[cperm][:, cperm]
    bp = b_m[cperm]
    K = Dx - 15
    A = Hp[:K, :K]
    B = Hp[:K, K:]
    Cb = Hp[K:, K:]
    C_inv = _pinv_sym(Cb)
    H_new = A - B @ C_inv @ B.T
    b_new = bp[:K] - B @ C_inv @ bp[K:]
    H_new = 0.5 * (H_new + H_new.T)
    # back to the canonical layout: kept states land at coords 0..(S-1)·15
    # (the window shift moves them left), extrinsics stay at D..Dx
    dest = jnp.concatenate([jnp.arange(D - 15), D + jnp.arange(E)])
    H_full = (
        jnp.zeros((Dx, Dx), dtype).at[dest[:, None], dest[None, :]].set(H_new)
    )
    b_full = jnp.zeros(Dx, dtype).at[dest].set(b_new)
    # keep the prior PSD and its gradient consistent with its information
    # matrix — cost boundedness for the LM accept test (_project_to_range)
    H_full, b_full = _project_to_range(H_full, b_full)

    # ---------- 4. shift window + factors ----------
    last_invalid = jnp.arange(S) < (S - 1)
    win2 = window._replace(
        r=_shift_rows(window.r, slot),
        q=_shift_rows(window.q, slot),
        speed_bias=_shift_rows(window.speed_bias, slot),
        state_valid=_shift_rows(window.state_valid, slot) & last_invalid,
        is_keyframe=_shift_rows(window.is_keyframe, slot) & last_invalid,
        timestamp=_shift_rows(window.timestamp, slot),
        state_id=jnp.where(
            last_invalid, _shift_rows(window.state_id, slot), -1
        ),
        lm_valid=window.lm_valid & ~lm_drop & ~lm_orphan,
    )

    # obs: drop at slot, re-index the rest
    f = factors.reproj
    new_sidx = f.state_idx - (f.state_idx > slot).astype(jnp.int32)
    obs_valid = f.valid & (f.state_idx != slot) & ~lm_drop[f.lm_idx]
    reproj2 = f._replace(state_idx=new_sidx, valid=obs_valid)

    # IMU links: new link j connects new states (j, j+1) = old states
    # (j+(j>=slot), j+1+(j+1>=slot)). For j<slot-1 that's old link j; for
    # j==slot-1 it bridges the removal (consumed into the prior → invalid);
    # for j>=slot it's old link j+1. Links whose source falls off the end
    # are invalid (eval_imu additionally masks by endpoint state validity).
    imf = factors.imu
    Sm1 = S - 1
    kidx = jnp.arange(Sm1)
    src_raw = kidx + (kidx >= slot).astype(jnp.int32)
    in_range = src_raw <= Sm1 - 1
    src = jnp.clip(src_raw, 0, Sm1 - 1)
    pre2 = jax.tree_util.tree_map(lambda a: a[src], imf.pre)
    valid2 = imf.valid[src] & in_range & (kidx != slot - 1)
    imu2 = imf._replace(pre=pre2, sqrt_info=imf.sqrt_info[src], valid=valid2)

    dep = factors.depth
    depth2 = dep._replace(
        depth=_shift_rows(dep.depth, slot),
        sqrt_info=_shift_rows(dep.sqrt_info, slot),
        valid=_shift_rows(dep.valid, slot) & last_invalid,
    )
    son = factors.sonar
    sonar2 = son._replace(
        range=_shift_rows(son.range, slot),
        target_W=_shift_rows(son.target_W, slot),
        sqrt_info=_shift_rows(son.sqrt_info, slot),
        valid=_shift_rows(son.valid, slot) & last_invalid,
    )
    pri = factors.priors
    priors2 = pri._replace(
        pose_mean_r=_shift_rows(pri.pose_mean_r, slot),
        pose_mean_q=_shift_rows(pri.pose_mean_q, slot),
        pose_sqrt_info=_shift_rows(pri.pose_sqrt_info, slot),
        pose_valid=_shift_rows(pri.pose_valid, slot) & last_invalid,
        sb_mean=_shift_rows(pri.sb_mean, slot),
        sb_sqrt_info=_shift_rows(pri.sb_sqrt_info, slot),
        sb_valid=_shift_rows(pri.sb_valid, slot) & last_invalid,
    )
    # gauge re-fixation (reference Estimator.cpp:799-812): fresh prior on the
    # new oldest pose at its current estimate — position + yaw only
    # (information 1e14 → sqrt 1e7), roll/pitch left free
    gauge_si = jnp.diag(
        jnp.asarray([1e7, 1e7, 1e7, 0.0, 0.0, 1e7], dtype)
    )
    priors2 = priors2._replace(
        pose_mean_r=jnp.where(
            redo_fixation, priors2.pose_mean_r.at[0].set(win2.r[0]),
            priors2.pose_mean_r,
        ),
        pose_mean_q=jnp.where(
            redo_fixation, priors2.pose_mean_q.at[0].set(win2.q[0]),
            priors2.pose_mean_q,
        ),
        pose_sqrt_info=jnp.where(
            redo_fixation, priors2.pose_sqrt_info.at[0].set(gauge_si),
            priors2.pose_sqrt_info,
        ),
        pose_valid=jnp.where(
            redo_fixation, priors2.pose_valid.at[0].set(True),
            priors2.pose_valid,
        ),
    )

    marg2 = MarginalPrior(
        H=H_full,
        b=b_full,
        lin_r=win2.r,
        lin_q=win2.q,
        lin_sb=win2.speed_bias,
        lin_ext_r=win2.ext_r,
        lin_ext_q=win2.ext_q,
        valid=jnp.asarray(True),
    )
    factors2 = factors._replace(
        reproj=reproj2, imu=imu2, depth=depth2, sonar=sonar2,
        priors=priors2, marg=marg2,
    )
    return win2, factors2
