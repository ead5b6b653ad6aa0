"""Benchmark: per-frame compute path latency on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: sliding-window optimize (assemble + Schur + LM loop) for a
full window (8 states, 256 landmarks, 2048 observations) — the reference's
real-time envelope budgets 0.035 s for matching + optimization per frame on
a laptop CPU (config_stereorig_v2.yaml:83-85, CeresIterationCallback).
``vs_baseline`` = 0.035 s / measured seconds (>1 means faster than the
reference's real-time budget).

Extra detail metrics go to stderr so the driver-parsed stdout stays a single
JSON line.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the remote-TPU compile service is the slowest
# and most variable part of a fresh-process run (minutes for the unrolled
# LM program); cache compiled executables across invocations.
os.makedirs(os.path.expanduser("~/.cache/jax_compcache"), exist_ok=True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_BUDGET_S = 0.035


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


def main():
    from svin_tpu.estimator import WindowConfig, optimize
    from svin_tpu.ops import hamming
    from svin_tpu.problems import IMU_PARAMS, build_window_problem

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cfg = WindowConfig(
        num_states=8, num_landmarks=256, num_obs=2048, max_iterations=5,
        unroll=True,
    )
    window, factors, rig_p, _ = build_window_problem(
        jax.random.PRNGKey(0), cfg, n_landmarks=128, dtype=dtype
    )

    step = jax.jit(lambda w, f: optimize(w, f, rig_p, IMU_PARAMS, cfg).window.r)
    t_opt = time_fn(step, window, factors, iters=200)

    # matching kernel: 400 x 512 descriptors (one frame vs the landmark map)
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    da = jax.random.randint(ka, (512, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    db = jax.random.randint(kb, (512, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    match_fn = jax.jit(hamming.hamming_matrix)
    t_match = time_fn(match_fn, da, db)

    # frontend detail (EuRoC-resolution detect + describe; not part of the
    # headline metric, which tracks the reference's matching+optimize budget)
    from svin_tpu.ops import descriptor as desc_ops, detection

    img = jax.random.uniform(jax.random.PRNGKey(2), (480, 752), jnp.float32)
    det_fn = jax.jit(lambda im: detection.detect(im, max_keypoints=400))
    t_det = time_fn(det_fn, img)
    kp = det_fn(img)
    desc_fn = jax.jit(
        lambda im, u, a, v: desc_ops.describe(im, u, a, v)
    )
    t_desc = time_fn(desc_fn, img, kp.uv, kp.angle, kp.valid)

    # batched stereo frontend: both cameras in ONE program (the engine path)
    from svin_tpu.pipeline.vio import _frontend_batch

    imgs2 = jnp.stack([img, img])
    g2 = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    fb = lambda a, b: _frontend_batch(
        a, b, max_keypoints=400, octaves=0,
        histogram_method="NONE", clahe_clip_limit=1.0,
    )[1]
    t_front2 = time_fn(fb, imgs2, g2)

    # global bundle adjustment: GN iterations/s on one chip (the BASELINE
    # "BA iters/s" headline) — 64 poses, 4096 landmarks, 16384 obs slots
    from svin_tpu.parallel import dist_ba
    from svin_tpu.problems import build_global_ba_problem

    BA_ITERS = 10
    prob, ba_rig = build_global_ba_problem(
        jax.random.PRNGKey(3), K=64, L=4096, O=16384, dtype=jnp.float32
    )
    bprob = dist_ba.bucket_problem(prob)  # scatter-free (L,R) layout
    ba_fn = jax.jit(lambda p: dist_ba.ba_solve_bucketed(p, ba_rig, iters=BA_ITERS)[1])
    t_ba = time_fn(ba_fn, bprob, iters=20) / BA_ITERS

    t_frame = t_opt + t_match
    # stereo per-frame estimate: batched 2-cam frontend + match + optimize
    t_e2e = t_front2 + t_match + t_opt
    print(
        f"detail: optimize {t_opt*1e3:.3f} ms, matching {t_match*1e3:.3f} ms, "
        f"detect {t_det*1e3:.3f} ms, describe {t_desc*1e3:.3f} ms, "
        f"stereo-batched frontend {t_front2*1e3:.3f} ms, "
        f"stereo-frame e2e {t_e2e*1e3:.3f} ms ({1.0/t_e2e:.0f} fps; reference "
        f"sustains 20 Hz stereo), "
        f"global BA (64 kf, 4096 lm) {1.0/t_ba:.0f} GN iters/s, "
        f"device {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "window_matching_plus_optimize_latency",
                "value": round(t_frame * 1e3, 3),
                "unit": "ms",
                "vs_baseline": round(REFERENCE_BUDGET_S / t_frame, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
