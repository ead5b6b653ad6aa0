"""Distributed-BA scaling benchmark (weak scaling over a device mesh).

Runs the sharded global-BA step (svin_tpu.parallel.dist_ba) at mesh sizes
1..N with FIXED per-device load (landmarks + observations), measuring wall
time per Gauss-Newton iteration and reporting weak-scaling efficiency
t(1)/t(n) (ideal = 1.0). Also reports the analytic per-iteration
communication volume — one psum of the reduced camera system
(K·K·6·6 + K·6 floats) — which is the quantity that rides ICI on real
multi-chip hardware.

On a real TPU pod slice run it as-is (devices = real chips). On a
development host it forces a virtual CPU mesh; the timing then measures
host-core contention, NOT interconnect scaling — the printed efficiency is
only meaningful on real hardware. BASELINE.json target: >= 0.7 efficiency
from 1 host to N >= 2 hosts.

Usage:  python tools/bench_scaling.py [--per-device-landmarks 512]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__" and "--virtual" in sys.argv:
    # force a virtual CPU mesh (re-exec so env lands before jax import)
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            )
        os.execv(sys.executable, [sys.executable] + sys.argv)

import jax  # noqa: E402

if jax.__version__ and os.environ.get("JAX_PLATFORMS") == "cpu":
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def build_problem(key, K, L, O, dtype):
    """Random fixed-shape BA problem (timing-only: geometry need not be
    consistent — invalid projections zero their weights, the FLOPs and
    communication are identical)."""
    from svin_tpu.parallel import GlobalMapProblem

    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (K, 4), dtype)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return GlobalMapProblem(
        pose_r=jax.random.normal(ks[1], (K, 3), dtype),
        pose_q=q,
        pose_fixed=jnp.arange(K) < 2,
        lm=jax.random.normal(ks[2], (L, 3), dtype) + jnp.array([0, 0, 8.0], dtype),
        lm_valid=jnp.ones(L, bool),
        obs_uv=jax.random.uniform(ks[3], (O, 2), dtype, 0, 400),
        obs_pose=jax.random.randint(ks[4], (O,), 0, K, jnp.int32),
        # obs_lm laid out so each obs already lives on its landmark's shard
        obs_lm=(jnp.arange(O, dtype=jnp.int32) * L) // O,
        obs_cam=jnp.zeros(O, jnp.int32),
        obs_valid=jnp.ones(O, bool),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-landmarks", type=int, default=512)
    ap.add_argument("--per-device-obs", type=int, default=4096)
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--virtual", action="store_true",
        help="force an 8-device virtual CPU mesh (handled pre-import)",
    )
    ap.add_argument(
        "--pcg", action="store_true",
        help="use the matrix-free PCG solver (Cave/Bus-scale path) instead "
        "of the dense reduced solve — communication per CG iteration is one "
        "(K,6) psum instead of a (K·6)² psum per GN iteration",
    )
    ap.add_argument("--cg-iters", type=int, default=32)
    args = ap.parse_args()

    from svin_tpu.estimator import rig_params
    from svin_tpu.parallel import (
        bucket_problem,
        make_sharded_ba_bucketed,
        make_sharded_ba_pcg,
    )
    from svin_tpu.problems import euroc_like_rig

    dtype = jnp.float32
    rig_p = rig_params(euroc_like_rig(), dtype=dtype)
    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    K = args.poses
    results = []
    for n in sizes:
        L = args.per_device_landmarks * n
        O = args.per_device_obs * n
        mesh = Mesh(np.array(devs[:n]), ("data",))
        prob = build_problem(jax.random.PRNGKey(0), K, L, O, dtype)
        bprob = bucket_problem(prob)  # scatter-free (L,R) layout
        if args.pcg:
            step, shardings = make_sharded_ba_pcg(
                mesh, rig_p, K, L, iters=args.iters, cg_iters=args.cg_iters
            )
        else:
            step, shardings = make_sharded_ba_bucketed(
                mesh, rig_p, K, L, iters=args.iters
            )
        prob_dev = jax.device_put(bprob, shardings)
        out = step(prob_dev)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = step(prob_dev)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps / args.iters
        results.append((n, dt))
        if args.pcg:
            # assembly psum (K,6,6)+(K,6)·2 + one (K,6) psum per CG iter
            comm_floats = K * 36 + 2 * K * 6 + args.cg_iters * K * 6
        else:
            comm_floats = K * K * 36 + K * 6
        print(
            json.dumps(
                {
                    "mesh": n,
                    "landmarks": L,
                    "obs": O,
                    "s_per_gn_iter": round(dt, 6),
                    "weak_scaling_efficiency": round(results[0][1] / dt, 3),
                    "psum_bytes_per_iter": comm_floats * 4,
                }
            ),
            flush=True,
        )
    plat = devs[0].platform
    if plat == "cpu":
        print(
            "note: virtual CPU mesh — efficiency above measures host-core "
            "contention, not interconnect; run on a pod slice for the "
            "BASELINE >=0.7 check",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
