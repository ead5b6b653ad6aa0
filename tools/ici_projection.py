"""Analytic ICI weak-scaling projection for the sharded PCG global BA
(VERDICT r3 weak #5 / next #9).

Multi-chip hardware is unreachable from this harness (one tunneled chip;
the 8-device virtual CPU mesh measures host-core contention, see
artifacts/README.md). This model substitutes structure for the missing
measurement: it takes the MEASURED 1-chip GN-iteration time as the
compute anchor and prices the per-GN-iteration collectives against
public ICI figures, projecting weak-scaling efficiency for the BASELINE
>=0.7 target.

Collective inventory per GN iteration of make_sharded_ba_pcg
(tools/bench_scaling.py:134, parallel/pcg.py) at the anchor shapes
(K=64 poses, cg_iters=32):
  - reduced-system assembly: one (K,6,6) + two (K,6) psums
  - one (K,6) psum per CG iteration (32 of them)
  => 34 collectives, 61,440 bytes total per GN iteration (the recorded
     ``psum_bytes_per_iter``). Landmark Schur elimination, residual and
     Jacobian evaluation, and the block-Jacobi preconditioner are all
     shard-local by construction — nothing else crosses chips.

Model (weak scaling: per-chip landmark/observation load fixed, pose
vector replicated):

  t_n   = t_1 + n_coll * latency + bytes_total * 2*(n-1)/n / bw_link
  eff_n = t_1 / t_n          (t_1 = measured 1-chip GN iteration)

At 61 KB/GN-iter the wire term is ~1-3 us — per-collective LAUNCH
LATENCY dominates, so efficiency is nearly n-independent on a ring and
the sweep below varies latency 10-50 us (the conservative range for
small XLA all-reduces; no compute/collective overlap is assumed, though
XLA can overlap the CG psum with the next matvec's local work).
"""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# public per-chip ICI figures (one-way per-link bandwidth, bytes/s):
# v5e 4.5e10 (45 GB/s x 4 links = 1600 Gbit/s aggregate), v5p 9e10.
ICI = {
    "v5e": {"bw_link": 4.5e10, "links": 4},
    "v5p": {"bw_link": 9.0e10, "links": 6},
}


def project(t1_s: float, n_coll: int, bytes_total: int, chip: str,
            lat_s: float, n: int):
    bw = ICI[chip]["bw_link"]
    t_coll = n_coll * lat_s + 2.0 * bytes_total * (n - 1) / n / bw
    eff = t1_s / (t1_s + t_coll)
    return t_coll, eff


def main():
    anchor_path = os.path.join(REPO, "artifacts", "SCALING_tpu_1chip_pcg.json")
    with open(anchor_path) as f:
        anchor = json.load(f)
    CG = 32  # bench_scaling --cg-iters default used for the anchor row
    N_COLL = CG + 2  # one psum per CG iter + assembly (H, b fused as 2)
    B = anchor["psum_bytes_per_iter"]  # total bytes per GN iteration
    t1 = anchor["s_per_gn_iter"]
    rows = []
    for chip in ("v5e", "v5p"):
        for lat in (1e-5, 2.5e-5, 5e-5):
            for n in (2, 4, 8, 16, 64, 256):
                t_coll, eff = project(t1, N_COLL, B, chip, lat, n)
                rows.append({
                    "chip": chip, "n_chips": n, "latency_us": lat * 1e6,
                    "t_collective_us_per_gn_iter": round(t_coll * 1e6, 1),
                    "projected_weak_scaling_efficiency": round(eff, 3),
                })
    # break-even: per-collective latency budget that still meets 0.7
    budget_total_us = t1 * (1 / 0.7 - 1) * 1e6
    budget_per_coll_us = budget_total_us / N_COLL
    # Cave-scale wire-time sanity note (K=2048: 32x the bytes)
    b_cave = B * (2048 // anchor.get("poses", 64) if "poses" in anchor else 32)
    wire_cave_us = 2.0 * b_cave / ICI["v5e"]["bw_link"] * 1e6
    out = {
        "what": (
            "Analytic ICI weak-scaling projection for the sharded PCG "
            "global BA (the measurement a single tunneled chip cannot "
            "provide). Compute anchor = MEASURED 1-chip GN iteration "
            "(3.07 ms at 512 lm / 4096 obs per shard, 64 poses, 32 CG "
            "iters). Only the reduced (K,6) camera system crosses chips "
            "(34 small psums, 61 KB total per GN iteration); landmarks, "
            "observations, Schur elimination and preconditioner are "
            "shard-local by construction (parallel/pcg.py)."
        ),
        "anchor": anchor,
        "collectives_per_gn_iter": N_COLL,
        "bytes_total_per_gn_iter": B,
        "model": (
            "eff = t_1 / (t_1 + n_coll*latency + bytes*2*(n-1)/n/bw_link)"
        ),
        "assumptions": [
            "weak scaling: per-shard landmark/observation load fixed",
            "ring all-reduce over ICI, one link pair (conservative: "
            "multi-link halves the already-negligible wire time)",
            "per-collective launch latency swept 10-50 us — it dominates "
            "the ~1-3 us wire time at 61 KB, making efficiency nearly "
            "n-independent on a ring",
            "no overlap of collectives with compute (conservative: XLA "
            "can overlap the CG psum with the next matvec's local work)",
        ],
        "latency_budget_us_per_collective_for_0p7": round(
            budget_per_coll_us, 1
        ),
        "cave_scale_note": (
            "At Cave scale (K=2048, 32x the reduced-system bytes: ~2 MB "
            "per GN iteration) the ring wire time is still only "
            f"~{wire_cave_us:.0f} us against a Cave-scale compute step "
            "that is ~100x the anchor's — the collective fraction "
            "SHRINKS as K grows because compute is O(obs) while traffic "
            "is O(K)."
        ),
        "projection": rows,
        "conclusion": (
            "At the measured anchor the BASELINE >=0.7 weak-scaling "
            "target holds on v5e for per-collective latency up to "
            f"~{budget_per_coll_us:.0f} us — comfortably above typical "
            "small-all-reduce latency — and is nearly independent of "
            "chip count. The virtual-mesh rows (0.45-0.12, "
            "SCALING_virtual_pcg.json) measure 8 virtual devices "
            "contending for 2 host cores and do not bear on ICI."
        ),
    }
    path = os.path.join(REPO, "artifacts", "ICI_PROJECTION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "wrote": path,
        "latency_budget_us_per_collective": round(budget_per_coll_us, 1),
        "eff_v5e_25us_n8": next(
            r["projected_weak_scaling_efficiency"] for r in rows
            if r["chip"] == "v5e" and r["n_chips"] == 8
            and r["latency_us"] == 25.0
        ),
    }))


if __name__ == "__main__":
    main()
