"""ATE evaluation CLI: Sim(3)/SE(3)-aligned trajectory error vs ground truth.

Usage:
  python -m svin_tpu.apps.evaluate <est_tum.txt> <gt_tum.txt> [--se3] [--max-dt S]

The evaluation protocol for the reference's COLMAP pseudo-ground-truth
(``colmap_groundtruth/README.md``: trajectories are accurate up to scale, so
ATE is reported after Sim(3) alignment; pass --se3 for metric ground truth
like EuRoC). Prints one JSON line.
"""
from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 2
    est, gt = argv[0], argv[1]
    with_scale = "--se3" not in argv
    max_dt = 0.02
    if "--max-dt" in argv:
        max_dt = float(argv[argv.index("--max-dt") + 1])

    from ..evaluation import associate, ate_rmse, load_tum, rpe

    t_e, p_e, q_e = load_tum(est)
    t_g, p_g, q_g = load_tum(gt)
    ie, ig = associate(t_e, t_g, max_dt)
    rmse, a = ate_rmse(p_e[ie], p_g[ig], with_scale=with_scale)
    out = {
        "ate_rmse": rmse,
        "n_pairs": int(len(ie)),
        "scale": a.scale,
        "alignment": "sim3" if with_scale else "se3",
    }
    # drift metric: RPE over 1 s (TUM protocol). Under Sim(3) alignment the
    # estimate is scale-corrected first — otherwise a perfect up-to-scale
    # trajectory (the COLMAP ground-truth case) would read as huge drift.
    out.update(
        rpe(t_e[ie], a.scale * p_e[ie], q_e[ie], p_g[ig], q_g[ig], delta_s=1.0)
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
