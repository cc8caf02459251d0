"""A/B the 3D->2D bf16 attention flag on the learning-quality study
(VERDICT r4 weak #1: test_learning went red at trained adj_auc=0.478 after
the 5e8a8b7 bf16 leak-trim; nobody knew whether bf16 degraded learning or
the seeded toy threshold is brittle — this script answers that).

Runs the exact tests/test_learning.py configuration under each arm and
seed, prints one JSON line per run, and a summary table.

Usage:  JAX_PLATFORMS=cpu python benchmarks/bf16_quality_ab.py [seeds...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ARMS = {
    "bf16_attn": {},                              # r4 default (suspect)
    "f32_attn": {"bf16_attn_3dto2d": False},      # pre-5e8a8b7 3D->2D math
}


def main():
    from benchmarks.quality import run_study

    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    rows = []
    for seed in seeds:
        for arm, overrides in ARMS.items():
            t0 = time.time()
            res = run_study(n_mols=48, n_max=8, emb_dim=32,
                            steps=int(os.environ.get("AB_STEPS", 300)),
                            batch_size=16, eval_mols=6, num_repeat=6,
                            sample_steps=150, seed=seed,
                            auc_eval_mols=int(os.environ.get(
                                "AB_AUC_EVAL_MOLS", 0)) or None,
                            cfg_overrides=overrides, log=lambda *a: None)
            row = {"arm": arm, "seed": seed,
                   "secs": round(time.time() - t0, 1),
                   "adj_auc": round(res["trained"]["adj_auc"], 4),
                   "adj_auc_un": round(res["untrained"]["adj_auc"], 4),
                   "heldout_adj_auc": round(
                       res["trained"]["heldout_adj_auc"], 4),
                   "mat": round(res["trained"]["mat"], 4),
                   "heldout_mat": round(res["trained"]["heldout_mat"], 4),
                   "mat_un": round(res["untrained"]["mat"], 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print("\narm        seed  adj_auc  held_auc   mat    held_mat")
    for r in rows:
        print(f"{r['arm']:<10s} {r['seed']:>4d}  {r['adj_auc']:.4f}  "
              f"{r['heldout_adj_auc']:.4f}  {r['mat']:.4f}  "
              f"{r['heldout_mat']:.4f}")


if __name__ == "__main__":
    main()
