#!/usr/bin/env python
"""Print AB_CONVERGENCE.md-style markdown rows from ab_convergence JSON
outputs (final .json or .partial)."""
import json
import sys

for path in sys.argv[1:]:
    with open(path) as f:
        results = json.load(f)
    print(f"### {path}")
    print("| arm | train loss first50 | mid50 | last50 | val naive-loss "
          "| val best-IoU | arm seconds |")
    print("|---|---|---|---|---|---|---|")
    for arm in ("naive", "iid", "lattice"):
        if arm not in results:
            continue
        r = results[arm]
        print(
            f"| {arm} | {r['loss_first50']:.2f} | {r['loss_mid']:.2f} | "
            f"{r['loss_last50']:.2f} | **{r['val_naive_loss']:.2f}** | "
            f"**{r['val_mean_best_iou']:.3f}** | {r['seconds']:.0f} |"
        )
    print()
