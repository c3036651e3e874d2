#!/usr/bin/env python
"""Round-2 self-distillation converter — CLI surface of the reference's
`keymask_ident/convert_results_to_annotations.py`:

  python tools/convert_results_to_annotations.py \
      --results OUTPUT/results.json --gt-json datasets/.../instances.json \
      --output round2_annotations.json [--score-threshold 0.75]

Filters predictions by score, recomputes bbox/area from the RLEs, and
grafts the gt video metadata so the output is a YTVIS training-annotation
file for the next self-distillation round.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True)
    parser.add_argument("--gt-json", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--score-threshold", type=float, default=0.75)
    args = parser.parse_args(argv)

    from s2d_tpu.keymask import convert_results_to_annotations

    with open(args.results) as f:
        results = json.load(f)
    with open(args.gt_json) as f:
        gt = json.load(f)

    out = convert_results_to_annotations(
        results, gt["videos"], score_threshold=args.score_threshold
    )
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(
        f"wrote {len(out['annotations'])} annotations over "
        f"{len(out['videos'])} videos -> {args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
