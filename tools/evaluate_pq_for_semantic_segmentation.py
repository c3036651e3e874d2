#!/usr/bin/env python
"""PQ + mIoU for semantic-segmentation predictions.

CLI surface of the reference's
`/root/reference/model_training/tools/evaluate_pq_for_semantic_segmentation.py`:

  python tools/evaluate_pq_for_semantic_segmentation.py \
      --dataset-name ade20k_sem_seg_val --json-file preds.json

The json is the semantic results format the evaluator writes:
[{file_name, category_id, segmentation (RLE)}] — each entry paints its
category onto the prediction map. Ground truth comes from the registered
sem-seg dataset's label PNGs (s2d_tpu.data.image_datasets registry; any
name registered via register_sem_seg works, not just the builtins).
Prints the PQ/SQ/RQ table and mIoU like the reference.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Evaluate PQ for semantic segmentation.")
    parser.add_argument("--dataset-name", default="ade20k_sem_seg_val")
    parser.add_argument("--json-file", required=True)
    args = parser.parse_args(argv)

    import cv2

    from s2d_tpu.data import rle
    from s2d_tpu.data.image_datasets import get_sem_seg_dataset
    from s2d_tpu.evaluation.pq import (
        PQStat,
        accumulate_confusion,
        miou_from_confusion,
        pq_single_image,
    )

    with open(args.json_file) as f:
        predictions = json.load(f)

    by_stem = defaultdict(list)
    for p in predictions:
        stem = os.path.basename(p["file_name"]).rsplit(".", 1)[0]
        by_stem[stem].append(p)

    dicts, meta = get_sem_seg_dataset(args.dataset_name)
    num_classes, ignore = meta["num_classes"], meta["ignore_label"]
    conf = np.zeros((num_classes + 1, num_classes + 1), np.int64)
    pq_stat = PQStat()

    scored = 0
    for rec in dicts:
        stem = os.path.basename(rec["sem_seg_file_name"]).rsplit(".", 1)[0]
        if stem not in by_stem:
            continue
        gt = cv2.imread(rec["sem_seg_file_name"], cv2.IMREAD_GRAYSCALE)
        if gt is None:
            continue
        gt = gt.astype(np.int64)
        # unpainted pixels count as class-0 PREDICTIONS (reference tool
        # line 184: `segm_dt = np.zeros_like(segm_gt)`) — initializing to
        # ignore would exempt uncovered pixels from FP/mIoU and inflate
        # scores for sparse predictions
        dt = np.zeros_like(gt)
        for p in by_stem[stem]:
            m = rle.decode(p["segmentation"]).astype(bool)
            dt[m] = p["category_id"]
        pq_stat += pq_single_image(gt, dt, ignore)
        accumulate_confusion(gt, dt, num_classes, ignore, conf)
        scored += 1

    if not scored:
        print("no predictions matched the dataset's images", file=sys.stderr)
        return 1

    res = pq_stat.average()
    print("{:10s}| {:>5s}  {:>5s}  {:>5s} {:>5s}".format("", "PQ", "SQ", "RQ", "N"))
    print("-" * (10 + 7 * 4))
    print("{:10s}| {:5.1f}  {:5.1f}  {:5.1f} {:5d}".format(
        "All", 100 * res["pq"], 100 * res["sq"], 100 * res["rq"], res["n"]))
    print(f"\nmIoU: {miou_from_confusion(conf)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
