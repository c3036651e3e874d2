#!/usr/bin/env python
"""Boundary AP for COCO-format instance predictions.

CLI surface of the reference's
`/root/reference/model_training/tools/evaluate_coco_boundary_ap.py` (which
wraps the external boundary_iou API):

  python tools/evaluate_coco_boundary_ap.py \
      --gt-json-file GT.json --dt-json-file DT.json \
      [--iou-type boundary|segm] [--dilation-ratio 0.02]

GT is a COCO dataset json (images/annotations/categories); DT is a COCO
results list [{image_id, category_id, segmentation, score}]. Polygon
segmentations are rasterized through the repo codec. ``--iou-type segm``
falls back to plain mask AP (the reference's get_boundary=False path).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _to_rle(seg, h: int, w: int):
    from s2d_tpu.data import rle

    if isinstance(seg, dict):
        return seg
    return rle.encode(rle.polygons_to_mask(seg, h, w))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="s2d_tpu boundary AP")
    parser.add_argument("--gt-json-file", required=True)
    parser.add_argument("--dt-json-file", required=True)
    parser.add_argument("--iou-type", default="boundary",
                        choices=["boundary", "segm"])
    parser.add_argument("--dilation-ratio", default=0.02, type=float)
    args = parser.parse_args(argv)
    print(args)

    from s2d_tpu.evaluation.boundary import evaluate_detections_boundary
    from s2d_tpu.evaluation.ytvos_eval import evaluate_detections_masks

    with open(args.gt_json_file) as f:
        gt_json = json.load(f)
    with open(args.dt_json_file) as f:
        dt = json.load(f)

    size_of = {im["id"]: (im["height"], im["width"]) for im in gt_json["images"]}
    gts = []
    for a in gt_json["annotations"]:
        h, w = size_of[a["image_id"]]
        gts.append({
            "image_id": a["image_id"],
            "category_id": a["category_id"],
            "segmentation": _to_rle(a["segmentation"], h, w),
            "iscrowd": a.get("iscrowd", 0),
        })
    dts = []
    for d in dt:
        d = dict(d)
        d.pop("bbox", None)  # boundary AP scores the mask task only
        h, w = size_of[d["image_id"]]
        d["segmentation"] = _to_rle(d["segmentation"], h, w)
        dts.append(d)

    if args.iou_type == "boundary":
        metrics = evaluate_detections_boundary(
            gts, dts, dilation_ratio=args.dilation_ratio
        )
    else:
        metrics = evaluate_detections_masks(gts, dts)
    for k, v in metrics.items():
        print(f"{args.iou_type}/{k}: {100 * v:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
