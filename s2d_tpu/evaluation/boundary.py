"""Boundary IoU + Boundary AP (Cheng et al., CVPR 2021) — from scratch.

The reference scores boundary AP via the external ``boundary_iou`` API
(`/root/reference/model_training/tools/evaluate_coco_boundary_ap.py`),
whose published definition is:

  * boundary(M, d): the set of pixels of mask M within distance d of its
    contour, computed as ``M & ~erode(M, d)`` with a 3x3 erosion applied
    ``d = round(dilation_ratio * sqrt(H^2 + W^2))`` times (the mask is
    padded by one pixel first so image-border pixels count as boundary).
  * Boundary IoU(G, P) = |bd(G) & bd(P)| / |bd(G) | bd(P)|.
  * Boundary AP evaluates with IoU = min(mask IoU, boundary IoU), so a
    detection must be right both region-wise and along its contour.

This module re-derives all three on the repo's RLE codec + cv2 and plugs
into the generic COCO accumulator (`ytvos_eval._evaluate_generic`) via its
``iou_fn`` hook.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..data import rle as rle_codec
from .ytvos_eval import _evaluate_generic, detection_to_track


def mask_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02) -> np.ndarray:
    """Boundary region of a binary mask (bool (H, W) -> bool (H, W))."""
    import cv2

    h, w = mask.shape
    d = max(1, int(round(dilation_ratio * np.sqrt(h * h + w * w))))
    padded = np.pad(mask.astype(np.uint8), 1)
    kernel = np.ones((3, 3), np.uint8)
    eroded = cv2.erode(padded, kernel, iterations=d)[1:-1, 1:-1]
    return mask & (eroded == 0)


def boundary_iou(
    gt_mask: np.ndarray, dt_mask: np.ndarray, dilation_ratio: float = 0.02
) -> float:
    gb = mask_to_boundary(gt_mask, dilation_ratio)
    db = mask_to_boundary(dt_mask, dilation_ratio)
    union = (gb | db).sum()
    return float((gb & db).sum() / union) if union else 0.0


def evaluate_detections_boundary(
    gt_annotations: List[dict],
    predictions: List[dict],
    use_cats: bool = True,
    dilation_ratio: float = 0.02,
) -> Dict[str, float]:
    """COCO-style boundary AP over image detections.

    Entries: {image_id, category_id, segmentation (RLE dict), score?}.
    Matching IoU is min(mask IoU, boundary IoU) per the Boundary AP
    definition; everything else (thresholds, area ranges, maxDets) is the
    standard accumulator.
    """

    to_track = detection_to_track

    def iou_fn(d_segs: Sequence, g_segs: Sequence) -> float:
        d, g = d_segs[0], g_segs[0]
        if d is None or g is None:
            return 0.0
        inter, union = rle_codec.iou_intersection_union(d, g)
        mask_iou = inter / union if union else 0.0
        if mask_iou == 0.0:
            return 0.0  # boundary IoU can't rescue a zero-overlap pair
        return min(
            mask_iou,
            boundary_iou(
                rle_codec.decode(g).astype(bool),
                rle_codec.decode(d).astype(bool),
                dilation_ratio,
            ),
        )

    gts = [to_track(g) for g in gt_annotations]
    dts = [to_track(d) for d in predictions]
    return _evaluate_generic(gts, dts, use_cats, iou_fn=iou_fn)
