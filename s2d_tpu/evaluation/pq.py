"""Panoptic Quality for semantic-segmentation label maps — from scratch.

Rebuild of the reference's PQ-for-semseg tool
(`/root/reference/model_training/tools/evaluate_pq_for_semantic_segmentation.py`),
which adapts the public panopticapi: each semantic class present in a label
map is treated as one segment, segments match when IoU > 0.5, and

  PQ = sum(matched IoU) / (TP + FP/2 + FN/2),  SQ = PQ/RQ,  RQ = TP / ...

Here the per-image confusion is one vectorized ``np.unique`` over the
joint (gt * K + pred) encoding instead of the reference's python dict
walk; the math is identical. mIoU over the same confusion matrix comes
for free and mirrors the reference's conf_matrix block.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, Tuple

import numpy as np


@dataclasses.dataclass
class CatStat:
    iou: float = 0.0
    tp: int = 0
    fp: int = 0
    fn: int = 0


class PQStat:
    """Per-category PQ accumulator (public panopticapi semantics)."""

    def __init__(self):
        self.stats: Dict[int, CatStat] = defaultdict(CatStat)

    def __iadd__(self, other: "PQStat") -> "PQStat":
        for c, s in other.stats.items():
            mine = self.stats[c]
            mine.iou += s.iou
            mine.tp += s.tp
            mine.fp += s.fp
            mine.fn += s.fn
        return self

    def average(self) -> Dict[str, float]:
        pq = sq = rq = 0.0
        n = 0
        for s in self.stats.values():
            denom = s.tp + 0.5 * s.fp + 0.5 * s.fn
            if denom == 0:
                continue
            n += 1
            pq += s.iou / denom
            sq += s.iou / s.tp if s.tp else 0.0
            rq += s.tp / denom
        if n == 0:
            return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
        return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}


def pq_single_image(
    gt: np.ndarray, dt: np.ndarray, ignore_label: int
) -> PQStat:
    """PQ contribution of one image's (gt, dt) semantic label maps.

    Semantic segments are one-per-class, so gt id == category id == pred
    id and the match test reduces to: IoU(gt class c, pred class c) > 0.5,
    with VOID (ignore_label) pixels excluded from the union (reference
    pq_compute_single_image, union -= intersection(VOID, pred)).
    """
    stat = PQStat()
    gt = gt.astype(np.int64).ravel()
    dt = dt.astype(np.int64).ravel()
    k = int(max(gt.max(initial=0), dt.max(initial=0), ignore_label)) + 1
    pairs, counts = np.unique(gt * k + dt, return_counts=True)
    inter = {(int(p // k), int(p % k)): int(c) for p, c in zip(pairs, counts)}

    gt_area: Dict[int, int] = defaultdict(int)
    dt_area: Dict[int, int] = defaultdict(int)
    for (g, d), c in inter.items():
        gt_area[g] += c
        dt_area[d] += c

    gt_cats = {g for g in gt_area if g != ignore_label}
    dt_cats = {d for d in dt_area if d != ignore_label}

    matched_gt, matched_dt = set(), set()
    for c in gt_cats & dt_cats:
        i = inter.get((c, c), 0)
        union = gt_area[c] + dt_area[c] - i - inter.get((ignore_label, c), 0)
        if union <= 0:
            continue
        iou = i / union
        if iou > 0.5:
            stat.stats[c].tp += 1
            stat.stats[c].iou += iou
            matched_gt.add(c)
            matched_dt.add(c)
    for c in gt_cats - matched_gt:
        stat.stats[c].fn += 1
    for c in dt_cats - matched_dt:
        # a prediction mostly covering VOID is ignored, not a FP
        if inter.get((ignore_label, c), 0) / dt_area[c] > 0.5:
            continue
        stat.stats[c].fp += 1
    return stat


def miou_from_confusion(conf: np.ndarray) -> float:
    """mIoU from a (K+1, K+1) confusion matrix whose last row/col is VOID
    (reference's conf_matrix block, pred-major bincount layout)."""
    k = conf.shape[0] - 1
    tp = conf.diagonal()[:k].astype(np.float64)
    pos_gt = conf[:k, :k].sum(axis=0).astype(np.float64)
    pos_pred = conf[:k, :k].sum(axis=1).astype(np.float64)
    valid = pos_gt > 0
    union = pos_gt + pos_pred - tp
    iou = np.zeros(k)
    iou[valid] = tp[valid] / np.maximum(union[valid], 1)
    denom = ((pos_gt + pos_pred) > 0).sum()
    return float(iou[valid].sum() / denom) if denom else 0.0


def accumulate_confusion(
    gt: np.ndarray, dt: np.ndarray, num_classes: int, ignore_label: int,
    conf: np.ndarray,
) -> None:
    """Add one image to the (K+1, K+1) confusion matrix in place."""
    g = gt.astype(np.int64).copy()
    g[g == ignore_label] = num_classes
    g = np.clip(g, 0, num_classes)
    d = np.clip(dt.astype(np.int64), 0, num_classes)
    conf += np.bincount(
        (num_classes + 1) * d.ravel() + g.ravel(), minlength=conf.size
    ).reshape(conf.shape)
