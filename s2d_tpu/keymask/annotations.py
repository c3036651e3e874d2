"""Keymask annotation writer, dataset merger, and round-2 converter.

Rebuilds of:
  * `/root/reference/keymask_ident/annotations.py:8-140` — each temporal
    group becomes one YTVIS annotation: per-frame COCO RLE, bbox/area from
    the RLE, single category {"id": 1, "name": "fg"}, carrying `one2x` and
    `visibility_ranges`; one JSON per video
  * `/root/reference/keymask_ident/merge_ytvis_jsons.py:24-97` — merge
    per-video JSONs into one dataset, renumber video/annotation ids, drop
    annotations whose one2x exceeds a threshold
  * `/root/reference/keymask_ident/convert_results_to_annotations.py:10-111`
    — eval results.json -> round-2 self-distillation training annotations
    (score threshold, bbox/area recomputed from RLE, gt video metadata)
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data import rle as rle_codec


def write_annotation_for_video(
    video_id: int,
    file_names: List[str],
    height: int,
    width: int,
    groups: List[dict],  # from matching.group_quality
    group_masks: List[Sequence[Optional[np.ndarray]]],  # per group: per-frame mask|None
    visibility_ranges: Optional[List] = None,
) -> dict:
    """One video's YTVIS-format JSON (videos + annotations + category fg)."""
    annotations = []
    for ann_idx, (group, masks) in enumerate(zip(groups, group_masks), start=1):
        segs, bboxes, areas = [], [], []
        for mask in masks:
            if mask is None or mask.sum() == 0:
                segs.append(None)
                bboxes.append(None)
                areas.append(None)
            else:
                enc = rle_codec.encode(mask.astype(bool))
                segs.append(enc)
                bboxes.append(rle_codec.to_bbox(enc))
                areas.append(rle_codec.area(enc))
        annotations.append(
            {
                "id": ann_idx,
                "video_id": video_id,
                "category_id": 1,
                "segmentations": segs,
                "bboxes": bboxes,
                "areas": areas,
                "iscrowd": 0,
                "one2x": group.get("one2x", 0),
                "coverage": group.get("coverage", 1.0),
                "visibility_ranges": visibility_ranges or [],
                "height": height,
                "width": width,
                "length": len(file_names),
            }
        )
    return {
        "videos": [
            {
                "id": video_id,
                "file_names": file_names,
                "height": height,
                "width": width,
                "length": len(file_names),
            }
        ],
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }


def merge_video_jsons(
    json_paths: Sequence[str], one2x_threshold: Optional[int] = None
) -> dict:
    """Merge per-video JSONs: renumber ids, filter noisy (one2x) tracks."""
    videos, annotations = [], []
    next_vid, next_ann = 1, 1
    for path in sorted(json_paths):
        with open(path) as f:
            data = json.load(f)
        for video in data["videos"]:
            old_id = video["id"]
            video = dict(video, id=next_vid)
            videos.append(video)
            for ann in data["annotations"]:
                if ann["video_id"] != old_id:
                    continue
                if (
                    one2x_threshold is not None
                    and ann.get("one2x", 0) > one2x_threshold
                ):
                    continue
                annotations.append(dict(ann, id=next_ann, video_id=next_vid))
                next_ann += 1
            next_vid += 1
    return {
        "videos": videos,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }


def convert_results_to_annotations(
    results: List[dict],  # results.json entries
    gt_videos: List[dict],  # video metadata from the eval dataset json
    score_threshold: float = 0.75,
) -> dict:
    """Model predictions -> round-2 training annotations."""
    videos_by_id = {v["id"]: v for v in gt_videos}
    annotations = []
    next_ann = 1
    for res in results:
        if res["score"] < score_threshold:
            continue
        segs = res["segmentations"]
        bboxes, areas = [], []
        for seg in segs:
            if seg is None:
                bboxes.append(None)
                areas.append(None)
            else:
                bboxes.append(rle_codec.to_bbox(seg))
                areas.append(rle_codec.area(seg))
        annotations.append(
            {
                "id": next_ann,
                "video_id": res["video_id"],
                "category_id": 1,
                "segmentations": segs,
                "bboxes": bboxes,
                "areas": areas,
                "iscrowd": 0,
                "score": res["score"],
            }
        )
        next_ann += 1
    return {
        "videos": [videos_by_id[vid] for vid in sorted(videos_by_id)],
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }
