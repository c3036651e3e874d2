"""Object visibility extraction: per-mask point tracking -> (N, T) curves.

Rebuild of `/root/reference/keymask_ident/cotracker_occlusions.py:243-396`:
for every (frame f, mask id m in frame f), seed a point grid inside the
mask, track over the whole video (forward + backward), and record the mean
point visibility per frame. The result is one visibility curve per seeded
mask, saved as JSON. Where the reference runs a python double loop of
CoTracker calls, the tracker here batches all transitions on TPU and the
loop is only over seed masks.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .tracker import PointTracker, grid_points_in_mask


def extract_visibility_curves(
    video: np.ndarray,  # (T, H, W, 3)
    masks_per_frame: Sequence[Dict[int, np.ndarray]],  # t -> {mask_id: (H, W) bool}
    tracker: PointTracker,
    grid_size: int = 50,
    min_points: int = 4,
) -> List[dict]:
    """Returns one record per (seed frame, mask id):
    {frame, mask_id, visibility: (T,) mean point visibility}."""
    t = len(video)
    seeds = []  # (frame, mask_id, points)
    for fi in range(t):
        for mask_id, mask in masks_per_frame[fi].items():
            pts = grid_points_in_mask(mask, grid_size)
            if len(pts) < min_points:
                continue
            seeds.append((fi, int(mask_id), pts))

    if hasattr(tracker, "track_batch"):
        # batch ALL seeds of the video into a few device calls (the
        # per-seed loop pays one transport RPC + dispatch per call)
        results = tracker.track_batch(
            video, [pts for _, _, pts in seeds], [fi for fi, _, _ in seeds]
        )
    else:
        results = [
            tracker.track(video, pts, query_frame=fi)
            for fi, _, pts in seeds
        ]

    return [
        {
            "frame": fi,
            "mask_id": mask_id,
            "visibility": vis.mean(axis=1).tolist(),
        }
        for (fi, mask_id, _), (_, vis) in zip(seeds, results)
    ]


def save_visibility_json(path: str, records: List[dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(records, f)


def load_masks_from_color_png(png: np.ndarray) -> Dict[int, np.ndarray]:
    """Multi-color instance PNG -> {id: binary mask} (reference
    `load_masks` / `convert_lblimg_to_maskid`, crw_utils.py:688)."""
    flat = png.reshape(-1, png.shape[-1])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    out = {}
    next_id = 1
    for ci, color in enumerate(colors):
        if (color == 0).all():  # background
            continue
        mask = (inverse == ci).reshape(png.shape[:2])
        out[next_id] = mask
        next_id += 1
    return out
