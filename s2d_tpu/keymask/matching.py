"""Temporal correspondence matching: keymask candidates -> instance groups.

Rebuild of `/root/reference/keymask_ident/cotracker_matching.py` (the
pipeline's heaviest stage):

  * per candidate keymask: track a point grid seeded in the mask across its
    visibility range (grid size = clamp(area / 800, 25, 50), reference
    lines 1067-1068)
  * per frame, compute point-in-mask IoU between the tracked points and
    every pseudo-mask (`compute_point_mask_intersection:640`): the fraction
    of visible tracked points landing inside the mask, symmetrized with the
    mask's coverage by the point grid's convex-hull rasterization — here
    vectorized as one batched gather per frame instead of per-mask loops
  * IoU > matching_threshold (0.5) => the candidate matches that mask in
    that frame; the binary match matrix over all (frame, mask-id) pairs is
    DBSCAN-clustered (hamming, adaptive eps, lines 795-804) into temporal
    groups = instances
  * per-group quality: coverage (fraction of range frames matched,
    `calculate_cluster_coverage:843`) and the one-to-many "one2x" noise
    flag (lines 1084-1111)
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .tracker import PointTracker, grid_points_in_mask


def adaptive_grid_size(mask_area: float) -> int:
    return int(np.clip(mask_area / 800.0, 25, 50))


def point_mask_iou(
    points: np.ndarray,  # (P, 2) xy
    visibility: np.ndarray,  # (P,) in [0, 1]
    mask: np.ndarray,  # (H, W) bool
) -> float:
    """Fraction of visible tracked points inside the mask (the core of the
    reference's point-mask intersection test)."""
    vis = visibility > 0.5
    if vis.sum() == 0:
        return 0.0
    h, w = mask.shape
    xs = np.clip(points[vis, 0].round().astype(int), 0, w - 1)
    ys = np.clip(points[vis, 1].round().astype(int), 0, h - 1)
    inside = mask[ys, xs]
    # |visible points inside the mask| / |visible points| — the reference
    # restricts `mask` to the rasterized pointmask before the IoU, so its
    # intersection/union reduces to exactly this fraction
    # (compute_point_mask_intersection, cotracker_matching.py:640-662)
    return float(inside.mean())


def match_candidate(
    video: np.ndarray,
    tracker: PointTracker,
    candidate_mask: np.ndarray,
    seed_frame: int,
    frame_masks: Sequence[Dict[int, np.ndarray]],  # per frame {overall_id: mask}
    matching_threshold: float = 0.5,
) -> Dict[int, bool]:
    """Track one candidate and return {overall_mask_id: matched} over all
    frames' pseudo-masks."""
    grid = adaptive_grid_size(candidate_mask.sum())
    pts = grid_points_in_mask(candidate_mask, grid)
    matches: Dict[int, bool] = {}
    if len(pts) < 4:
        return matches
    tracks, vis = tracker.track(video, pts, query_frame=seed_frame)
    for fi, masks in enumerate(frame_masks):
        for mid, mask in masks.items():
            iou = point_mask_iou(tracks[fi], vis[fi], mask)
            if iou > matching_threshold:
                matches[mid] = True
    return matches


def match_candidates(
    video: np.ndarray,
    tracker: PointTracker,
    candidates: Sequence[Tuple[int, np.ndarray]],  # (seed_frame, mask)
    frame_masks: Sequence[Dict[int, np.ndarray]],
    matching_threshold: float = 0.5,
) -> List[Dict[int, bool]]:
    """All candidates of one video at once: identical results to per-
    candidate `match_candidate` calls, but the point tracking batches into
    a few device calls via `tracker.track_batch` when available (the
    per-candidate loop pays one transport RPC + dispatch per track)."""
    out: List[Dict[int, bool]] = [{} for _ in candidates]
    pts_list, idxs = [], []
    for i, (seed_frame, mask) in enumerate(candidates):
        grid = adaptive_grid_size(mask.sum())
        pts = grid_points_in_mask(mask, grid)
        if len(pts) < 4:
            continue
        pts_list.append(pts)
        idxs.append(i)
    if hasattr(tracker, "track_batch"):
        results = tracker.track_batch(
            video, pts_list, [candidates[i][0] for i in idxs]
        )
    else:
        results = [
            tracker.track(video, pts, query_frame=candidates[i][0])
            for pts, i in zip(pts_list, idxs)
        ]
    for i, (tracks, vis) in zip(idxs, results):
        for fi, masks in enumerate(frame_masks):
            for mid, mask in masks.items():
                if point_mask_iou(tracks[fi], vis[fi], mask) > matching_threshold:
                    out[i][mid] = True
    return out


def match_matrix(
    all_matches: List[Dict[int, bool]], all_ids: List[int]
) -> np.ndarray:
    """(num_candidates, num_overall_ids) binary match matrix."""
    id_index = {mid: i for i, mid in enumerate(all_ids)}
    mat = np.zeros((len(all_matches), len(all_ids)), bool)
    for ci, matches in enumerate(all_matches):
        for mid in matches:
            if mid in id_index:
                mat[ci, id_index[mid]] = True
    return mat


def temporal_correspondence_clustering(
    mat: np.ndarray, min_samples: int | None = None, eps: float | None = None
) -> np.ndarray:
    """DBSCAN on the binary match matrix (hamming). Reference parameter
    table (cotracker_matching.py:795-804): width > 50 -> eps 0.05,
    min_samples 5; width < 10 -> eps 0.1, min_samples 3; else eps 0.1,
    min_samples 5. Rows with no matches are forced to noise (-1,
    reference lines 813-815). Explicit `min_samples`/`eps` override the
    table (tiny synthetic runs need min_samples below the reference's
    real-data settings). Returns labels (-1 = noise)."""
    from sklearn.cluster import DBSCAN

    if len(mat) == 0:
        return np.zeros((0,), np.int64)
    width = mat.shape[1]
    if width > 50:
        _eps, _min = 0.05, 5
    elif width < 10:
        _eps, _min = 0.1, 3
    else:
        _eps, _min = 0.1, 5
    if eps is not None:
        _eps = eps
    if min_samples is not None:
        _min = min_samples
    labels = DBSCAN(eps=_eps, min_samples=_min, metric="hamming").fit(
        mat.astype(np.float64)
    ).labels_
    labels = np.asarray(labels)
    labels[mat.sum(axis=1) == 0] = -1
    return labels


def group_quality(
    mat: np.ndarray, labels: np.ndarray, frame_of_id: Sequence[int]
) -> List[dict]:
    """Per group: matched overall ids, per-frame coverage, one2x count
    (frames where the group matches >1 mask — the noise indicator)."""
    frame_of_id = np.asarray(frame_of_id)
    out = []
    for g in sorted(set(labels) - {-1}):
        members = np.flatnonzero(labels == g)
        matched = mat[members].any(axis=0)  # (num_ids,)
        frames = frame_of_id[matched]
        unique_frames, counts = (
            np.unique(frames, return_counts=True) if len(frames) else ([], [])
        )
        one2x = int((np.asarray(counts) > 1).sum()) if len(frames) else 0
        coverage = len(unique_frames) / max(len(set(frame_of_id.tolist())), 1)
        out.append(
            {
                "group": int(g),
                "members": members.tolist(),
                "matched_ids": np.flatnonzero(matched).tolist(),
                "coverage": float(coverage),
                "one2x": one2x,
            }
        )
    return out
