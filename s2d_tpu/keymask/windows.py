"""Visibility windows: cluster curves into putative objects, find ranges.

Rebuild of `/root/reference/keymask_ident/identify_visibility_windows.py:
108-231`:

  1. binarize (N, T) visibility curves at `visibility_threshold` (0.3)
  2. DBSCAN(eps=0.2, min_samples=5, metric="hamming") clusters curves into
     putative objects
  3. per cluster, majority vote across members per frame -> cluster
     visibility over time; contiguous visible stretches = visibility ranges
  4. "winner" members: curves visible > `winner_threshold` (30%) of a range
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def binarize_curves(curves: np.ndarray, threshold: float = 0.3) -> np.ndarray:
    return np.asarray(curves) >= threshold


def cluster_curves(
    binary: np.ndarray, eps: float = 0.2, min_samples: int = 5
) -> np.ndarray:
    """DBSCAN on hamming distance; returns labels (N,), -1 = noise."""
    from sklearn.cluster import DBSCAN

    if len(binary) == 0:
        return np.zeros((0,), np.int64)
    return DBSCAN(eps=eps, min_samples=min_samples, metric="hamming").fit(
        binary.astype(np.float64)
    ).labels_


def contiguous_ranges(visible: np.ndarray) -> List[Tuple[int, int]]:
    """Boolean (T,) -> list of [start, end] inclusive visible stretches."""
    ranges = []
    start = None
    for i, v in enumerate(visible):
        if v and start is None:
            start = i
        elif not v and start is not None:
            ranges.append((start, i - 1))
            start = None
    if start is not None:
        ranges.append((start, len(visible) - 1))
    return ranges


def visibility_windows(
    curves: np.ndarray,  # (N, T) float
    threshold: float = 0.3,
    eps: float = 0.2,
    min_samples: int = 5,
    winner_threshold: float = 0.3,
) -> List[dict]:
    """Returns one record per (cluster, range):
    {cluster, range: (start, end), winners: member row indices}."""
    binary = binarize_curves(curves, threshold)
    labels = cluster_curves(binary, eps, min_samples)
    out = []
    for cluster in sorted(set(labels) - {-1}):
        members = np.flatnonzero(labels == cluster)
        votes = binary[members].mean(axis=0) >= 0.5  # per-frame majority
        for start, end in contiguous_ranges(votes):
            span = slice(start, end + 1)
            frac = binary[members, span].mean(axis=1)
            winners = members[frac > winner_threshold]
            out.append(
                {
                    "cluster": int(cluster),
                    "range": (int(start), int(end)),
                    "winners": winners.tolist(),
                }
            )
    return out
