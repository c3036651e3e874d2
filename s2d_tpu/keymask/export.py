"""Candidate keymask export: winner masks written as binary PNGs.

Rebuild of `/root/reference/keymask_ident/keymask_utils.py:70-128`
(`save_segmentation_masks`): for every (cluster, visibility range) the
winner candidate masks are saved as `cluster{c}_frame{f}_mask{m}.png` so
downstream stages (and humans) can inspect the discovery state.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def save_candidate_masks(
    out_dir: str,
    windows: List[dict],  # from keymask.windows.visibility_windows
    records: List[dict],  # from keymask.visibility.extract_visibility_curves
    masks_per_frame: Sequence[Dict[int, np.ndarray]],
) -> List[str]:
    """Writes winner candidate masks; returns the written paths."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for wrec in windows:
        cluster = wrec["cluster"]
        for row in wrec["winners"]:
            rec = records[row]
            frame = rec["frame"]
            mask_id = rec["mask_id"]
            frame_masks = masks_per_frame[frame]
            mask = frame_masks.get(mask_id)
            if mask is None:
                ordered = list(frame_masks.values())
                if 0 <= mask_id - 1 < len(ordered):
                    mask = ordered[mask_id - 1]
            if mask is None:
                continue
            path = os.path.join(
                out_dir, f"cluster{cluster}_frame{frame}_mask{mask_id}.png"
            )
            cv2.imwrite(path, mask.astype(np.uint8) * 255)
            written.append(path)
    return written
