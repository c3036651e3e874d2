"""Copy-paste augmentation for video clips.

Rebuild of the reference's clip copy-paste (`/root/reference/
model_training/mask2former_video/engine/train_loop.py:377-545`): instances
from a source clip are rescaled/shifted and pasted into every frame of a
destination clip (the same geometric transform across frames, preserving
temporal coherence), with an overlap-rejection test (the reference rejects
pastes whose IoY — intersection over the pasted mask area — with existing
instances exceeds 0.5, lines 530-545). Pasted pixels overwrite the
destination image; existing instance masks are carved accordingly.

Host-side numpy transform, applied by the train loader before collation
when DATALOADER.COPY_PASTE is on.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np


def _rescale_and_shift(
    rng: np.random.RandomState,
    masks: np.ndarray,  # (T, H, W) one instance's track
    images: np.ndarray,  # (T, H, W, 3) source frames
    out_hw: Tuple[int, int],
    min_ratio: float,
    max_ratio: float,
):
    """One shared transform for the whole track: scale + random placement."""
    t, h, w = masks.shape
    oh, ow = out_hw
    ratio = rng.uniform(min_ratio, max_ratio)
    nh, nw = max(int(h * ratio), 1), max(int(w * ratio), 1)
    dy = rng.randint(0, max(oh - nh, 0) + 1) - max((nh - oh) // 2, 0)
    dx = rng.randint(0, max(ow - nw, 0) + 1) - max((nw - ow) // 2, 0)

    out_masks = np.zeros((t, oh, ow), bool)
    out_rgb = np.zeros((t, oh, ow, 3), np.float32)
    for fi in range(t):
        m = cv2.resize(
            masks[fi].astype(np.uint8), (nw, nh), interpolation=cv2.INTER_NEAREST
        ).astype(bool)
        rgb = cv2.resize(images[fi], (nw, nh), interpolation=cv2.INTER_LINEAR)
        ys, xs = np.nonzero(m)
        ys2, xs2 = ys + dy, xs + dx
        keep = (ys2 >= 0) & (ys2 < oh) & (xs2 >= 0) & (xs2 < ow)
        out_masks[fi, ys2[keep], xs2[keep]] = True
        out_rgb[fi, ys2[keep], xs2[keep]] = rgb[ys[keep], xs[keep]]
    return out_masks, out_rgb


def copy_paste_clip(
    rng: np.random.RandomState,
    dst: Dict[str, np.ndarray],  # mapper sample: image (T,H,W,3), masks (N,T,H,W), valid (N,)
    src: Dict[str, np.ndarray],
    rate: float = 1.0,
    min_ratio: float = 0.8,
    max_ratio: float = 1.0,
    reject_ioy: float = 0.5,
    random_num: bool = False,
) -> Dict[str, np.ndarray]:
    """Paste src's instances into dst. Returns a new sample dict."""
    if rng.rand() >= rate:
        return dst
    t, h, w, _ = dst["image"].shape
    image = dst["image"].copy()
    masks = dst["masks"].copy()
    valid = dst["valid"].copy()

    src_ids = np.flatnonzero(src["valid"])
    if random_num and len(src_ids):
        k = rng.randint(1, len(src_ids) + 1)
        src_ids = rng.choice(src_ids, k, replace=False)

    existing = masks[valid].any(axis=0) if valid.any() else np.zeros((t, h, w), bool)
    st = min(t, src["image"].shape[0])
    for sid in src_ids:
        free = np.flatnonzero(~valid)
        if len(free) == 0:
            break
        pasted_masks, pasted_rgb = _rescale_and_shift(
            rng, src["masks"][sid][:st], src["image"][:st], (h, w),
            min_ratio, max_ratio,
        )
        if pasted_masks.sum() == 0:
            continue
        # IoY rejection: fraction of the pasted track covered by existing
        inter = (pasted_masks[:st] & existing[:st]).sum()
        if inter / max(pasted_masks.sum(), 1) > reject_ioy:
            continue
        pm = np.zeros((t, h, w), bool)
        pm[:st] = pasted_masks
        image[pm] = pasted_rgb[pasted_masks]
        masks[:, pm] = False  # carve occluded pixels out of existing tracks
        slot = free[0]
        masks[slot] = pm
        valid[slot] = True
        existing |= pm

    out = dict(dst)
    out.update(image=image, masks=masks, valid=valid)
    return out
