"""Clip augmentations (numpy/cv2), reproducing the reference's pipeline.

Reference behavior (`/root/reference/model_training/mask2former_video/
data_video/augmentation.py:116-168` + d2 transform semantics):

  * RandomCrop "absolute_range" (per frame — only resize/flip are
    clip-consistent in the reference)
  * ResizeShortestEdge with "choice_by_clip": ONE target size per clip,
    bilinear for images, nearest for masks
  * RandomFlip "flip_by_clip": one coin per clip
  * RandomBrightness/Contrast(0.9, 1.1) per frame (photometric, d2 blend
    semantics), RandomRotation [-15, 15], expand=False, random centre in
    ([0.4, 0.6] x [0.4, 0.6]) of the image, per frame

Geometric transforms are applied identically to masks (nearest interp).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


@dataclasses.dataclass
class ClipAugConfig:
    min_sizes: Sequence[int] = (360, 480)
    max_size: int = 1333
    flip_prob: float = 0.5
    crop_enabled: bool = False
    crop_range: Tuple[int, int] = (600, 720)
    brightness: bool = False
    contrast: bool = False
    saturation: bool = False
    rotation: bool = False


def resize_shortest_edge(h: int, w: int, short: int, max_size: int) -> Tuple[int, int]:
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    return nh, nw


def _resize(img: np.ndarray, size_hw: Tuple[int, int], is_mask: bool) -> np.ndarray:
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    out = cv2.resize(
        img.astype(np.uint8) if is_mask else img,
        (size_hw[1], size_hw[0]),
        interpolation=interp,
    )
    return out.astype(bool) if is_mask else out


def _affine_translate(dx: float, dy: float) -> np.ndarray:
    m = np.eye(3)
    m[0, 2], m[1, 2] = dx, dy
    return m


def _affine_scale(sx: float, sy: float) -> np.ndarray:
    return np.diag([sx, sy, 1.0])


def _affine_hflip(w: int) -> np.ndarray:
    m = np.eye(3)
    m[0, 0], m[0, 2] = -1.0, w - 1.0
    return m


def augment_clip(
    rng: np.random.RandomState,
    frames: List[np.ndarray],  # T x (H, W, 3) uint8 RGB
    masks: Optional[np.ndarray],  # (N, T, H, W) bool or None
    cfg: ClipAugConfig,
    is_train: bool = True,
    return_affines: bool = False,
):
    """Returns (frames, masks) or, with return_affines, (frames, masks,
    affines (T, 3, 3)) where each affine maps ORIGINAL pixel coords (x, y, 1)
    to AUGMENTED coords — the transform record the disentangled
    distillation loader replays on teacher masks (reference
    dataset_mapper.py:333-344, 480-560)."""
    t = len(frames)
    h, w = frames[0].shape[:2]
    affines = [np.eye(3) for _ in range(t)]

    def _finish(fr, mk):
        if return_affines:
            return fr, mk, np.stack(affines)
        return fr, mk

    if not is_train:
        short = cfg.min_sizes if isinstance(cfg.min_sizes, int) else cfg.min_sizes[0]
        nh, nw = resize_shortest_edge(h, w, short, cfg.max_size)
        out_frames = [_resize(f, (nh, nw), False) for f in frames]
        out_masks = None
        if masks is not None:
            out_masks = np.stack(
                [
                    np.stack([_resize(masks[n, i], (nh, nw), True) for i in range(t)])
                    for n in range(masks.shape[0])
                ]
            ) if masks.shape[0] else np.zeros((0, t, nh, nw), bool)
        scale = _affine_scale(nw / w, nh / h)
        affines = [scale @ a for a in affines]
        return _finish(out_frames, out_masks)

    out_frames = list(frames)
    out_masks = masks

    # per-frame random crop (absolute_range)
    if cfg.crop_enabled:
        new_frames, new_masks = [], []
        ch = min(rng.randint(cfg.crop_range[0], cfg.crop_range[1] + 1), h)
        cw = min(rng.randint(cfg.crop_range[0], cfg.crop_range[1] + 1), w)
        for i in range(t):
            y0 = rng.randint(0, h - ch + 1)
            x0 = rng.randint(0, w - cw + 1)
            new_frames.append(out_frames[i][y0 : y0 + ch, x0 : x0 + cw])
            affines[i] = _affine_translate(-x0, -y0) @ affines[i]
            if out_masks is not None:
                new_masks.append(out_masks[:, i, y0 : y0 + ch, x0 : x0 + cw])
        out_frames = new_frames
        if out_masks is not None:
            out_masks = (
                np.stack(new_masks, axis=1)
                if out_masks.shape[0]
                else np.zeros((0, t, ch, cw), bool)
            )
        h, w = ch, cw

    # clip-consistent resize
    short = int(rng.choice(list(cfg.min_sizes)))
    nh, nw = resize_shortest_edge(h, w, short, cfg.max_size)
    out_frames = [_resize(f, (nh, nw), False) for f in out_frames]
    affines = [_affine_scale(nw / w, nh / h) @ a for a in affines]
    if out_masks is not None and out_masks.shape[0]:
        out_masks = np.stack(
            [
                np.stack([_resize(out_masks[n, i], (nh, nw), True) for i in range(t)])
                for n in range(out_masks.shape[0])
            ]
        )
    elif out_masks is not None:
        out_masks = np.zeros((0, t, nh, nw), bool)
    h, w = nh, nw

    # clip-consistent horizontal flip
    if rng.rand() < cfg.flip_prob:
        out_frames = [f[:, ::-1] for f in out_frames]
        affines = [_affine_hflip(w) @ a for a in affines]
        if out_masks is not None and out_masks.shape[0]:
            out_masks = out_masks[:, :, :, ::-1]

    # per-frame photometric + rotation
    for i in range(t):
        img = out_frames[i].astype(np.float32)
        if cfg.brightness:
            img = img * rng.uniform(0.9, 1.1)
        if cfg.contrast:
            wgt = rng.uniform(0.9, 1.1)
            img = img * wgt + img.mean() * (1.0 - wgt)
        if cfg.saturation:
            wgt = rng.uniform(0.9, 1.1)
            grey = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
            img = img * wgt + grey[..., None] * (1.0 - wgt)
        if cfg.rotation:
            angle = rng.uniform(-15.0, 15.0)
            cx = rng.uniform(0.4, 0.6) * w
            cy = rng.uniform(0.4, 0.6) * h
            mat = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
            affines[i] = np.vstack([mat, [0.0, 0.0, 1.0]]) @ affines[i]
            img = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR)
            if out_masks is not None and out_masks.shape[0]:
                for n in range(out_masks.shape[0]):
                    out_masks[n, i] = (
                        cv2.warpAffine(
                            out_masks[n, i].astype(np.uint8),
                            mat,
                            (w, h),
                            flags=cv2.INTER_NEAREST,
                        ).astype(bool)
                    )
        out_frames[i] = np.clip(img, 0, 255)

    if out_masks is not None:
        out_masks = np.ascontiguousarray(out_masks)
    return _finish(out_frames, out_masks)
