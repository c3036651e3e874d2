"""Multi-scale + hflip test-time augmentation for the CutLER R-CNN.

TPU-native equivalent of detectron2's `GeneralizedRCNNWithTTA`, which the
reference wraps around the image detector when TEST.AUG.ENABLED
(`/root/reference/model_training/cutler/train_net.py:100-113`). Algorithm
(mirroring d2's):

  1. per augmentation (each TEST.AUG.MIN_SIZES scale, optionally + hflip):
     run the standard cascade inference, map the detected boxes back into
     original-image coordinates (invert resize + flip);
  2. merge all augmentations' detections with one NMS at the test
     threshold + top DETECTIONS_PER_IMAGE (d2 `_merge_detections` runs
     fast_rcnn_inference on the union);
  3. masks: for each augmentation, re-run the MASK HEAD on the merged
     boxes rescaled into that augmentation's frame (d2
     `_rescale_detected_boxes`), flip flipped augs' box-frame masks back,
     and AVERAGE the sigmoid probabilities across augmentations.

Static-shape adaptations (every augmentation shares ONE padded canvas so
the whole TTA sweep compiles exactly two executables — boxes + masks):
the canvas is `round_up(min(MAX_SIZE, 2 * max(MIN_SIZES)), 32)`, so the
effective long-side cap is min(MAX_SIZE, 2 * max(MIN_SIZES)) — identical
to d2 for aspect ratios up to 2:1.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import box_nms


def tta_canvas_size(min_sizes: Tuple[int, ...], max_size: int) -> int:
    s = min(max_size, 2 * max(min_sizes))
    return -(-s // 32) * 32


def tta_variants(
    img: np.ndarray,  # (H, W, 3) float32, unnormalized
    min_sizes: Tuple[int, ...],
    max_size: int,
    flip: bool,
    pixel_mean,
    pixel_std,
) -> Tuple[np.ndarray, List[Dict]]:
    """Returns (stack (A, S, S, 3) normalized canvases, per-aug metadata
    dicts with scale / flipped / resized (nh, nw))."""
    import cv2

    h, w = img.shape[:2]
    s = tta_canvas_size(min_sizes, max_size)
    canvases, metas = [], []
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    for ms in min_sizes:
        scale = min(ms / min(h, w), s / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        for flipped in (False, True) if flip else (False,):
            view = resized[:, ::-1] if flipped else resized
            canvas = np.zeros((s, s, 3), np.float32)
            canvas[:nh, :nw] = view
            canvases.append((canvas - mean) / std)
            metas.append({"scale": scale, "flipped": flipped, "nw": nw})
    return np.stack(canvases), metas


def boxes_to_original(boxes: np.ndarray, meta: Dict) -> np.ndarray:
    """Map (K, 4) xyxy boxes from an augmentation's frame back to
    original-image coordinates."""
    b = boxes.copy()
    if meta["flipped"]:
        x0 = meta["nw"] - b[:, 2]
        x1 = meta["nw"] - b[:, 0]
        b[:, 0], b[:, 2] = x0, x1
    return b / meta["scale"]


def boxes_to_aug(boxes: np.ndarray, meta: Dict) -> np.ndarray:
    """Inverse of boxes_to_original: original coords -> aug frame."""
    b = boxes * meta["scale"]
    if meta["flipped"]:
        x0 = meta["nw"] - b[:, 2]
        x1 = meta["nw"] - b[:, 0]
        b = b.copy()
        b[:, 0], b[:, 2] = x0, x1
    return b


@functools.partial(jax.jit, static_argnames=("nms_thresh", "topk"))
def merge_detections(
    boxes: jnp.ndarray,  # (N, 4) original-frame boxes, all augs pooled
    scores: jnp.ndarray,  # (N,)
    classes: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    *,
    nms_thresh: float,
    topk: int,
):
    """One per-class NMS over the pooled detections + top-k (d2
    `_merge_detections`). Per-class is realized with the coordinate-offset
    trick so one class-agnostic NMS handles all classes."""
    scores = jnp.where(valid, scores, -jnp.inf)
    # translate so every coordinate is >= 0 before the class offset:
    # flipped-aug boxes mapped back through boxes_to_original can carry
    # negative x (detections clip to the square canvas, not to nw), and a
    # negative coordinate would dip a class-c clone into class c-1's band.
    # IoU is translation-invariant, so subtracting the global min is exact.
    lo = jnp.min(jnp.where(valid[:, None], boxes, jnp.inf))
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    b0 = boxes - lo
    span = jnp.max(jnp.where(valid[:, None], b0, 0.0)) + 1.0
    shifted = b0 + (classes.astype(boxes.dtype) * span)[:, None]
    keep = box_nms(shifted, scores, nms_thresh) & valid
    scores = jnp.where(keep, scores, -jnp.inf)
    k = min(topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    out_valid = jnp.isfinite(top_scores)
    return (
        boxes[idx],
        jnp.where(out_valid, top_scores, 0.0),
        classes[idx],
        out_valid,
    )


def tta_inference(
    params,
    img: np.ndarray,  # (H, W, 3) float32 unnormalized original image
    *,
    infer_boxes,  # jitted (params, image(1,S,S,3)) -> (boxes, scores, classes, valid)
    infer_masks,  # jitted (params, image, boxes) -> (K, m, m) probs, or None
    min_sizes: Tuple[int, ...],
    max_size: int,
    flip: bool,
    pixel_mean,
    pixel_std,
    nms_thresh: float,
    topk: int,
):
    """Full TTA sweep for one image. Returns (boxes, scores, classes,
    valid[, mask_probs]) in original-image coordinates."""
    canvases, metas = tta_variants(
        img, min_sizes, max_size, flip, pixel_mean, pixel_std
    )
    all_boxes, all_scores, all_classes, all_valid = [], [], [], []
    for canvas, meta in zip(canvases, metas):
        b, sc, cl, v = (np.asarray(x) for x in
                        infer_boxes(params, jnp.asarray(canvas)[None]))
        # clip to the original extent (reference detector_postprocess
        # clips; flipped variants can otherwise map pad-region overshoot
        # to negative x)
        ob = boxes_to_original(b, meta)
        h0, w0 = img.shape[:2]
        ob[:, 0::2] = np.clip(ob[:, 0::2], 0.0, float(w0))
        ob[:, 1::2] = np.clip(ob[:, 1::2], 0.0, float(h0))
        all_boxes.append(ob)
        all_scores.append(sc)
        all_classes.append(cl)
        all_valid.append(v)
    boxes, scores, classes, valid = merge_detections(
        jnp.asarray(np.concatenate(all_boxes)),
        jnp.asarray(np.concatenate(all_scores)),
        jnp.asarray(np.concatenate(all_classes)),
        jnp.asarray(np.concatenate(all_valid)),
        nms_thresh=nms_thresh,
        topk=topk,
    )
    if infer_masks is None:
        return boxes, scores, classes, valid
    boxes_np = np.asarray(boxes)
    probs = None
    for canvas, meta in zip(canvases, metas):
        mb = boxes_to_aug(boxes_np, meta)
        p = np.asarray(infer_masks(
            params, jnp.asarray(canvas)[None], jnp.asarray(mb)
        ))
        if meta["flipped"]:
            p = p[:, :, ::-1]  # box-frame mask flips back with the box
        probs = p if probs is None else probs + p
    probs = probs / len(metas)
    return boxes, scores, classes, valid, probs
