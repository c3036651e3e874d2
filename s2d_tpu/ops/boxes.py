"""Box operations for the CutLER detector: IoU, deltas, NMS, clipping.

TPU-native (fixed-shape, jit-friendly) equivalents of the box utilities the
reference's CutLER stack gets from detectron2 (`/root/reference/
model_training/cutler/structures/boxes.py` + d2 Boxes/Matcher):

  * pairwise IoU on (N, 4) xyxy boxes
  * detectron2 Box2BoxTransform deltas (dx, dy, dw, dh with log-space
    size terms, weights (1, 1, 1, 1), scale clamp)
  * greedy score-ordered NMS as a fori_loop over the IoU matrix (same
    keep-set as torchvision.ops.nms)
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def encode_deltas(src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """d2 Box2BoxTransform.get_deltas(src_boxes, target_boxes)."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    return jnp.stack(
        [
            (tcx - scx) / jnp.maximum(sw, 1e-6),
            (tcy - scy) / jnp.maximum(sh, 1e-6),
            jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(sw, 1e-6)),
            jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(sh, 1e-6)),
        ],
        axis=-1,
    )


def decode_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """d2 Box2BoxTransform.apply_deltas(deltas, boxes)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    dw = jnp.clip(dw, max=SCALE_CLAMP)
    dh = jnp.clip(dh, max=SCALE_CLAMP)
    ncx = dx * w + cx
    ncy = dy * h + cy
    nw = jnp.exp(dw) * w
    nh = jnp.exp(dh) * h
    return jnp.stack(
        [ncx - 0.5 * nw, ncy - 0.5 * nh, ncx + 0.5 * nw, ncy + 0.5 * nh], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def box_nms(
    boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Greedy NMS keep-mask; candidates visited in score order."""
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = pairwise_iou(sorted_boxes, sorted_boxes)
    n = boxes.shape[0]
    idx = jnp.arange(n)

    def body(i, keep):
        suppress = (iou[i] > threshold) & (idx > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
