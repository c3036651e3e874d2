"""Mask-IoU NMS, jit-friendly and fixed-shape.

The reference's inference does greedy same-class NMS over binarized video
masks with whole-track IoU (`/root/reference/model_training/mask2former_video/
video_maskformer_model.py:320-359`) — a Python while-loop over GPU tensors.
TPU-native formulation: the pairwise intersection is one (N, T*H*W) x
(T*H*W, N) matmul on the MXU (accumulated frame-by-frame via scan to bound
memory), and the sequential greedy suppression is a fori_loop over the N x N
IoU matrix — same keep-set as the reference's loop, no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_iou_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """Pairwise track IoU of binarized masks.

    Args:
      masks: (N, T, H, W) bool/0-1 masks.

    Returns:
      (N, N) float32 IoU (0 where union is empty).
    """
    n, t = masks.shape[0], masks.shape[1]
    # bf16 inputs (0/1 exactly representable) with f32 accumulation: the
    # fast MXU path, bit-exact for counts below 2^24
    flat = masks.reshape(n, t, -1).astype(jnp.bfloat16)

    def frame_step(carry, frame):  # frame: (N, H*W)
        inter, area = carry
        inter = inter + jnp.matmul(
            frame, frame.T, preferred_element_type=jnp.float32
        )
        area = area + frame.sum(axis=1, dtype=jnp.float32)
        return (inter, area), None

    (inter, area), _ = jax.lax.scan(
        frame_step,
        (jnp.zeros((n, n), jnp.float32), jnp.zeros((n,), jnp.float32)),
        flat.transpose(1, 0, 2),
    )
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def greedy_mask_nms(
    iou: jnp.ndarray, labels: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Sequential greedy NMS on a precomputed IoU matrix.

    Candidates are assumed score-sorted descending (index order = visit
    order, as in the reference where topk(sorted=True) feeds the loop).
    A later candidate is suppressed iff some still-kept earlier candidate of
    the same label has IoU > threshold with it.

    Returns a (N,) bool keep mask.
    """
    n = iou.shape[0]
    idx = jnp.arange(n)

    def body(i, keep):
        same_label = labels == labels[i]
        suppress = (iou[i] > threshold) & same_label & (idx > i) & keep[i]
        return keep & ~suppress

    keep = jnp.ones((n,), dtype=bool)
    return jax.lax.fori_loop(0, n, body, keep)
