"""Semantic test-time augmentation.

Rebuild of the reference's `SemanticSegmentorWithTTA`
(`/root/reference/model_training/mask2former/test_time_augmentation.py:103`):
the model is run on a set of augmented views — multi-scale resizes and a
horizontal flip of each — and the per-pixel semantic class probabilities
are averaged after warping every prediction back to the original
resolution (flip undone, bilinear resize back, following the reference's
postprocess order: upsample to padded size -> crop -> resize to original).

The model forward stays one jit per distinct input shape; the view loop is
host-side (shapes differ per scale, exactly like the reference's
DatasetMapperTTA views).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from ..ops.resize import interpolate_bilinear
from .image_inference import semantic_inference


def tta_semantic_inference(
    apply_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    image: jnp.ndarray,  # (H, W, 3) normalized float RGB
    scales: Sequence[float] = (0.75, 1.0, 1.25),
    flip: bool = True,
    size_divisibility: int = 32,
) -> jnp.ndarray:
    """apply_fn maps a padded (1, 1, h, w, 3) clip to (pred_logits (Q, K+1),
    pred_masks (Q, h/4, w/4)); returns averaged (K, H, W) class probs."""
    h, w = image.shape[:2]
    chw = jnp.moveaxis(image, -1, 0)  # resize ops act on trailing (H, W)
    total = None
    count = 0
    for scale in scales:
        nh = max(int(round(h * scale)), size_divisibility)
        nw = max(int(round(w * scale)), size_divisibility)
        view = interpolate_bilinear(chw, (nh, nw))
        views = [view] + ([view[:, :, ::-1]] if flip else [])
        for vi, v in enumerate(views):
            pad_h, pad_w = -nh % size_divisibility, -nw % size_divisibility
            padded = jnp.pad(v, ((0, 0), (0, pad_h), (0, pad_w)))
            clip = jnp.moveaxis(padded, 0, -1)[None, None]  # (1,1,h,w,3)
            logits, masks = apply_fn(clip)
            # reference postprocess: upsample to padded input size, crop the
            # valid region, then resize to the original resolution
            masks = interpolate_bilinear(masks, (nh + pad_h, nw + pad_w))
            masks = masks[:, :nh, :nw]
            masks = interpolate_bilinear(masks, (h, w))
            probs = semantic_inference(logits, masks)
            if vi == 1:
                probs = probs[:, :, ::-1]
            total = probs if total is None else total + probs
            count += 1
    return total / count
