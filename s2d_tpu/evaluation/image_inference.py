"""Image MaskFormer inference heads: semantic / panoptic / instance.

Rebuild of the reference image meta-arch's three inference modes
(`/root/reference/model_training/mask2former/maskformer_model.py:281-381`):

  * semantic_inference (line 281): per-pixel class probabilities via
    einsum(softmax(cls)[:, :-1], sigmoid(masks))
  * panoptic_inference (287): keep queries whose top class prob >= the
    object threshold, per-pixel argmax over score-weighted sigmoid masks,
    drop segments whose surviving area is under `overlap_threshold` of
    their full mask
  * instance_inference (345): top-k over the (Q, K) score grid, mask-prob
    rescoring score *= mean sigmoid inside the binarized mask

The image model itself is `VideoMaskFormer` at T=1 with `pe_3d=False`
(2D sine PE, matching the reference image decoder).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def semantic_inference(pred_logits: jnp.ndarray, pred_masks: jnp.ndarray) -> jnp.ndarray:
    """(Q, K+1) logits, (Q, H, W) mask logits -> (K, H, W) class probs."""
    cls = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[:, :-1]
    masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))
    return jnp.einsum("qk,qhw->khw", cls, masks)


def panoptic_inference(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (seg_map (H, W) int32 with 0 = void, per-query info dict).

    Fixed-shape variant of the reference loop: every query keeps a segment
    id (its index + 1); dropped queries (below the object threshold, losing
    the pixel argmax everywhere, or failing the overlap test) simply own no
    pixels and are marked invalid in the info dict."""
    q = pred_logits.shape[0]
    scores_all = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    scores, labels = scores_all[:, :-1].max(-1), scores_all[:, :-1].argmax(-1)
    no_object = scores_all[:, -1]
    keep = (scores > object_mask_threshold) & (scores > no_object * 0)

    mask_probs = jax.nn.sigmoid(pred_masks.astype(jnp.float32))  # (Q, H, W)
    weighted = jnp.where(keep[:, None, None], scores[:, None, None] * mask_probs, -1.0)
    owner = jnp.argmax(weighted, axis=0)  # (H, W)
    owner_prob = jnp.take_along_axis(mask_probs, owner[None], axis=0)[0]
    valid_pixel = (owner_prob >= 0.5) & jnp.take_along_axis(
        keep.astype(jnp.int32)[:, None, None], owner[None], axis=0
    )[0].astype(bool)

    seg = jnp.where(valid_pixel, owner + 1, 0)
    # overlap test: surviving area / full (>=0.5) mask area per query
    full_area = (mask_probs >= 0.5).sum(axis=(1, 2))
    surv_area = jax.vmap(lambda i: (seg == i + 1).sum())(jnp.arange(q))
    ok = keep & (full_area > 0) & (surv_area / jnp.maximum(full_area, 1) >= overlap_threshold)
    seg = jnp.where(jnp.isin(seg - 1, jnp.flatnonzero(ok, size=q, fill_value=-1)), seg, 0)
    info = {"labels": labels, "scores": scores, "valid": ok}
    return seg, info


def instance_inference(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    num_classes: int,
    topk: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Top-k instances with mask-prob rescoring."""
    q = pred_logits.shape[0]
    scores = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[:, :-1]
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
    labels = top_idx % num_classes
    query_idx = top_idx // num_classes
    masks = pred_masks[query_idx].astype(jnp.float32)
    probs = jax.nn.sigmoid(masks)
    binary = masks > 0
    mask_score = (probs * binary).sum(axis=(1, 2)) / jnp.maximum(
        binary.sum(axis=(1, 2)), 1e-6
    )
    return {
        "scores": top_scores * mask_score,
        "labels": labels,
        "masks": binary,
    }
