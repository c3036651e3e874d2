"""DISTILLATION_NMS semantics vs a torch re-implementation of the
reference's `prepare_distillation_targets(..., nms=True)`
(`/root/reference/model_training/mask2former_video/
kd_video_maskformer_model.py:418-528`): top-k (k == Q, class-agnostic),
score threshold, upsample x4 + binarize at 0, then greedy same-class
mask-IoU NMS visiting candidates in score order (keep iff IoU <= thresh
with every still-kept earlier same-class candidate).

The fixed-shape JAX version (train.distillation_nms) keeps all Q slots and
returns a (B, Q) validity; the torch loop returns a kept index list — the
test asserts the surviving QUERY SETS are identical.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2d_tpu.train import distillation_nms, prepare_distillation_targets

B, Q, T, MH, MW = 2, 12, 3, 16, 24  # mask logits at stride-4
PAD_HW = (MH * 4, MW * 4)
NUM_CLASSES = 1
SCORE_THR = 0.55
NMS_THR = 0.6


def torch_reference_nms(pred_logits, pred_masks):
    """Reference prepare_distillation_targets nms=True path, one video.

    Returns the set of original query indices that survive threshold+NMS.
    """
    scores_all = F.softmax(pred_logits, dim=-1)[:, :-1]  # (Q, K)
    # k == Q, class-agnostic: top-k over flattened (Q, K); visit order is
    # score-descending (the reference's topk feed)
    scores_per_image, topk = scores_all.flatten(0, 1).topk(Q, sorted=True)
    labels_per_image = topk % NUM_CLASSES
    qidx = torch.div(topk, NUM_CLASSES, rounding_mode="floor")

    masks = pred_masks[qidx]
    score_mask = scores_per_image >= SCORE_THR
    scores_per_image = scores_per_image[score_mask]
    labels_per_image = labels_per_image[score_mask]
    qidx = qidx[score_mask]
    masks = masks[score_mask]

    masks = F.interpolate(
        masks, size=PAD_HW, mode="bilinear", align_corners=False
    )
    bin_masks = masks > 0.0

    keep = []
    indices = list(range(len(scores_per_image)))
    while indices:
        cur = indices.pop(0)
        keep.append(cur)
        rest = []
        for other in indices:
            if labels_per_image[other] != labels_per_image[cur]:
                rest.append(other)
                continue
            inter = torch.sum(bin_masks[cur] & bin_masks[other]).float()
            union = torch.sum(bin_masks[cur] | bin_masks[other]).float()
            iou = inter / union if union > 0 else 0.0
            if iou > NMS_THR:
                continue
            rest.append(other)
        indices = rest
    return {int(qidx[i]) for i in keep}


@pytest.fixture(scope="module")
def teacher_out():
    rng = np.random.RandomState(5)
    logits = rng.randn(B, Q, NUM_CLASSES + 1).astype(np.float32) * 2.0
    # blocky mask logits so several queries genuinely overlap above the
    # NMS threshold and several don't
    base = rng.randn(4, T, MH, MW).astype(np.float32) * 3.0
    mix = base[rng.randint(0, 4, size=(B, Q))]
    noise = rng.randn(B, Q, T, MH, MW).astype(np.float32) * 0.3
    masks = (mix + noise).astype(np.float32)
    return {
        "pred_logits": jnp.asarray(logits),
        "pred_masks": jnp.asarray(masks),
    }


def test_distillation_nms_matches_reference_loop(teacher_out):
    kd_masks, kd_valid = prepare_distillation_targets(
        teacher_out, SCORE_THR, PAD_HW
    )
    keep = jax.jit(
        lambda m, o, v: distillation_nms(m, o, v, NMS_THR)
    )(kd_masks, teacher_out, kd_valid)
    keep = np.asarray(keep)
    valid = np.asarray(kd_valid)

    # NMS only ever shrinks the valid set
    assert not np.any(keep & ~valid)

    any_suppressed = False
    for b in range(B):
        ref_keep = torch_reference_nms(
            torch.from_numpy(np.asarray(teacher_out["pred_logits"][b])),
            torch.from_numpy(np.asarray(teacher_out["pred_masks"][b])),
        )
        got_keep = {int(q) for q in np.flatnonzero(keep[b])}
        assert got_keep == ref_keep, (b, got_keep, ref_keep)
        any_suppressed |= len(ref_keep) < int(valid[b].sum())
    # the fixture must actually exercise suppression
    assert any_suppressed


def test_distillation_nms_invalid_cannot_suppress(teacher_out):
    """A below-threshold candidate must not suppress a valid one even if
    they overlap perfectly (the reference filters before NMS)."""
    logits = np.asarray(teacher_out["pred_logits"]).copy()
    # make query 0 high-score and query 1 low-score with identical masks
    logits[:, 0, 0] = 8.0
    logits[:, 1, 0] = -8.0
    masks = np.asarray(teacher_out["pred_masks"]).copy()
    masks[:, 0] = masks[:, 1]
    out = {
        "pred_logits": jnp.asarray(logits),
        "pred_masks": jnp.asarray(masks),
    }
    kd_masks, kd_valid = prepare_distillation_targets(out, SCORE_THR, PAD_HW)
    keep = distillation_nms(kd_masks, out, kd_valid, NMS_THR)
    assert bool(keep[0, 0]) and bool(keep[1, 0])
    assert not bool(keep[0, 1]) and not bool(keep[1, 1])
