"""Demo-protocol end-to-end parity (BASELINE.md north star #3).

The reference's demo/eval protocol — upsample stride-4 mask logits to the
padded input (bilinear, align_corners=False), top `NUM_PREDICTIONS`
(query, class) pairs by softmax score, crop padding, resize to the original
video resolution, binarize at logit 0, greedy same-class mask-IoU NMS, then
the demo confidence threshold — re-implemented in torch inside this test
exactly as `/root/reference/model_training/mask2former_video/
kd_video_maskformer_model.py:330-356,530-610` (incl. its upsample-then-select
order), and compared against the converted JAX model + `postprocess_video`
at matched thresholds.

"Bit-comparable at matched thresholds" is asserted as:
  * identical top-k selection (scores within fp tolerance, labels/queries
    exactly equal),
  * identical NMS keep set and identical post-confidence-threshold set,
  * binary masks exactly equal on every pixel whose torch mask logit is
    more than the cross-implementation fp tolerance away from the 0
    threshold (the two stacks' conv/resize reduction orders differ at
    ~1e-3 — see test_golden_parity tolerances), and a <0.5% global bound
    on boundary-pixel flips.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2d_tpu.checkpoint.torch_import import (
    convert_reference_network,
    extract_network,
)
from s2d_tpu.evaluation.inference import (
    finalize_predictions,
    postprocess_video,
    unpack_masks,
)
from s2d_tpu.models import VideoMaskFormer

from torch_oracle import TorchVideoMaskFormer

HID, QUERIES, HEADS, FF, DEC, ENC = 64, 10, 4, 128, 4, 2
NUM_CLASSES = 1
T = 2
IN_H, IN_W = 64, 96  # network input (also the unpadded image size here)
OUT_H, OUT_W = 128, 192  # "original video" resolution
NUM_PRED = 10  # == Q*K so every query participates
NMS_THRESH = 0.75
CONF_THRESH = 0.8  # demo protocol: demo_video/demo.py --confidence-threshold
LOGIT_MARGIN = 5e-3  # fp tolerance band around the binarization threshold


def torch_demo_postprocess(pred_logits, pred_masks):
    """Reference inference_video + demo threshold, torch semantics."""
    scores = F.softmax(pred_logits, dim=-1)[:, :-1]
    top_scores, topk = scores.flatten(0, 1).topk(NUM_PRED, sorted=True)
    labels = topk % NUM_CLASSES
    qidx = torch.div(topk, NUM_CLASSES, rounding_mode="floor")

    # reference order: upsample ALL queries to the padded input size first
    # (kd_video_maskformer_model.py:341-346), select after
    up = F.interpolate(
        pred_masks, size=(IN_H, IN_W), mode="bilinear", align_corners=False
    )
    sel = up[qidx]
    sel = sel[:, :, :IN_H, :IN_W]  # crop padding (none at these shapes)
    sel = F.interpolate(
        sel, size=(OUT_H, OUT_W), mode="bilinear", align_corners=False
    )
    masks = sel > 0.0

    # greedy same-class mask-IoU NMS (inference_video:553-580)
    indices = list(range(NUM_PRED))
    keep = []
    while indices:
        cur = indices.pop(0)
        keep.append(cur)
        rest = []
        for other in indices:
            if labels[other] != labels[cur]:
                rest.append(other)
                continue
            inter = torch.sum(masks[cur] & masks[other]).float()
            union = torch.sum(masks[cur] | masks[other]).float()
            iou = inter / union if union > 0 else 0.0
            if iou <= NMS_THRESH:
                rest.append(other)
        indices = rest
    keep_mask = torch.zeros(NUM_PRED, dtype=torch.bool)
    keep_mask[torch.as_tensor(keep)] = True
    return {
        "scores": top_scores,
        "labels": labels,
        "query_idx": qidx,
        "mask_logits": sel,
        "masks": masks,
        "keep": keep_mask,
    }


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(3)
    tm = TorchVideoMaskFormer(
        num_classes=NUM_CLASSES, hidden_dim=HID, mask_dim=HID,
        num_queries=QUERIES, nheads=HEADS, dim_ff=FF,
        dec_layers=DEC, enc_layers=ENC,
    )
    tm.eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_reference_network(
        extract_network(state), dec_layers=DEC, enc_layers=ENC
    )
    jm = VideoMaskFormer(
        num_classes=NUM_CLASSES, hidden_dim=HID, mask_dim=HID,
        num_queries=QUERIES, nheads=HEADS, dim_feedforward=FF,
        dec_layers=DEC + 1, transformer_enc_layers=ENC,
        compute_dtype=jnp.float32,
    )
    return tm, jm, params


def test_demo_protocol_mask_parity(models):
    tm, jm, params = models
    rng = np.random.RandomState(7)
    images = rng.randn(T, IN_H, IN_W, 3).astype(np.float32)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(images).permute(0, 3, 1, 2), num_frames=T)
    ref = torch_demo_postprocess(
        ref_out["pred_logits"][0], ref_out["pred_masks"][0]
    )

    out = jm.apply(params, jnp.asarray(images)[None])
    got_dev = postprocess_video(
        out["pred_logits"][0],
        out["pred_masks"][0],
        num_predictions=NUM_PRED,
        num_classes=NUM_CLASSES,
        image_size=(IN_H, IN_W),
        output_size=(OUT_H, OUT_W),
        use_nms=True,
        nms_thresh=NMS_THRESH,
        compute_dtype=jnp.float32,
    )

    # 1. identical selection: same queries/labels in the same order
    np.testing.assert_array_equal(
        np.asarray(got_dev["labels"]), ref["labels"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got_dev["scores"]), ref["scores"].numpy(), atol=1e-4
    )

    # 2. identical NMS keep set
    np.testing.assert_array_equal(
        np.asarray(got_dev["keep"]), ref["keep"].numpy()
    )

    # 3. binary masks bit-equal away from the fp boundary band
    got_masks = unpack_masks(got_dev)
    ref_masks = ref["masks"].numpy()
    ref_logits = ref["mask_logits"].numpy()
    decided = np.abs(ref_logits) > LOGIT_MARGIN
    np.testing.assert_array_equal(got_masks[decided], ref_masks[decided])
    flip_frac = (got_masks != ref_masks).mean()
    assert flip_frac < 5e-3, f"boundary flips {flip_frac:.2%}"
    assert decided.mean() > 0.95  # the margin band is actually narrow

    # 4. demo confidence threshold: identical surviving set
    got = finalize_predictions(got_dev)
    got_surv = got["scores"] >= CONF_THRESH
    ref_surv = ref["scores"].numpy()[ref["keep"].numpy()] >= CONF_THRESH
    np.testing.assert_array_equal(got_surv, ref_surv)
