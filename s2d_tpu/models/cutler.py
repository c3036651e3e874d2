"""CutLER detector: R50-FPN + RPN + cascade ROI heads with DropLoss.

TPU-native rebuild of the reference's CutLER stack (`/root/reference/
model_training/cutler/`), the image detector that seeds the S2D pipeline's
round-0 pseudo-masks:

  * FPN over the d2-compatible ResNet (models/resnet.py): lateral 1x1 +
    output 3x3 convs, p2..p5 + p6 via stride-2 maxpool (d2 FPN/LastLevelMaxPool)
  * RPN: shared 3x3 conv head, 3 anchors/level (aspects 0.5/1/2, sizes
    32..512), objectness BCE + smooth-L1 on deltas; fixed-shape proposal
    selection (per-level top-k -> NMS -> global top-R)
  * cascade ROI heads (`cutler/modeling/roi_heads/custom_cascade_rcnn.py:36`):
    3 stages at IoU thresholds (0.5, 0.6, 0.7), each a 2xFC box head
  * **DropLoss** (`cutler/modeling/roi_heads/roi_heads.py:823-850`): the
    classification loss of a proposal whose max IoU with any ground-truth
    is <= DROPLOSS_IOU_THRESH is zeroed — unlabeled objects in unsupervised
    data are not punished as background. Realized as a 0/1 weight.
  * mask head: 4x conv + deconv on fg proposals (class-agnostic)

Everything fixed-shape: R proposals padded with validity masks; matching is
argmax-IoU (d2 Matcher semantics at thresholds), loss normalization follows
the weighted-all-anchors variant of d2's sampled minibatch (documented
deviation: weighting replaces subsampling, same expectation).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import (
    box_nms,
    clip_boxes,
    decode_deltas,
    encode_deltas,
    pairwise_iou,
)
from ..ops.roi_align import multilevel_roi_align
from .resnet import ResNet

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # p2..p6
ANCHOR_ASPECTS = (0.5, 1.0, 2.0)
FPN_LEVELS = ("p2", "p3", "p4", "p5", "p6")


class FPN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(feats[n])
            for i, n in enumerate(names)
        ]
        # top-down: nearest upsample + add
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                laterals[i + 1], laterals[i].shape, method="nearest"
            )
            laterals[i] = laterals[i] + up
        outs = {
            f"p{i + 2}": nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name=f"output{i}"
            )(laterals[i])
            for i in range(4)
        }
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


def generate_anchors(shapes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
    """Per level: (H*W*A, 4) xyxy anchors in image coords."""
    all_anchors = []
    for li, (h, w) in enumerate(shapes):
        stride = 2 ** (li + 2)
        size = ANCHOR_SIZES[li]
        cell = []
        for aspect in ANCHOR_ASPECTS:
            aw = size * np.sqrt(1.0 / aspect)
            ah = size * np.sqrt(aspect)
            cell.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
        cell = np.asarray(cell)  # (A, 4)
        ys = (np.arange(h) + 0.5) * stride
        xs = (np.arange(w) + 0.5) * stride
        cx, cy = np.meshgrid(xs, ys)
        centers = np.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
        anchors = (centers + cell[None]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors


class RPNHead(nn.Module):
    num_anchors: int = len(ANCHOR_ASPECTS)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv")
        obj_head = nn.Conv(self.num_anchors, (1, 1), name="objectness")
        box_head = nn.Conv(self.num_anchors * 4, (1, 1), name="deltas")
        obj, deltas = [], []
        for name in FPN_LEVELS:
            x = nn.relu(conv(feats[name]))
            obj.append(obj_head(x).reshape(-1))
            deltas.append(box_head(x).reshape(-1, 4))
        return jnp.concatenate(obj), jnp.concatenate(deltas)


class BoxHead(nn.Module):
    num_classes: int = 1

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, name="cls")(x)
        deltas = nn.Dense(4, name="box")(x)  # class-agnostic regression
        return scores, deltas


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats
        for i in range(4):
            x = nn.relu(
                nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name=f"conv{i}")(x)
            )
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), name="deconv")(x))
        return nn.Conv(1, (1, 1), name="predictor")(x)[..., 0]  # (R, 2s, 2s)


@dataclasses.dataclass(frozen=True)
class CutlerConfig:
    num_classes: int = 1
    num_proposals: int = 256
    pre_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    cascade_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    droploss_iou_thresh: float = 0.01
    mask_on: bool = True


class CutlerRCNN(nn.Module):
    """Returns raw per-stage outputs; losses/inference are pure functions
    below (the flax module stays functional)."""

    cfg: CutlerConfig = CutlerConfig()

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        proposals: jnp.ndarray | None = None,
        mask_boxes: jnp.ndarray | None = None,
    ):
        """image (1, H, W, 3) normalized; proposals (R, 4) or None (then
        RPN proposals are selected inside). `mask_boxes` (K, 4) runs the
        mask head on GIVEN boxes instead of the cascade's final boxes —
        the TTA path re-predicts masks at the merged detections, as
        detectron2's GeneralizedRCNNWithTTA does on its
        _rescale_detected_boxes (reference cutler/train_net.py:102-105)."""
        feats = ResNet(depth=50, name="backbone")(image)
        fpn = FPN(name="fpn")({k: v for k, v in feats.items()})
        shapes = [tuple(fpn[n].shape[1:3]) for n in FPN_LEVELS]
        anchors = jnp.asarray(np.concatenate(generate_anchors(shapes)))

        obj_logits, rpn_deltas = RPNHead(name="rpn")(
            {k: v[0] for k, v in fpn.items()}
        )
        h, w = image.shape[1:3]
        if proposals is None:
            proposals, prop_scores = select_proposals(
                anchors, obj_logits, rpn_deltas, (h, w),
                self.cfg.pre_nms_topk, self.cfg.rpn_nms_thresh,
                self.cfg.num_proposals,
            )
        level_feats = {k: fpn[k][0] for k in ("p2", "p3", "p4", "p5")}

        # cascade box stages
        stage_outputs = []
        boxes = proposals
        for si, _ in enumerate(self.cfg.cascade_ious):
            roi = multilevel_roi_align(level_feats, boxes, output_size=7)
            scores, deltas = BoxHead(self.cfg.num_classes, name=f"box_stage{si}")(roi)
            refined = clip_boxes(decode_deltas(boxes, deltas), (h, w))
            stage_outputs.append(
                {"scores": scores, "deltas": deltas, "boxes": boxes}
            )
            boxes = jax.lax.stop_gradient(refined)

        mask_logits = None
        if self.cfg.mask_on:
            mb = boxes if mask_boxes is None else mask_boxes
            roi = multilevel_roi_align(level_feats, mb, output_size=14)
            mask_logits = MaskHead(name="mask_head")(roi)

        return {
            "anchors": anchors,
            "objectness": obj_logits,
            "rpn_deltas": rpn_deltas,
            "proposals": proposals,
            "stages": stage_outputs,
            "final_boxes": boxes,
            "mask_logits": mask_logits,
        }


def select_proposals(
    anchors, obj_logits, deltas, hw, pre_topk, nms_thresh, post_topk
):
    """Fixed-shape RPN proposal selection: global top-k, decode, NMS,
    top post_topk (per-level top-k folded into the global one)."""
    k = min(pre_topk, obj_logits.shape[0])
    scores, idx = jax.lax.top_k(obj_logits, k)
    boxes = clip_boxes(decode_deltas(anchors[idx], deltas[idx]), hw)
    keep = box_nms(boxes, scores, nms_thresh)
    scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, post_topk)
    return boxes[top_idx], top_scores


def rpn_losses(out, gt_boxes, gt_valid, pos_iou=0.7, neg_iou=0.3):
    """Objectness BCE + smooth-L1 deltas, weighted over all anchors."""
    anchors = out["anchors"]
    iou = pairwise_iou(anchors, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)
    # d2 also forces the best anchor per gt positive; weighted variant:
    pos = best_iou >= pos_iou
    neg = best_iou < neg_iou
    labels = pos.astype(jnp.float32)
    weight = (pos | neg).astype(jnp.float32)

    obj = out["objectness"]
    bce = jnp.maximum(obj, 0) - obj * labels + jax.nn.softplus(-jnp.abs(obj))
    loss_obj = (bce * weight).sum() / jnp.maximum(weight.sum(), 1.0)

    tgt_deltas = encode_deltas(anchors, gt_boxes[best_gt])
    diff = out["rpn_deltas"] - tgt_deltas
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2, jnp.abs(diff) - 0.5)
    loss_box = (l1.sum(-1) * pos).sum() / jnp.maximum(pos.sum(), 1.0)
    return {"loss_rpn_cls": loss_obj, "loss_rpn_loc": loss_box}


def mask_loss(out, gt_masks, gt_boxes, gt_valid, cfg: CutlerConfig):
    """Per-proposal BCE between predicted 28x28 mask logits and the matched
    ground-truth mask cropped to the proposal box (d2 mask head loss,
    class-agnostic). gt_masks: (G, H, W) bool at image resolution."""
    from ..ops.roi_align import roi_align

    boxes = out["final_boxes"]
    iou = pairwise_iou(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)
    fg = (best_iou >= cfg.cascade_ious[-1]).astype(jnp.float32)

    logits = out["mask_logits"]  # (R, 2s, 2s)
    side = logits.shape[-1]
    # crop each matched gt mask to its proposal box at the mask resolution
    gt_rows = gt_masks.astype(jnp.float32)[..., None]  # (G, H, W, 1)
    crops = []
    for gi in range(gt_masks.shape[0]):
        crops.append(roi_align(gt_rows[gi], boxes, output_size=side, sampling_ratio=1))
    targets = jnp.stack(crops)[best_gt, jnp.arange(boxes.shape[0])][..., 0] > 0.5
    targets = targets.astype(jnp.float32)

    bce = jnp.maximum(logits, 0) - logits * targets + jax.nn.softplus(-jnp.abs(logits))
    per_roi = bce.mean(axis=(1, 2))
    return {"loss_mask": (per_roi * fg).sum() / jnp.maximum(fg.sum(), 1.0)}


def roi_losses(out, gt_boxes, gt_labels, gt_valid, cfg: CutlerConfig):
    """Cascade box losses with DropLoss + (optional) mask loss hooks.

    DropLoss: proposals whose max IoU with ANY gt is <= droploss_iou_thresh
    get ZERO classification loss (reference roi_heads.py:823-850) — they
    may be unlabeled objects, not background."""
    losses = {}
    for si, (stage, match_iou) in enumerate(zip(out["stages"], cfg.cascade_ious)):
        boxes = stage["boxes"]
        iou = pairwise_iou(boxes, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        best_iou = iou.max(axis=1)
        best_gt = iou.argmax(axis=1)
        fg = best_iou >= match_iou
        cls_target = jnp.where(fg, gt_labels[best_gt], cfg.num_classes)

        logp = jax.nn.log_softmax(stage["scores"].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, cls_target[:, None], axis=-1)[:, 0]
        drop = best_iou > cfg.droploss_iou_thresh  # keep loss only for these
        cls_weight = drop.astype(jnp.float32)
        losses[f"loss_cls_stage{si}"] = (nll * cls_weight).sum() / jnp.maximum(
            cls_weight.sum(), 1.0
        )

        tgt_deltas = encode_deltas(boxes, gt_boxes[best_gt])
        diff = stage["deltas"] - tgt_deltas
        l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2, jnp.abs(diff) - 0.5)
        fgw = fg.astype(jnp.float32)
        losses[f"loss_box_stage{si}"] = (l1.sum(-1) * fgw).sum() / jnp.maximum(
            fgw.sum(), 1.0
        )
    return losses
