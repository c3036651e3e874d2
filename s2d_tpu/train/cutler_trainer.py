"""CutLER detector training: solver, jit train step, cascade inference.

Rebuild of the reference's CutLER trainer stack:
  * solver with BASE_LR_MULTIPLIER / BASE_LR_MULTIPLIER_NAMES
    (`/root/reference/model_training/cutler/solver/build.py:123-142`):
    SGD+momentum where any parameter whose dotted name contains one of the
    multiplier names gets lr * multiplier.
  * one jit train step = forward + RPN/cascade-ROI(+DropLoss)/mask losses
    (`cutler/engine/train_loop.py`), bf16-free (detector is small; f32).
  * cascade inference (`detectron2` CascadeROIHeads semantics): class
    scores averaged over the three stages, boxes from the last stage,
    score threshold + NMS + top-k — fixed shape with a validity mask.
  * host-side image mapper: shortest-edge resize + hflip + fixed square
    pad, targets as padded boxes/labels/masks
    (`cutler/data/dataset_mapper.py`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cutler import (
    CutlerConfig,
    mask_loss,
    roi_losses,
    rpn_losses,
)
from ..ops.boxes import box_nms
from .schedules import warmup_multistep_lr


@dataclasses.dataclass(frozen=True)
class CutlerTrainerConfig:
    # model
    rcnn: CutlerConfig = CutlerConfig()
    pixel_mean: Tuple[float, ...] = (123.675, 116.280, 103.530)
    pixel_std: Tuple[float, ...] = (58.395, 57.120, 57.375)
    # data
    image_size: int = 512          # fixed square pad (static shapes)
    min_size_train: int = 480
    max_instances: int = 32
    flip: bool = True
    # image copy-paste (reference cutler/config/cutler_config.py:6-11,
    # applied per step in cutler/engine/train_loop.py run_step)
    copy_paste: bool = False
    copy_paste_rate: float = 1.0
    copy_paste_min_ratio: float = 0.5
    copy_paste_max_ratio: float = 1.0
    copy_paste_random_num: bool = True
    # solver (reference cutler Base config: SGD, momentum 0.9)
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 5e-5
    base_lr_multiplier: float = 1.0
    base_lr_multiplier_names: Tuple[str, ...] = ()
    steps: Tuple[int, ...] = (60000,)
    gamma: float = 0.1
    warmup_iters: int = 1000
    warmup_factor: float = 0.001
    max_iter: int = 80000
    clip_value: float = 0.0        # 0 = no clipping (d2 cutler default)
    # d2 CLIP_GRADIENTS.CLIP_TYPE: "norm" (per-parameter clip_grad_norm_,
    # the model-zoo setting), "value" (elementwise clamp, d2 default), or
    # "full_model" (global norm)
    clip_type: str = "norm"
    # SOLVER.IMS_PER_BATCH realized as gradient accumulation over
    # single-image micro-steps (one optimizer step per accum_steps)
    accum_steps: int = 1
    # test
    score_thresh: float = 0.005
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    no_segm: bool = False
    # TEST.AUG: end-of-eval multi-scale + hflip TTA (reference
    # cutler/train_net.py:100-113 GeneralizedRCNNWithTTA; d2 defaults)
    test_aug_enabled: bool = False
    test_aug_min_sizes: Tuple[int, ...] = (
        400, 500, 600, 700, 800, 900, 1000, 1100, 1200,
    )
    test_aug_max_size: int = 4000
    test_aug_flip: bool = True


def load_cutler_yaml(path: str) -> Tuple[dict, dict, dict]:
    """d2-style CutLER yaml -> (trainer-field dict, rcnn-field dict,
    datasets dict).

    Accepts the reference's config surface (`cutler/model_zoo/configs/*`,
    `configs/cuts3d/*`: Base-RCNN-FPN inheritance via `_BASE_`) and maps
    the keys this trainer models; unmapped d2 keys (backbone internals,
    pooler shapes, PRECISE_BN, ...) are accepted and ignored — they
    configure detectron2 plumbing that has no analog here. MIN_SIZE_TRAIN
    scale lists collapse to their median (our mapper resizes to ONE
    static train size; the reference samples per step)."""
    import ast
    import statistics

    from ..config.loader import _load_yaml_with_base

    y = _load_yaml_with_base(path)
    model = y.get("MODEL", {})
    solver = y.get("SOLVER", {})
    dl = y.get("DATALOADER", {})
    inp = y.get("INPUT", {})
    test = y.get("TEST", {})
    roi = model.get("ROI_HEADS", {})
    rpn = model.get("RPN", {})

    fields: dict = {}
    rcnn: dict = {}

    def put(d, key, val):
        if val is not None:
            d[key] = val

    put(fields, "pixel_mean", tuple(model["PIXEL_MEAN"]) if "PIXEL_MEAN" in model else None)
    put(fields, "pixel_std", tuple(model["PIXEL_STD"]) if "PIXEL_STD" in model else None)
    put(fields, "copy_paste", dl.get("COPY_PASTE"))
    put(fields, "copy_paste_rate", dl.get("COPY_PASTE_RATE"))
    put(fields, "copy_paste_min_ratio", dl.get("COPY_PASTE_MIN_RATIO"))
    put(fields, "copy_paste_max_ratio", dl.get("COPY_PASTE_MAX_RATIO"))
    put(fields, "copy_paste_random_num", dl.get("COPY_PASTE_RANDOM_NUM"))
    put(fields, "base_lr", solver.get("BASE_LR"))
    put(fields, "momentum", solver.get("MOMENTUM"))
    put(fields, "weight_decay", solver.get("WEIGHT_DECAY"))
    put(fields, "base_lr_multiplier", solver.get("BASE_LR_MULTIPLIER"))
    if solver.get("BASE_LR_MULTIPLIER_NAMES") is not None:
        fields["base_lr_multiplier_names"] = tuple(
            solver["BASE_LR_MULTIPLIER_NAMES"]
        )
    if solver.get("STEPS") is not None:
        steps = solver["STEPS"]
        if isinstance(steps, str):
            steps = ast.literal_eval(steps)  # yacs tuple-as-string
        fields["steps"] = tuple(steps)
    put(fields, "gamma", solver.get("GAMMA"))
    put(fields, "warmup_iters", solver.get("WARMUP_ITERS"))
    put(fields, "warmup_factor", solver.get("WARMUP_FACTOR"))
    put(fields, "max_iter", solver.get("MAX_ITER"))
    # IMS_PER_BATCH -> accumulation: N single-image micro-steps average
    # into one optimizer step, so BASE_LR/MAX_ITER keep their reference
    # batch-N meaning (the CLI runs max_iter * accum_steps micro-steps)
    put(fields, "accum_steps", solver.get("IMS_PER_BATCH"))
    clip = solver.get("CLIP_GRADIENTS", {})
    if clip.get("ENABLED"):
        # d2 defaults: CLIP_VALUE 1.0, CLIP_TYPE "value" when unset
        fields["clip_value"] = float(clip.get("CLIP_VALUE", 1.0))
        fields["clip_type"] = str(clip.get("CLIP_TYPE", "value"))
    if inp.get("MIN_SIZE_TRAIN") is not None:
        sizes = inp["MIN_SIZE_TRAIN"]
        if isinstance(sizes, str):
            sizes = ast.literal_eval(sizes)
        if isinstance(sizes, (list, tuple)):
            fields["min_size_train"] = int(statistics.median(sizes))
        else:
            fields["min_size_train"] = int(sizes)
    put(fields, "score_thresh", roi.get("SCORE_THRESH_TEST"))
    put(fields, "nms_thresh", roi.get("NMS_THRESH_TEST"))
    put(fields, "detections_per_image", test.get("DETECTIONS_PER_IMAGE"))
    put(fields, "no_segm", test.get("NO_SEGM"))
    aug = test.get("AUG", {})
    put(fields, "test_aug_enabled", aug.get("ENABLED"))
    if aug.get("MIN_SIZES") is not None:
        sizes = aug["MIN_SIZES"]
        if isinstance(sizes, str):
            sizes = ast.literal_eval(sizes)
        fields["test_aug_min_sizes"] = tuple(int(x) for x in sizes)
    put(fields, "test_aug_max_size", aug.get("MAX_SIZE"))
    put(fields, "test_aug_flip", aug.get("FLIP"))

    put(rcnn, "num_classes", roi.get("NUM_CLASSES"))
    # Reference semantics (cutler/config/cutler_config.py:13-14): DropLoss
    # is OFF unless USE_DROPLOSS: True; when on, the threshold defaults to
    # 0.0. thresh -1 keeps every proposal's loss (best_iou > -1 always);
    # our `best_iou > thresh` keep-mask is the exact complement of the
    # reference's `iou_max.le(thresh)` drop-mask (roi_heads.py:823-850).
    if roi.get("USE_DROPLOSS"):
        rcnn["droploss_iou_thresh"] = float(roi.get("DROPLOSS_IOU_THRESH", 0.0))
    else:
        rcnn["droploss_iou_thresh"] = -1.0
    # ROI head family (cutler/modeling/roi_heads/): CustomCascadeROIHeads
    # = 3-stage cascade (our CutlerConfig default); CustomStandardROIHeads
    # (model_zoo mask_rcnn_R_50_FPN.yaml) = one box stage matched at IoU
    # 0.5 — a 1-tuple cascade_ious degenerates to exactly that (stage-score
    # average over one stage is that stage; our delta codec is weight-free
    # so d2's per-stage box2box weights have no analog).
    if roi.get("NAME") in ("CustomStandardROIHeads", "StandardROIHeads"):
        rcnn["cascade_ious"] = (0.5,)
    put(rcnn, "rpn_nms_thresh", rpn.get("NMS_THRESH"))
    put(rcnn, "pre_nms_topk", rpn.get("PRE_NMS_TOPK_TEST"))
    put(rcnn, "mask_on", model.get("MASK_ON"))

    datasets = {}
    ds = y.get("DATASETS", {})
    for k in ("TRAIN", "TEST"):
        v = ds.get(k)
        if isinstance(v, str):
            v = ast.literal_eval(v)
        if v:
            datasets[k.lower()] = v[0] if isinstance(v, (list, tuple)) else v
    return fields, rcnn, datasets


def clip_by_per_param_norm(max_norm: float) -> optax.GradientTransformation:
    """d2 CLIP_TYPE 'norm': torch clip_grad_norm_ applied to EACH parameter
    tensor separately (per_param_clipper, d2 solver/build.py) — NOT the
    global norm, which with hundreds of tensors is ~sqrt(#tensors) larger
    and would clip nearly every step."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def clip(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / (n + 1e-6))

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init, update)


def build_cutler_optimizer(
    params,
    cfg: CutlerTrainerConfig,
) -> optax.GradientTransformation:
    """SGD+momentum with per-name LR multipliers.

    Reference `cutler/solver/build.py:123-142`: for each named parameter,
    if any entry of BASE_LR_MULTIPLIER_NAMES is a substring of the full
    dotted name, its lr becomes base_lr * BASE_LR_MULTIPLIER.
    `accum_steps` realizes SOLVER.IMS_PER_BATCH as gradient accumulation
    over single-image micro-steps (optax.MultiSteps: the LR schedule and
    the clip see the AVERAGED batch gradient on boundaries, matching the
    reference's one-optimizer-step-per-batch semantics)."""
    from .optim import scale_by_tree

    names = cfg.base_lr_multiplier_names

    def label(path, leaf):
        full = ".".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        return "mult" if any(n in full for n in names) else "base"

    labels = jax.tree_util.tree_map_with_path(label, params)
    mult_tree = jax.tree_util.tree_map(
        lambda l: cfg.base_lr_multiplier if l == "mult" else 1.0, labels
    )

    schedule = warmup_multistep_lr(
        cfg.base_lr, cfg.steps, cfg.gamma, cfg.warmup_iters, cfg.warmup_factor
    )

    if cfg.clip_value > 0:
        clip = (
            clip_by_per_param_norm(cfg.clip_value)
            if cfg.clip_type == "norm"
            else optax.clip(cfg.clip_value)
            if cfg.clip_type == "value"
            else optax.clip_by_global_norm(cfg.clip_value)  # full_model
        )
    else:
        clip = optax.identity()
    chain = [
        clip,
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum),
        scale_by_tree(mult_tree),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*chain)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def make_cutler_train_step(model, cfg: CutlerTrainerConfig, tx):
    """Returns jit-able step(params, opt_state, image, gt_boxes,
    gt_labels, gt_valid, gt_masks) -> (params, opt_state, metrics)."""

    def loss_fn(params, image, gt_boxes, gt_labels, gt_valid, gt_masks):
        out = model.apply(params, image)
        losses = {}
        losses.update(rpn_losses(out, gt_boxes, gt_valid,
                                 cfg.rcnn.rpn_pos_iou, cfg.rcnn.rpn_neg_iou))
        losses.update(roi_losses(out, gt_boxes, gt_labels, gt_valid, cfg.rcnn))
        if cfg.rcnn.mask_on and not cfg.no_segm:
            losses.update(mask_loss(out, gt_masks, gt_boxes, gt_valid, cfg.rcnn))
        total = sum(losses.values())
        return total, losses

    def step_fn(params, opt_state, image, gt_boxes, gt_labels,
                gt_valid, gt_masks):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, image, gt_boxes, gt_labels, gt_valid, gt_masks
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return params, opt_state, metrics

    return step_fn


def cascade_detections(
    out: Dict,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    topk: int,
    with_masks: bool = False,
):
    """Cascade R-CNN inference (d2 CascadeROIHeads): per-proposal class
    probability = MEAN of the softmaxed scores over the 3 stages; boxes are
    the final refined boxes. Fixed shape: returns (boxes (K,4), scores (K,),
    classes (K,), valid (K,)) with K = topk; `with_masks` appends the
    selected detections' mask-head probabilities (K, 2s, 2s) — pasted into
    the image on the host (reference d2 mask paste + COCO segm eval,
    `cutler/evaluation/coco_evaluation.py` when TEST.NO_SEGM=False)."""
    probs = jnp.mean(
        jnp.stack(
            [jax.nn.softmax(s["scores"].astype(jnp.float32), -1)
             for s in out["stages"]]
        ),
        axis=0,
    )[:, :num_classes]  # drop background column
    scores = probs.max(axis=-1)
    classes = probs.argmax(axis=-1)
    boxes = out["final_boxes"]

    keep = box_nms(boxes, scores, nms_thresh) & (scores > score_thresh)
    scores = jnp.where(keep, scores, -jnp.inf)
    k = min(topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(top_scores)
    result = (boxes[idx], jnp.where(valid, top_scores, 0.0), classes[idx], valid)
    if with_masks:
        if out.get("mask_logits") is None:
            raise ValueError("with_masks=True requires a mask head (mask_on)")
        result = result + (jax.nn.sigmoid(out["mask_logits"][idx]),)
    return result


def paste_masks(
    masks: np.ndarray,  # (K, m, m) probabilities in the box frame
    boxes: np.ndarray,  # (K, 4) xyxy in output-image coordinates
    out_hw: Tuple[int, int],
    thresh: float = 0.5,
) -> np.ndarray:
    """Host-side d2-style mask paste: resize each box-frame mask to its box
    and threshold into the full image canvas. Returns (K, H, W) bool."""
    import cv2

    h, w = out_hw
    out = np.zeros((masks.shape[0], h, w), bool)
    for i, (m, b) in enumerate(zip(masks, boxes)):
        x0, y0, x1, y1 = b
        x0i, y0i = int(np.floor(x0)), int(np.floor(y0))
        x1i, y1i = int(np.ceil(x1)), int(np.ceil(y1))
        bw, bh = max(x1i - x0i, 1), max(y1i - y0i, 1)
        resized = cv2.resize(m.astype(np.float32), (bw, bh),
                             interpolation=cv2.INTER_LINEAR) >= thresh
        sx0, sy0 = max(0, -x0i), max(0, -y0i)
        dx0, dy0 = max(0, x0i), max(0, y0i)
        dx1, dy1 = min(w, x1i), min(h, y1i)
        if dx1 > dx0 and dy1 > dy0:
            out[i, dy0:dy1, dx0:dx1] = resized[
                sy0:sy0 + (dy1 - dy0), sx0:sx0 + (dx1 - dx0)
            ]
    return out


# ---------------------------------------------------------------- mapper

def map_image_record(
    record: dict,
    cfg: CutlerTrainerConfig,
    rng: Optional[np.random.RandomState] = None,
    is_train: bool = True,
    normalize: bool = True,
) -> Optional[dict]:
    """Host-side: read + resize (shortest edge, capped at image_size) +
    optional hflip + pad to (image_size, image_size); targets padded to
    max_instances. Returns numpy sample dict or None (unreadable image).

    normalize=False keeps the canvas uint8 and skips mean/std — for eval
    callers that fuse normalization into the jitted forward so the
    host->device upload is 1 byte/px instead of 4 (see
    tools/train_net.py run_eval; same pattern as the video evaluator)."""
    from ..data.mapper import load_image_robust
    from ..data.rle import decode as rle_decode, polygons_to_mask

    rng = rng or np.random.RandomState(0)
    try:
        img = load_image_robust(record["file_name"])
    except Exception:
        return None
    h, w = img.shape[:2]
    size = cfg.min_size_train if is_train else cfg.image_size
    scale = min(size / min(h, w), cfg.image_size / max(h, w))
    nh, nw = int(round(h * scale)), int(round(w * scale))
    import cv2

    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    flip = is_train and cfg.flip and rng.rand() < 0.5
    if flip:
        img = img[:, ::-1]

    s = cfg.image_size
    if normalize:
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = img
        canvas = (canvas - np.asarray(cfg.pixel_mean)) / np.asarray(cfg.pixel_std)
    else:
        canvas = np.zeros((s, s, 3), np.uint8)
        canvas[:nh, :nw] = img

    n = cfg.max_instances
    boxes = np.zeros((n, 4), np.float32)
    labels = np.zeros((n,), np.int32)
    valid = np.zeros((n,), bool)
    masks = np.zeros((n, s, s), bool)
    for i, ann in enumerate(record.get("annotations", [])[:n]):
        x0, y0, x1, y1 = [c * scale for c in ann["bbox"]]
        if flip:
            x0, x1 = nw - x1, nw - x0
        boxes[i] = [x0, y0, x1, y1]
        labels[i] = ann["category_id"]
        valid[i] = True
        seg = ann.get("segmentation")
        if seg is not None:
            if isinstance(seg, dict):
                m = rle_decode(seg).astype(np.uint8)
            else:
                m = polygons_to_mask(seg, record["height"], record["width"]).astype(np.uint8)
            m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
            if flip:
                m = m[:, ::-1]
            masks[i, :nh, :nw] = m.astype(bool)
    return {
        "image": canvas,
        "boxes": boxes,
        "labels": labels,
        "valid": valid,
        "masks": masks,
        "image_id": record.get("image_id", 0),
        "scale": scale,
        "orig_hw": (h, w),
    }
