"""KD train step: student + EMA teacher, one jit, data-parallel over a mesh.

TPU-native rebuild of the reference's training loop (`/root/reference/
model_training/mask2former_video/engine/train_loop.py:637-830` +
`kd_video_maskformer_model.py:237-326`). One jit-compiled step does what the
reference spreads across CustomAMPTrainer / KDVideoMaskFormer / EMA hooks:

  1. student forward on the clip batch (bf16 compute, fp32 pixel decoder)
  2. teacher forward under stop_gradient
  3. supervised criterion vs sparse keymask targets
  4. distillation targets built ON DEVICE from the teacher's own predictions
     (top-k + score threshold, upsample x4, binarize) — reference
     `prepare_distillation_targets:418-528`
  5. second criterion pass -> kd_loss_* (losses renamed, weights applied)
  6. AdamW (+ global-norm clip 0.01) on the student only
  7. EMA teacher update folded into the same step (no separate no_grad pass)
  8. NaN-loss skip: non-finite total loss zeroes the gradients
     (reference train_loop.py:717-721 skips backward on NaN)

Data parallelism: the step is written over the GLOBAL batch; under jit with
a sharded batch (parallel/mesh.py) XLA partitions it over the data axis and
inserts the gradient psums — the TPU equivalent of DDP allreduce.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..losses.criterion import (
    CriterionConfig,
    set_criterion,
    set_criterion_pair,
)
from ..models.meta_arch import VideoMaskFormer, build_model
from ..ops.resize import interpolate_bilinear
from .optim import build_optimizer
from .schedules import ema_momentum_schedule, loss_weight_factors


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # student
    teacher_params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class LossWeights:
    class_weight: float = 0.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    kd_class_weight: float = 0.0
    kd_mask_weight: float = 5.0
    kd_dice_weight: float = 5.0


def prepare_distillation_targets(
    teacher_out: Dict[str, jnp.ndarray],
    score_threshold: float,
    pad_hw: Tuple[int, int],
    upsample_dtype: jnp.dtype | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher predictions -> fixed-shape distillation targets.

    Returns (masks (B, Q, T, H, W) bool, valid (B, Q) bool). The reference
    takes top `num_predictions_distillation`=Q (all queries) then applies the
    score threshold; with k == Q the top-k is the identity, so validity is
    just the threshold test."""
    logits = teacher_out["pred_logits"]
    masks = teacher_out["pred_masks"]
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1].max(-1)
    valid = scores >= score_threshold
    # upsample_dtype: x4 target upsample precision ((B, Q, T, H, W), the
    # largest train-side intermediate). The reference computes this
    # interpolation under fp16 autocast
    # (kd_video_maskformer_model.py:441-470), so bf16 is the same noise
    # class — f32 (the default) is the rebuild being stricter than the
    # reference. Callers resolve the S2D_DIST_UPSAMPLE_BF16 env OUTSIDE
    # the traced step (make_train_step), so flipping it isn't silently
    # baked into a cached executable. Measured a no-op lever at CLI
    # shapes (tools/bench_step_attrib.py) — kept as the documented knob.
    dtype = jnp.float32 if upsample_dtype is None else upsample_dtype
    up = interpolate_bilinear(masks.astype(dtype), pad_hw)
    return up > 0.0, valid


def distillation_nms(
    masks: jnp.ndarray,  # (B, Q, T, H, W) bool distillation targets
    teacher_out: Dict[str, jnp.ndarray],
    valid: jnp.ndarray,  # (B, Q) bool
    nms_thresh: float,
) -> jnp.ndarray:
    """Greedy same-class mask-IoU NMS over the thresholded teacher targets
    (reference `kd_video_maskformer_model.py:485-519`, ``nms=True``):
    candidates are visited score-descending (the reference feeds its loop
    in top-k order); a candidate is dropped when a still-kept earlier
    candidate of the same class overlaps it with IoU > threshold. Runs
    after the disentangle warp, matching the reference (its NMS sees
    ``gt_masks_per_video`` post-``apply_transformation_frame_by_frame``).

    Fixed-shape version: all Q queries participate; below-threshold
    (invalid) candidates neither suppress nor survive. Returns the new
    (B, Q) validity."""
    from ..ops.nms import greedy_mask_nms, mask_iou_matrix

    probs = jax.nn.softmax(
        teacher_out["pred_logits"].astype(jnp.float32), axis=-1
    )[..., :-1]
    scores = probs.max(-1)
    labels = probs.argmax(-1)

    def per_video(m, s, l, v):
        order = jnp.argsort(-s)
        iou = mask_iou_matrix(m)[order][:, order]
        v_sorted = v[order]
        iou = iou * (v_sorted[:, None] & v_sorted[None, :])
        keep_sorted = greedy_mask_nms(iou, l[order], nms_thresh) & v_sorted
        return jnp.zeros_like(v).at[order].set(keep_sorted)

    return jax.vmap(per_video)(masks, scores, labels, valid)


def weighted_total(
    losses: Dict[str, jnp.ndarray],
    weights: LossWeights,
    kd: bool,
    factor: jnp.ndarray,
) -> jnp.ndarray:
    """Apply the weight_dict (same weight for aux copies) and sum."""
    if kd:
        table = {
            "loss_ce": weights.kd_class_weight,
            "loss_mask": weights.kd_mask_weight,
            "loss_dice": weights.kd_dice_weight,
        }
    else:
        table = {
            "loss_ce": weights.class_weight,
            "loss_mask": weights.mask_weight,
            "loss_dice": weights.dice_weight,
        }
    total = jnp.asarray(0.0, jnp.float32)
    for key, value in losses.items():
        base = key.rsplit("_", 1)[0] if key.split("_")[-1].isdigit() else key
        total = total + table[base] * value.astype(jnp.float32) * factor
    return total


def make_train_step(
    model: VideoMaskFormer,
    cfg: Config,
    tx: optax.GradientTransformation,
    teacher_model: VideoMaskFormer | None = None,
):
    """`teacher_model` optionally swaps the module used for the no-grad
    teacher forward (same param tree), decoupling teacher/student MSDA
    implementation choices. The pallas MSDA kernel is differentiable
    (transposed-kernel custom VJP in ops/ms_deform_attn_pallas.py), so the
    train CLI can run BOTH on it under AMP; the XLA row-gather path remains
    the fp32/CPU parity reference."""
    if teacher_model is None:
        teacher_model = model
    mf = cfg.model.mask_former
    # prepare_distillation_targets keeps ALL queries above the score
    # threshold, which equals the reference's top-k + threshold
    # (kd_video_maskformer_model.py:441-449) only when k == Q — reject
    # configs that silently wouldn't match. DISTILLATION_NMS (reference
    # :485-519) is applied after the warp via distillation_nms().
    if cfg.model.meta_architecture == "KDVideoMaskFormer":
        if mf.num_predictions_distillation < mf.num_object_queries:
            raise NotImplementedError(
                "NUM_PREDICTIONS_DISTILLATION < NUM_OBJECT_QUERIES: the "
                "k >= Q identity prepare_distillation_targets relies on "
                f"does not hold ({mf.num_predictions_distillation} < "
                f"{mf.num_object_queries})"
            )
    crit_cfg = CriterionConfig(
        num_classes=cfg.model.sem_seg_head.num_classes,
        eos_coef=mf.no_object_weight,
        cost_class=mf.class_weight,
        cost_mask=mf.mask_weight,
        cost_dice=mf.dice_weight,
        num_points=mf.train_num_points,
        matcher_num_points=mf.matcher_num_points,
        oversample_ratio=mf.oversample_ratio,
        importance_sample_ratio=mf.importance_sample_ratio,
        masks_only=mf.loss_strategy == "masks-only",
        # under AMP the criterion's point-gather backward uses the fast
        # (bf16-class) matmul path and the loss-side pool_src gather
        # fetches bf16 — the same noise class as the reference's
        # fp16-autocast criterion; exact f32 otherwise
        bwd_einsum_precision=jax.lax.Precision.DEFAULT
        if cfg.solver.amp.enabled
        else jax.lax.Precision.HIGHEST,
        gather_dtype=jnp.bfloat16
        if cfg.solver.amp.enabled
        else jnp.float32,
        point_sampling=mf.point_sampling,
    )
    kd_crit_cfg = dataclasses.replace(
        crit_cfg, masks_only=mf.distillation_loss_strategy == "masks-only"
    )
    weights = LossWeights(
        class_weight=mf.class_weight,
        mask_weight=mf.mask_weight,
        dice_weight=mf.dice_weight,
        kd_class_weight=mf.kd_class_weight,
        kd_mask_weight=mf.kd_mask_weight,
        kd_dice_weight=mf.kd_dice_weight,
    )
    factors_fn = loss_weight_factors(cfg, cfg.solver.max_iter)
    ema_fn = ema_momentum_schedule(cfg)
    kd_enabled = cfg.model.meta_architecture == "KDVideoMaskFormer"
    accum_iter = max(cfg.solver.accum_iter, 1)
    # resolved HERE (closure construction), not inside the traced step
    import os as _os

    dist_upsample_dtype = (
        jnp.bfloat16
        if _os.environ.get("S2D_DIST_UPSAMPLE_BF16", "0") == "1"
        else jnp.float32
    )

    def train_step(
        state: TrainState,
        images: jnp.ndarray,  # (B, T, H, W, 3) normalized + padded
        tgt_masks: jnp.ndarray,  # (B, N, T, H, W) bool
        tgt_valid: jnp.ndarray,  # (B, N) bool
        rng: jax.Array,
        distill_images: jnp.ndarray | None = None,  # (B, T, H, W, 3)
        distill_affine: jnp.ndarray | None = None,  # (B, T, 3, 3)
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        pad_hw = images.shape[2:4]
        if tgt_masks.dtype == jnp.uint8:
            # loader ships targets bit-packed along W (collate_clips
            # pack_masks — 8x smaller host->device upload); unpack on
            # device. The padded canvas W comes from the images. Guard
            # against a caller passing full-width 0/1 uint8 masks — those
            # must be fed as bool, not sniffed as packed.
            if tgt_masks.shape[-1] * 8 != pad_hw[1]:
                raise ValueError(
                    f"uint8 tgt_masks are interpreted as bit-packed along W "
                    f"but last dim {tgt_masks.shape[-1]} * 8 != padded W "
                    f"{pad_hw[1]}; pass bool masks for an unpacked feed"
                )
            tgt_masks = jnp.unpackbits(
                tgt_masks, axis=-1, count=pad_hw[1]
            ).astype(bool)
        sup_factor, kd_factor = factors_fn(state.step)
        rng_step = jax.random.fold_in(rng, state.step)
        k_drop, k_sup, k_kd = jax.random.split(rng_step, 3)
        disentangled = distill_images is not None

        if kd_enabled:
            teacher_out = teacher_model.apply(state.teacher_params, images)
            teacher_out = jax.lax.stop_gradient(teacher_out)
            kd_masks, kd_valid = prepare_distillation_targets(
                teacher_out, mf.score_threshold_distillation, pad_hw,
                upsample_dtype=dist_upsample_dtype,
            )
            if disentangled:
                # replay the distill view's transform on teacher targets
                from ..ops.warp import warp_masks_affine

                kd_masks = warp_masks_affine(kd_masks, distill_affine)
            if mf.distillation_nms:
                # MODEL.MASK_FORMER.DISTILLATION_NMS: greedy mask-IoU NMS
                # on the (possibly warped) targets at TEST.NMS_THRESH —
                # reference from_config:155 + :224-225
                kd_valid = distillation_nms(
                    kd_masks, teacher_out, kd_valid,
                    cfg.model.mask_former.test.nms_thresh,
                )

        def loss_fn(params):
            out = model.apply(
                params, images, deterministic=False, rngs={"dropout": k_drop}
            )
            if kd_enabled:
                if disentangled:
                    kd_out = model.apply(
                        params, distill_images,
                        deterministic=False, rngs={"dropout": k_drop},
                    )
                else:
                    kd_out = out
                # one batched auction solve for both criteria (the solver's
                # serial bidding rounds cost max across problems, not sum)
                sup_losses, kd_losses = set_criterion_pair(
                    k_sup, out, tgt_masks, tgt_valid, crit_cfg,
                    k_kd, kd_out, kd_masks, kd_valid, kd_crit_cfg,
                    compute_labels_loss=True,
                )
            else:
                sup_losses = set_criterion(
                    k_sup, out, tgt_masks, tgt_valid, crit_cfg,
                    compute_labels_loss=True,
                )
            total = weighted_total(sup_losses, weights, kd=False, factor=sup_factor)
            metrics = {k: v for k, v in sup_losses.items() if "_" not in k[5:]}
            if kd_enabled:
                total = total + weighted_total(
                    kd_losses, weights, kd=True, factor=kd_factor
                )
                metrics.update(
                    {f"kd_{k}": v for k, v in kd_losses.items() if "_" not in k[5:]}
                )
            metrics["total_loss"] = total
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # NaN-loss skip (reference train_loop.py AMP skip): a zeroed
        # gradient alone is NOT a skip — Adam moments and weight decay
        # would still move params — so hold params/opt_state wholesale on
        # a non-finite step. Under accumulation the zero gradient still
        # advances MultiSteps' micro counter (the bad micro-batch simply
        # contributes nothing to the average).
        finite = jnp.isfinite(total)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            params, state.params,
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            opt_state, state.opt_state,
        )

        if kd_enabled:
            # EMA only on optimizer-step boundaries (reference
            # train_loop.py:760-763 gates on (iter+1) % accum == 0);
            # blending every micro-step would decay the teacher-student
            # gap m^k per real update instead of m. state.step counts
            # micro-steps in lockstep with MultiSteps' internal counter.
            m = ema_fn(state.step)
            boundary = ((state.step + 1) % accum_iter == 0) & finite
            teacher_params = jax.tree_util.tree_map(
                lambda t, s: jnp.where(
                    boundary, m * t + (1.0 - m) * s.astype(t.dtype), t
                ),
                state.teacher_params,
                params,
            )
        else:
            teacher_params = state.teacher_params

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            teacher_params=teacher_params,
            opt_state=opt_state,
        )
        metrics["grad_finite"] = finite.astype(jnp.float32)
        return new_state, metrics

    return train_step


def create_train_state(
    cfg: Config, rng: jax.Array, sample_images: jnp.ndarray, params=None
) -> Tuple[VideoMaskFormer, TrainState, optax.GradientTransformation]:
    """Build model, init/convert params, optimizer, and the initial state."""
    model = build_model(cfg)
    if params is None:
        params = model.init(rng, sample_images)
    # optimizer state spans the full variables dict (labels see the
    # leading "params" level; the rules only look at relative names)
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=opt_state,
    )
    return model, state, tx
