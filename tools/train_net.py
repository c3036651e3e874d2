#!/usr/bin/env python
"""CutLER image-detector trainer/evaluator — CLI surface of the reference's
`cutler/train_net.py` (`/root/reference/model_training/cutler/train_net.py`
+ extended arg parser `cutler/engine/defaults.py:113-184`):

  python tools/train_net.py --train-dataset NAME --test-dataset NAME
      [--eval-only] [--resume] [--no-segm] [--max-iter N] [opts KEY VALUE]

Differences by design: single-process JAX (no detectron2 launch), SGD step
jit-compiled, orbax checkpoints, box-AP eval via the generic accumulator
(`s2d_tpu/evaluation/ytvos_eval.evaluate_detections_boxes`).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="s2d_tpu CutLER trainer")
    p.add_argument("--config-file", default="", metavar="FILE",
                   help="d2-style CutLER yaml (reference model_zoo/cuts3d "
                        "surface); explicit CLI flags override it")
    p.add_argument("--train-dataset", default=None)
    p.add_argument("--test-dataset", default=None)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-segm", action="store_true",
                   help="skip mask head training/eval (reference TEST.NO_SEGM)")
    p.add_argument("--tta", action="store_true",
                   help="multi-scale + hflip TTA eval pass (reference "
                        "TEST.AUG.ENABLED -> GeneralizedRCNNWithTTA)")
    p.add_argument("--tta-min-sizes", nargs="*", type=int, default=None,
                   help="override TEST.AUG.MIN_SIZES")
    p.add_argument("--copy-paste", action="store_true",
                   help="image copy-paste augmentation (DATALOADER.COPY_PASTE)")
    p.add_argument("--copy-paste-rate", type=float, default=None)
    p.add_argument("--output-dir", default="./output_cutler")
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--max-images", type=int, default=None, help="cap eval images")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--max-instances", type=int, default=None)
    p.add_argument("--num-proposals", type=int, default=None)
    p.add_argument("--base-lr", type=float, default=None)
    p.add_argument("--lr-multiplier", type=float, default=None,
                   help="SOLVER.BASE_LR_MULTIPLIER")
    p.add_argument("--lr-multiplier-names", nargs="*", default=None,
                   help="SOLVER.BASE_LR_MULTIPLIER_NAMES (substring match)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()  # S2D_PLATFORM=cpu forces XLA:CPU for local drives
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.checkpoint import (
        CheckpointWriter,
        latest_step,
        restore_checkpoint,
    )
    from s2d_tpu.data.coco import get_coco_dataset
    from s2d_tpu.evaluation.ytvos_eval import evaluate_detections_boxes
    from s2d_tpu.models.cutler import CutlerConfig, CutlerRCNN
    from s2d_tpu.train.cutler_trainer import (
        CutlerTrainerConfig,
        build_cutler_optimizer,
        cascade_detections,
        make_cutler_train_step,
        map_image_record,
    )
    from s2d_tpu.utils.events import MetricLogger

    yaml_fields, yaml_rcnn, yaml_datasets = {}, {}, {}
    if args.config_file:
        from s2d_tpu.train.cutler_trainer import load_cutler_yaml

        yaml_fields, yaml_rcnn, yaml_datasets = load_cutler_yaml(args.config_file)
    train_dataset = args.train_dataset or yaml_datasets.get(
        "train", "imagenet_train_cls_agnostic")
    test_dataset = args.test_dataset or yaml_datasets.get(
        "test", "cls_agnostic_coco")

    rcnn_over = dict(yaml_rcnn)
    if args.num_proposals:
        rcnn_over["num_proposals"] = args.num_proposals
    over = dict(yaml_fields)
    over["rcnn"] = CutlerConfig(**rcnn_over)
    if args.no_segm:
        over["no_segm"] = True
    if args.tta:
        over["test_aug_enabled"] = True
    if args.tta_min_sizes:
        over["test_aug_min_sizes"] = tuple(args.tta_min_sizes)
    if args.copy_paste:
        over["copy_paste"] = True
    if args.copy_paste_rate is not None:
        over["copy_paste_rate"] = args.copy_paste_rate
    if args.max_iter is not None:
        over["max_iter"] = args.max_iter
    if args.image_size is not None:
        over["image_size"] = args.image_size
        over["min_size_train"] = args.image_size
    if args.max_instances is not None:
        over["max_instances"] = args.max_instances
    if args.base_lr is not None:
        over["base_lr"] = args.base_lr
    if args.lr_multiplier is not None:
        over["base_lr_multiplier"] = args.lr_multiplier
    if args.lr_multiplier_names is not None:
        over["base_lr_multiplier_names"] = tuple(args.lr_multiplier_names)
    cfg = CutlerTrainerConfig(**over)
    os.makedirs(args.output_dir, exist_ok=True)

    model = CutlerRCNN(cfg=cfg.rcnn)
    sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")

    if not args.eval_only:
        dicts, _ = get_coco_dataset(train_dataset)
        tx = build_cutler_optimizer(params, cfg)
        opt_state = tx.init(params)
        start = 0
        if args.resume:
            step = latest_step(ckpt_dir)
            if step is not None:
                params, opt_state = restore_checkpoint(
                    ckpt_dir, (params, opt_state), step
                )
                start = step
                print(f"Resumed from checkpoint step {step}")
        step_fn = jax.jit(make_cutler_train_step(model, cfg, tx))
        logger = MetricLogger(args.output_dir)
        ckpt_writer = CheckpointWriter(ckpt_dir)  # async background writes
        rng = np.random.RandomState(0)
        it = start
        prev_sample = None  # copy-paste source: the previous mapped image
        pending = None  # (iteration, device metrics) awaiting readback
        # SOLVER.IMS_PER_BATCH as accumulation: `it` counts single-image
        # MICRO-steps; one optimizer step (= one reference iteration)
        # every `accum` micro-steps, so MAX_ITER keeps its batch-N meaning
        accum = max(cfg.accum_steps, 1)
        total_micro = cfg.max_iter * accum
        while it < total_micro:
            record = dicts[rng.randint(len(dicts))]
            s = map_image_record(record, cfg, rng, is_train=True)
            if s is None:
                continue
            if cfg.copy_paste:
                # reference pairs each batch member with the reversed batch
                # (cutler/engine/train_loop.py run_step), sources deepcopied
                # pre-paste; this single-image loop pairs with the PREVIOUS
                # unmodified image — same "another random training image"
                # source distribution
                from s2d_tpu.data.copy_paste import copy_paste_image

                src, prev_sample = prev_sample, s
                if src is not None:
                    s = copy_paste_image(
                        rng, s, src, rate=cfg.copy_paste_rate,
                        min_ratio=cfg.copy_paste_min_ratio,
                        max_ratio=cfg.copy_paste_max_ratio,
                        random_num=cfg.copy_paste_random_num,
                    )
            params, opt_state, metrics = step_fn(
                params, opt_state,
                jnp.asarray(s["image"])[None],
                jnp.asarray(s["boxes"]), jnp.asarray(s["labels"]),
                jnp.asarray(s["valid"]), jnp.asarray(s["masks"]),
            )
            # read metrics one step late so host-side mapping/copy-paste of
            # the next image overlaps the device step instead of waiting
            # behind the blocking float()s; log one line per ITERATION
            # (optimizer-step boundary), as the reference does
            boundary = (it + 1) % accum == 0
            opt_it = (it + 1) // accum
            if boundary:
                if pending is not None:
                    p_it, p_metrics = pending
                    logger.log(p_it, {k: float(v) for k, v in p_metrics.items()})
                pending = (opt_it - 1, metrics)
            it += 1
            if boundary and (opt_it % 5000 == 0 or opt_it == cfg.max_iter):
                # flush so a crash after the save never leaves a resumable
                # checkpoint ahead of metrics.json
                p_it, p_metrics = pending
                logger.log(p_it, {k: float(v) for k, v in p_metrics.items()})
                pending = None
                ckpt_writer.save(it, (params, opt_state))
        if pending is not None:
            p_it, p_metrics = pending
            logger.log(p_it, {k: float(v) for k, v in p_metrics.items()})
        ckpt_writer.close()
    else:
        step = latest_step(ckpt_dir)
        if step is not None:
            tx = build_cutler_optimizer(params, cfg)
            params, _ = restore_checkpoint(ckpt_dir, (params, tx.init(params)), step)
            print(f"Loaded checkpoint step {step}")

    # ---- evaluation: box AP + (unless --no-segm) mask AP — the reference
    # COCO evaluator scores both tasks when TEST.NO_SEGM=False
    # (cutler/evaluation/coco_evaluation.py) ----
    from s2d_tpu.data import rle as rle_codec
    from s2d_tpu.data.rle import polygons_to_mask
    from s2d_tpu.evaluation.ytvos_eval import evaluate_detections_masks
    from s2d_tpu.train.cutler_trainer import paste_masks

    do_segm = cfg.rcnn.mask_on and not cfg.no_segm
    dicts, meta = get_coco_dataset(test_dataset)
    if args.max_images:
        dicts = dicts[: args.max_images]
    num_classes = max(len(meta["thing_classes"]), 1)

    @jax.jit
    def infer(params, image_u8):
        # normalize traced here: the upload is 1 uint8 byte/px (the mapper
        # runs with normalize=False) and the whole per-image path is one
        # upload + one dispatch — same fusion as the video evaluator
        image = (
            image_u8.astype(jnp.float32) - jnp.asarray(cfg.pixel_mean)
        ) / jnp.asarray(cfg.pixel_std)
        out = model.apply(params, image)
        return cascade_detections(
            out, cfg.rcnn.num_classes, cfg.score_thresh,
            cfg.nms_thresh, cfg.detections_per_image, with_masks=do_segm,
        )

    gts, preds = [], []
    gt_masks, pred_masks = [], []

    # same overlap pattern as the video evaluator: image decode/resize on
    # a prefetch thread, device->host readback + mask paste + RLE on a
    # finalize thread, while the main thread keeps the device fed
    from s2d_tpu.data.loader import FinalizeThread, _prefetch

    def finalize(record, s, det):
        boxes, scores, classes, valid = (np.asarray(x) for x in det[:4])
        boxes = boxes / s["scale"]
        masks_k = None
        if do_segm:
            masks_k = paste_masks(np.asarray(det[4]), boxes, s["orig_hw"])
        for di, (b, sc, cl, v) in enumerate(zip(boxes, scores, classes, valid)):
            if not v:
                continue
            entry = {
                "image_id": record["image_id"],
                "category_id": int(cl),
                "bbox": [float(x) for x in b],
                "score": float(sc),
            }
            preds.append(entry)
            if do_segm:
                pred_masks.append({
                    **{k: entry[k] for k in ("image_id", "category_id", "score")},
                    "segmentation": rle_codec.encode(masks_k[di]),
                })

    fin = FinalizeThread(finalize, depth=2)

    mapped = _prefetch(
        ((r, map_image_record(r, cfg, is_train=False, normalize=False))
         for r in dicts),
        depth=2,
    )
    for record, s in mapped:
        if s is None:
            continue
        det = infer(params, s["image"][None])
        fin.put(record, s, det)
        for ann in record.get("annotations", []):
            gts.append({
                "image_id": record["image_id"],
                "category_id": ann["category_id"],
                "bbox": ann["bbox"],
                "iscrowd": ann.get("iscrowd", 0),
            })
            if do_segm and ann.get("segmentation") is not None:
                seg = ann["segmentation"]
                if not isinstance(seg, dict):
                    seg = rle_codec.encode(polygons_to_mask(
                        seg, record["height"], record["width"]).astype(bool))
                gt_masks.append({
                    "image_id": record["image_id"],
                    "category_id": ann["category_id"],
                    "segmentation": seg,
                    "iscrowd": ann.get("iscrowd", 0),
                })
    fin.close()
    metrics = {
        f"bbox/{k}": v
        for k, v in evaluate_detections_boxes(
            gts, preds, use_cats=num_classes > 1
        ).items()
    }
    if do_segm:
        metrics.update({
            f"segm/{k}": v
            for k, v in evaluate_detections_masks(
                gt_masks, pred_masks, use_cats=num_classes > 1
            ).items()
        })
    print(f"[{test_dataset}] " + "  ".join(
        f"{k}: {v:.4f}" for k, v in metrics.items()
    ))

    if cfg.test_aug_enabled:
        # end-of-eval TTA pass (reference cutler/train_net.py:100-113:
        # GeneralizedRCNNWithTTA when TEST.AUG.ENABLED; results suffixed
        # _TTA). Reuses the ground truth collected above.
        from s2d_tpu.data.mapper import load_image_robust
        from s2d_tpu.evaluation.tta_rcnn import tta_inference

        @jax.jit
        def infer_boxes(params, image):
            out = model.apply(params, image)
            return cascade_detections(
                out, cfg.rcnn.num_classes, cfg.score_thresh,
                cfg.nms_thresh, cfg.detections_per_image, with_masks=False,
            )

        infer_masks = None
        if do_segm:
            @jax.jit
            def infer_masks(params, image, boxes):
                out = model.apply(params, image, mask_boxes=boxes)
                return jax.nn.sigmoid(out["mask_logits"])

        tta_preds, tta_pred_masks = [], []
        for record in dicts:
            try:
                img = load_image_robust(record["file_name"]).astype(np.float32)
            except Exception:
                continue
            res = tta_inference(
                params, img,
                infer_boxes=infer_boxes, infer_masks=infer_masks,
                min_sizes=cfg.test_aug_min_sizes,
                max_size=cfg.test_aug_max_size,
                flip=cfg.test_aug_flip,
                pixel_mean=cfg.pixel_mean, pixel_std=cfg.pixel_std,
                nms_thresh=cfg.nms_thresh, topk=cfg.detections_per_image,
            )
            boxes, scores, classes, valid = (np.asarray(x) for x in res[:4])
            masks_k = None
            if do_segm:
                masks_k = paste_masks(
                    np.asarray(res[4]), boxes,
                    (record["height"], record["width"]),
                )
            for di, (b, sc, cl, v) in enumerate(
                zip(boxes, scores, classes, valid)
            ):
                if not v:
                    continue
                entry = {
                    "image_id": record["image_id"],
                    "category_id": int(cl),
                    "bbox": [float(x) for x in b],
                    "score": float(sc),
                }
                tta_preds.append(entry)
                if do_segm:
                    tta_pred_masks.append({
                        **{k: entry[k]
                           for k in ("image_id", "category_id", "score")},
                        "segmentation": rle_codec.encode(masks_k[di]),
                    })
        tta_metrics = {
            f"bbox_TTA/{k}": v
            for k, v in evaluate_detections_boxes(
                gts, tta_preds, use_cats=num_classes > 1
            ).items()
        }
        if do_segm:
            tta_metrics.update({
                f"segm_TTA/{k}": v
                for k, v in evaluate_detections_masks(
                    gt_masks, tta_pred_masks, use_cats=num_classes > 1
                ).items()
            })
        print(f"[{test_dataset}] " + "  ".join(
            f"{k}: {v:.4f}" for k, v in tta_metrics.items()
        ))
        metrics.update(tta_metrics)
    return 0


if __name__ == "__main__":
    sys.exit(main())
