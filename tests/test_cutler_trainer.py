"""CutLER trainer: LR-multiplier-names solver semantics, cascade inference
shape/ordering, COCO loader, and the train_net.py CLI end-to-end on a
synthetic dataset (2 train steps + eval-only)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_base_lr_multiplier_names():
    """Params whose dotted name contains a multiplier name step at
    base_lr * multiplier; everything else at base_lr (reference
    cutler/solver/build.py:123-142)."""
    from s2d_tpu.train.cutler_trainer import (
        CutlerTrainerConfig,
        build_cutler_optimizer,
    )

    cfg = CutlerTrainerConfig(
        base_lr=1.0,
        momentum=0.0,
        weight_decay=0.0,
        warmup_iters=0,
        steps=(10_000,),
        base_lr_multiplier=0.25,
        base_lr_multiplier_names=("roi_heads",),
    )
    params = {
        "backbone": {"w": jnp.ones((3,))},
        "roi_heads": {"box": {"w": jnp.ones((3,))}},
    }
    tx = build_cutler_optimizer(params, cfg)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["w"]), -1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["roi_heads"]["box"]["w"]), -0.25, rtol=1e-6
    )


def test_cascade_detections_ordering():
    from s2d_tpu.train.cutler_trainer import cascade_detections

    # two proposals: the high-scoring one must come first and suppress its
    # duplicate; the far box survives
    boxes = jnp.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]])
    mk = lambda p: jnp.log(jnp.asarray(p))
    stages = [
        {"scores": mk([[0.9, 0.1], [0.6, 0.4], [0.7, 0.3]])}
        for _ in range(3)
    ]
    out = {"stages": stages, "final_boxes": boxes}
    b, s, c, v = cascade_detections(out, 1, 0.01, 0.5, 3)
    v = np.asarray(v)
    assert v[0] and v[1] and not v[2]  # duplicate suppressed
    assert float(s[0]) == pytest.approx(0.9, abs=1e-5)
    np.testing.assert_allclose(np.asarray(b[1]), [30, 30, 40, 40])


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "imgs"
    img_dir.mkdir()
    import cv2

    images, annotations = [], []
    for i in range(3):
        img = np.full((48, 64, 3), 30, np.uint8)
        img[8:30, 10:40] = 220
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "height": 48, "width": 64})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10, 8, 30, 22], "area": 660, "iscrowd": 0,
            "segmentation": [[10, 8, 40, 8, 40, 30, 10, 30]],
        })
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }
    json_path = root / "train.json"
    json_path.write_text(json.dumps(data))
    return str(json_path), str(img_dir)


def test_coco_loader(synthetic_coco):
    from s2d_tpu.data.coco import load_coco_json

    json_path, img_dir = synthetic_coco
    dicts, meta = load_coco_json(json_path, img_dir, class_agnostic=True)
    assert len(dicts) == 3
    assert meta["thing_classes"] == ["fg"]
    ann = dicts[0]["annotations"][0]
    assert ann["bbox"] == [10.0, 8.0, 40.0, 30.0]  # xywh -> xyxy


def test_train_net_cli_e2e(synthetic_coco, tmp_path):
    from s2d_tpu.data.coco import register_coco
    from tools.train_net import main

    json_path, img_dir = synthetic_coco
    register_coco("synthetic_train", json_path, img_dir, class_agnostic=True)
    out = str(tmp_path / "out")
    argv = [
        "--train-dataset", "synthetic_train",
        "--test-dataset", "synthetic_train",
        "--output-dir", out,
        "--max-iter", "2",
        "--image-size", "64",
        "--max-instances", "4",
        "--num-proposals", "16",
        "--base-lr", "0.001",
        "--lr-multiplier", "0.5",
        "--lr-multiplier-names", "mask_head",
    ]
    assert main(argv) == 0
    assert os.path.exists(os.path.join(out, "metrics.json"))
    # eval-only over the same output dir exercises detection + box AND
    # segm AP (reference COCO evaluator scores masks when NO_SEGM=False)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main([
            "--eval-only",
            "--test-dataset", "synthetic_train",
            "--output-dir", out,
            "--image-size", "64",
            "--max-instances", "4",
            "--num-proposals", "16",
        ]) == 0
    printed = buf.getvalue()
    assert "bbox/AP" in printed and "segm/AP" in printed
    # --no-segm skips the mask task (reference TEST.NO_SEGM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main([
            "--eval-only", "--no-segm",
            "--test-dataset", "synthetic_train",
            "--output-dir", out,
            "--image-size", "64",
            "--max-instances", "4",
            "--num-proposals", "16",
        ]) == 0
    printed = buf.getvalue()
    assert "bbox/AP" in printed and "segm/AP" not in printed


def test_train_net_cli_copy_paste(synthetic_coco, tmp_path):
    """--copy-paste applies the image copy-paste augmentation per step
    (reference cutler/engine/train_loop.py run_step)."""
    from s2d_tpu.data.coco import register_coco
    from tools.train_net import main

    json_path, img_dir = synthetic_coco
    register_coco("synthetic_train_cp", json_path, img_dir, class_agnostic=True)
    out = str(tmp_path / "out_cp")
    assert main([
        "--train-dataset", "synthetic_train_cp",
        "--test-dataset", "synthetic_train_cp",
        "--output-dir", out,
        "--max-iter", "2",
        "--image-size", "64",
        "--max-instances", "4",
        "--num-proposals", "16",
        "--copy-paste", "--copy-paste-rate", "1.0",
        "--max-images", "1",
    ]) == 0
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.json"))]
    assert len(lines) == 2 and np.isfinite(lines[-1]["total_loss"])


def test_cutler_yaml_config_mapping():
    """d2-style CutLER yaml (cuts3d surface) maps onto the trainer config;
    _BASE_ inheritance and CLI-override precedence hold."""
    from s2d_tpu.train.cutler_trainer import load_cutler_yaml

    path = os.path.join(
        os.path.dirname(__file__), "..",
        "configs/cuts3d/original_cascade_mask_rcnn_R_50_FPN.yaml",
    )
    fields, rcnn, datasets = load_cutler_yaml(path)
    assert fields["copy_paste"] is True
    assert fields["base_lr"] == 0.01           # child overrides base's 0.02
    assert fields["steps"] == (80000,)
    assert fields["clip_value"] == 1.0         # CLIP_GRADIENTS.ENABLED
    assert fields["clip_type"] == "norm"       # d2 per-param clip_grad_norm_
    assert fields["accum_steps"] == 16         # IMS_PER_BATCH as accumulation
    assert fields["min_size_train"] == 688     # median of the scale list
    # DropLoss OFF (-1 keeps every proposal): the reference cuts3d recipe
    # leaves USE_DROPLOSS at its False default (cutler_config.py:13)
    assert rcnn == {"num_classes": 1, "droploss_iou_thresh": -1.0,
                    "rpn_nms_thresh": 0.65, "pre_nms_topk": 1000,
                    "mask_on": True}
    assert datasets == {"train": "imagenet_train_cls_agnostic",
                        "test": "ytvis_2021_train"}


def _repo_path(*parts):
    return os.path.join(os.path.dirname(__file__), "..", *parts)


def test_cutler_model_zoo_configs_load():
    """Every config under configs/cutler/ (CutLER-ImageNet variants +
    COCO-Semisupervised splits) loads, and its datasets are registered
    names; spot-check the mapped semantics of each family."""
    import glob

    from s2d_tpu.data.coco import COCO_REGISTRY, register_builtin_coco
    from s2d_tpu.train.cutler_trainer import load_cutler_yaml

    register_builtin_coco()
    files = sorted(
        glob.glob(_repo_path("configs", "cutler", "**", "*.yaml"),
                  recursive=True)
    )
    assert len(files) >= 16
    for f in files:
        fields, rcnn, datasets = load_cutler_yaml(f)
        if os.path.basename(f).startswith("Base"):
            continue
        for split in datasets.values():
            if split == "ytvis_2021_train":  # video registry, not COCO
                continue
            assert split in COCO_REGISTRY, (f, split)

    # non-cascade variant: one box stage matched at IoU 0.5, DropLoss on
    _, rcnn, _ = load_cutler_yaml(
        _repo_path("configs", "cutler", "mask_rcnn_R_50_FPN.yaml"))
    assert rcnn["cascade_ious"] == (0.5,)
    assert rcnn["droploss_iou_thresh"] == 0.01

    # semi-supervised finetune: supervised labels -> DropLoss off,
    # 80 classes, fresh predictor layers at 4x LR
    fields, rcnn, datasets = load_cutler_yaml(_repo_path(
        "configs", "cutler", "COCO-Semisupervised",
        "cascade_mask_rcnn_R_50_FPN_1perc.yaml"))
    assert rcnn["droploss_iou_thresh"] == -1.0
    assert rcnn["num_classes"] == 80
    assert fields["base_lr"] == 0.04
    assert fields["base_lr_multiplier"] == 4
    assert any("box_predictor.2" in n
               for n in fields["base_lr_multiplier_names"])
    assert datasets["train"] == "coco_semi_1perc"
    assert datasets["test"] == "coco_2017_val"


def test_reference_cutler_zoo_yamls_load_unchanged():
    """The reference's cutler model_zoo yamls load through our d2-style
    loader directly (same contract as the video configs test)."""
    import glob

    from s2d_tpu.train.cutler_trainer import load_cutler_yaml

    ref = "/root/reference/model_training/cutler/model_zoo/configs"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    files = sorted(
        glob.glob(os.path.join(ref, "**", "*.yaml"), recursive=True))
    assert len(files) >= 15
    for f in files:
        fields, rcnn, datasets = load_cutler_yaml(f)
        if os.path.basename(f).startswith("Base"):
            continue
        assert fields.get("base_lr", 0.02) > 0
    # the reference's standard-head yaml maps to the 1-stage head
    _, rcnn, _ = load_cutler_yaml(
        os.path.join(ref, "CutLER-ImageNet", "mask_rcnn_R_50_FPN.yaml"))
    assert rcnn["cascade_ious"] == (0.5,)


def test_standard_roi_heads_single_stage():
    """cascade_ious=(0.5,) degenerates the cascade into d2
    StandardROIHeads semantics: one box stage, finite losses, working
    inference (reference cutler/modeling/roi_heads/roi_heads.py)."""
    from s2d_tpu.models.cutler import (
        CutlerConfig,
        CutlerRCNN,
        mask_loss,
        roi_losses,
        rpn_losses,
    )
    from s2d_tpu.train.cutler_trainer import cascade_detections

    cfg = CutlerConfig(
        num_proposals=16, pre_nms_topk=64, cascade_ious=(0.5,))
    model = CutlerRCNN(cfg=cfg)
    image = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), image)
    out = model.apply(params, image)
    assert len(out["stages"]) == 1

    gt_boxes = jnp.asarray([[8.0, 8, 40, 40]])
    gt_labels = jnp.asarray([0])
    gt_valid = jnp.asarray([True])
    gt_masks = jnp.zeros((1, 64, 64), bool).at[0, 8:40, 8:40].set(True)
    losses = {}
    losses.update(rpn_losses(out, gt_boxes, gt_valid))
    losses.update(roi_losses(out, gt_boxes, gt_labels, gt_valid, cfg))
    losses.update(mask_loss(out, gt_masks, gt_boxes, gt_valid, cfg))
    assert "loss_cls_stage0" in losses
    assert "loss_cls_stage1" not in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    boxes, scores, classes, valid = cascade_detections(
        out, cfg.num_classes, 0.0, 0.5, 8)
    assert boxes.shape == (8, 4) and scores.shape == (8,)


def test_per_param_norm_clip():
    """CLIP_TYPE 'norm' clips EACH tensor's norm (d2 per_param_clipper),
    not the global norm: a small-gradient tensor must pass through
    unscaled even when a large one is clipped."""
    from s2d_tpu.train.cutler_trainer import clip_by_per_param_norm

    tx = clip_by_per_param_norm(1.0)
    grads = {"small": jnp.asarray([0.3, 0.4]),      # norm 0.5 -> untouched
             "large": jnp.asarray([30.0, 40.0])}    # norm 50 -> scaled to 1
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(np.asarray(out["small"]), [0.3, 0.4], rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["large"])), 1.0, rtol=1e-4)
    # global-norm clipping would have scaled BOTH by ~1/50


def test_ims_per_batch_accumulation():
    """accum_steps (SOLVER.IMS_PER_BATCH) makes one optimizer step per N
    micro-steps: params hold within a batch window and the applied update
    is the micro-gradient average."""
    from s2d_tpu.train.cutler_trainer import (
        CutlerTrainerConfig,
        build_cutler_optimizer,
    )

    cfg = CutlerTrainerConfig(
        base_lr=1.0, momentum=0.0, weight_decay=0.0, warmup_iters=0,
        steps=(10_000,), accum_steps=2, clip_value=0.0,
    )
    params = {"w": jnp.zeros((2,))}
    tx = build_cutler_optimizer(params, cfg)
    state = tx.init(params)
    g1 = {"w": jnp.asarray([1.0, 0.0])}
    g2 = {"w": jnp.asarray([0.0, 1.0])}
    up1, state = tx.update(g1, state, params)
    assert np.allclose(np.asarray(up1["w"]), 0.0)  # mid-batch: hold
    up2, state = tx.update(g2, state, params)
    np.testing.assert_allclose(  # boundary: lr * mean(g1, g2)
        np.asarray(up2["w"]), [-0.5, -0.5], rtol=1e-6)
