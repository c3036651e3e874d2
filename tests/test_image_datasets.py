"""Image-dataset plumbing: COCO pseudo-clip mapper and semantic (ADE-style)
loader/mapper."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def mapper_cfg():
    from s2d_tpu.config import load_config
    from s2d_tpu.data.mapper import MapperConfig

    cfg = load_config(None, [
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "INPUT.MIN_SIZE_TRAIN", "(32,)",
        "INPUT.RANDOM_FLIP", "none",
    ])
    return MapperConfig.from_config(cfg, is_train=True)


def test_coco_clip_mapper(tmp_path, mapper_cfg):
    import cv2

    from s2d_tpu.data.image_datasets import CocoClipMapper, coco_to_clip_record

    img = np.zeros((32, 48, 3), np.uint8)
    img[4:20, 8:30] = 200
    path = str(tmp_path / "im.jpg")
    cv2.imwrite(path, img)
    record = {
        "file_name": path, "image_id": 7, "height": 32, "width": 48,
        "annotations": [{
            "bbox": [8.0, 4.0, 30.0, 20.0], "category_id": 0,
            "segmentation": [[8, 4, 30, 4, 30, 20, 8, 20]], "iscrowd": 0,
        }],
    }
    clip = coco_to_clip_record(record, 3)
    assert clip["length"] == 3
    assert len(clip["annotations"][0]["segmentations"]) == 3

    sample = CocoClipMapper(mapper_cfg, is_train=True, seed=0)(record)
    assert sample["image"].shape[0] == 2  # sampling_frame_num frames
    # the replicated mask is identical across pseudo-frames
    m = sample["masks"][0]
    np.testing.assert_array_equal(m[0], m[1])
    assert m[0].any()


def test_sem_seg_loader_and_mapper(tmp_path, mapper_cfg):
    import cv2

    from s2d_tpu.data.image_datasets import SemSegClipMapper, load_sem_seg

    img_root = tmp_path / "imgs"; img_root.mkdir()
    gt_root = tmp_path / "gts"; gt_root.mkdir()
    img = np.full((32, 48, 3), 128, np.uint8)
    cv2.imwrite(str(img_root / "a.jpg"), img)
    label = np.full((32, 48), 255, np.uint8)  # ignore everywhere...
    label[:16] = 3   # class 3 top half
    label[16:] = 10  # class 10 bottom half
    cv2.imwrite(str(gt_root / "a.png"), label)

    dicts = load_sem_seg(str(img_root), str(gt_root))
    assert len(dicts) == 1
    assert dicts[0]["file_name"].endswith("a.jpg")

    sample = SemSegClipMapper(mapper_cfg, is_train=True, seed=0)(dicts[0])
    labels = sample["labels"][sample["valid"]]
    assert sorted(labels.tolist()) == [3, 10]
    # per-class masks partition the image (no ignore pixels here)
    masks = sample["masks"][sample["valid"]]
    total = masks.sum(axis=0)
    np.testing.assert_array_equal(total, np.ones_like(total))


def test_panoptic_loader_and_mapper(tmp_path, mapper_cfg):
    """Panoptic PNG (rgb2id) + segments_info -> per-segment labeled masks
    (reference MaskFormerPanopticDatasetMapper)."""
    import cv2

    from s2d_tpu.data.image_datasets import (
        PanopticClipMapper,
        get_panoptic_dataset,
        register_panoptic,
        rgb2id,
    )

    img_root = tmp_path / "imgs"; img_root.mkdir()
    pan_root = tmp_path / "pan"; pan_root.mkdir()
    cv2.imwrite(str(img_root / "a.jpg"), np.full((32, 48, 3), 128, np.uint8))

    # two segments: id 5 (top half) and id 300 (=44+1*256, bottom half)
    pan_rgb = np.zeros((32, 48, 3), np.uint8)
    pan_rgb[:16] = (5, 0, 0)
    pan_rgb[16:] = (44, 1, 0)
    assert rgb2id(pan_rgb[0, 0][None, None])[0, 0] == 5
    assert rgb2id(pan_rgb[-1, -1][None, None])[0, 0] == 300
    cv2.imwrite(str(pan_root / "a.png"), cv2.cvtColor(pan_rgb, cv2.COLOR_RGB2BGR))

    pj = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 32, "width": 48}],
        "annotations": [{
            "image_id": 1, "file_name": "a.png",
            "segments_info": [
                {"id": 5, "category_id": 7, "iscrowd": 0},
                {"id": 300, "category_id": 2, "iscrowd": 0},
                {"id": 999, "category_id": 1, "iscrowd": 1},  # crowd: dropped
            ],
        }],
    }
    (tmp_path / "pan.json").write_text(json.dumps(pj))
    register_panoptic("tiny_panoptic", str(img_root), str(pan_root),
                      str(tmp_path / "pan.json"))
    dicts, meta = get_panoptic_dataset("tiny_panoptic")
    assert len(dicts) == 1 and meta["evaluator_type"] == "panoptic"

    sample = PanopticClipMapper(mapper_cfg, is_train=True, seed=0)(dicts[0])
    labels = sorted(sample["labels"][sample["valid"]].tolist())
    assert labels == [2, 7]
    masks = sample["masks"][sample["valid"]]
    total = masks.sum(axis=0)
    np.testing.assert_array_equal(total, np.ones_like(total))


def test_builtin_coco_tables_cover_reference_zero_shot_sets():
    """The remaining reference zero-shot eval registrations exist
    (cutler/data/datasets/builtin.py:41-97)."""
    from s2d_tpu.data.coco import _PREDEFINED_COCO

    for name in ("cls_agnostic_coco20k", "cls_agnostic_lvis",
                 "cls_agnostic_objects365", "cls_agnostic_openimages",
                 "cls_agnostic_kitti", "cls_agnostic_clipart",
                 "cls_agnostic_watercolor", "cls_agnostic_comic"):
        assert name in _PREDEFINED_COCO
