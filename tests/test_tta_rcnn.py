"""CutLER TTA (reference cutler/train_net.py:100-113 GeneralizedRCNNWithTTA):
box coordinate round-trips, pooled-NMS merge semantics, mask flip-back
averaging, and the train_net.py --tta CLI surface end-to-end."""
import contextlib
import io
import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from s2d_tpu.evaluation.tta_rcnn import (
    boxes_to_aug,
    boxes_to_original,
    merge_detections,
    tta_inference,
    tta_variants,
)


def test_boxes_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.sort(rng.rand(8, 4).astype(np.float32) * 100, axis=-1)[
        :, [0, 1, 2, 3]
    ]
    boxes = np.stack(
        [boxes[:, 0], boxes[:, 1], boxes[:, 0] + 10, boxes[:, 1] + 20], axis=1
    )
    for meta in ({"scale": 0.5, "flipped": False, "nw": 64},
                 {"scale": 1.25, "flipped": True, "nw": 80}):
        aug = boxes_to_aug(boxes, meta)
        back = boxes_to_original(aug, meta)
        np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-4)
        # flipped boxes stay well-formed (x0 < x1)
        assert np.all(aug[:, 2] >= aug[:, 0])


def test_merge_detections_semantics():
    """Duplicates across augs collapse to the best-scoring copy; a
    detection found by only ONE aug survives; different classes never
    suppress each other (per-class NMS, d2 _merge_detections)."""
    boxes = jnp.asarray([
        [10, 10, 30, 30],     # aug A, score 0.8
        [10.5, 10, 30, 30.5],  # aug B, same object, score 0.9 -> winner
        [60, 60, 80, 80],     # only aug B found it
        [10, 10, 30, 30],     # same box, DIFFERENT class -> kept
        [0, 0, 1, 1],         # invalid slot
    ], jnp.float32)
    scores = jnp.asarray([0.8, 0.9, 0.5, 0.7, 0.99])
    classes = jnp.asarray([0, 0, 0, 1, 0])
    valid = jnp.asarray([True, True, True, True, False])
    b, s, c, v = merge_detections(
        boxes, scores, classes, valid, nms_thresh=0.5, topk=4
    )
    kept = [(round(float(s[i]), 4), int(c[i])) for i in range(4) if bool(v[i])]
    assert (0.9, 0) in kept          # best duplicate
    assert (0.8, 0) not in kept      # suppressed duplicate
    assert (0.5, 0) in kept          # singleton survives
    assert (0.7, 1) in kept          # other class untouched
    assert (0.99, 0) not in kept     # invalid never surfaces


def _bright_box(canvas):
    """(x0, y0, x1, y1) of the bright region in a normalized canvas."""
    on = canvas[..., 0] > 100.0
    ys, xs = np.where(on)
    return float(xs.min()), float(ys.min()), float(xs.max() + 1), float(ys.max() + 1)


def test_tta_inference_merges_and_flips_masks_back():
    """A perfect synthetic detector run through the full TTA sweep: the
    merged box lands on the ground truth in original coordinates, and the
    box-frame masks from FLIPPED augmentations are flipped back before
    averaging (a left-sided object stays left-sided, probability ~1)."""
    h, w = 40, 64
    gt = (16.0, 8.0, 48.0, 32.0)  # xyxy
    img = np.zeros((h, w, 3), np.float32)
    # asymmetric brightness: left half of the object is brighter — the
    # flip-back test hinges on this asymmetry
    img[8:32, 16:32] = 230.0
    img[8:32, 32:48] = 180.0

    k = 4  # fixed detection slots

    def infer_boxes(params, image):
        canvas = np.asarray(image[0])
        x0, y0, x1, y1 = _bright_box(canvas)
        boxes = np.zeros((k, 4), np.float32)
        boxes[0] = [x0, y0, x1, y1]
        scores = np.zeros((k,), np.float32)
        scores[0] = 0.9
        classes = np.zeros((k,), np.int32)
        valid = np.zeros((k,), bool)
        valid[0] = True
        return boxes, scores, classes, valid

    def infer_masks(params, image, boxes):
        canvas = np.asarray(image[0])
        boxes = np.asarray(boxes)
        m = np.zeros((boxes.shape[0], 28, 28), np.float32)
        for i, (x0, y0, x1, y1) in enumerate(boxes):
            xs = np.clip(
                (x0 + (np.arange(28) + 0.5) / 28 * (x1 - x0)).astype(int),
                0, canvas.shape[1] - 1,
            )
            ys = np.clip(
                (y0 + (np.arange(28) + 0.5) / 28 * (y1 - y0)).astype(int),
                0, canvas.shape[0] - 1,
            )
            m[i] = (canvas[np.ix_(ys, xs)][..., 0] > 200.0).astype(np.float32)
        return m

    res = tta_inference(
        None, img,
        infer_boxes=infer_boxes, infer_masks=infer_masks,
        min_sizes=(20, 40), max_size=200, flip=True,
        pixel_mean=(0, 0, 0), pixel_std=(1, 1, 1),
        nms_thresh=0.5, topk=k,
    )
    boxes, scores, classes, valid, probs = res
    boxes, valid, probs = np.asarray(boxes), np.asarray(valid), np.asarray(probs)
    assert valid[0] and not valid[1:].any()  # 4 augs merged into ONE object
    np.testing.assert_allclose(boxes[0], gt, atol=2.5)  # rasterization slop
    # flip-back: every aug agrees the LEFT half is the bright part, so the
    # average is ~1 left / ~0 right. Without flip-back it would be ~0.5.
    left = probs[0][:, 3:11].mean()
    right = probs[0][:, 17:25].mean()
    assert left > 0.9, left
    assert right < 0.1, right


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_tta")
    img_dir = root / "imgs"
    img_dir.mkdir()
    import cv2

    images, annotations = [], []
    for i in range(2):
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


def test_train_net_cli_tta_e2e(synthetic_coco, tmp_path):
    """--eval-only --tta runs the TTA sweep end-to-end (2 scales x flip on
    one shared canvas) and reports the reference's *_TTA metric block."""
    from s2d_tpu.data.coco import register_coco
    from tools.train_net import main

    json_path, img_dir = synthetic_coco
    register_coco("synthetic_tta", json_path, img_dir, class_agnostic=True)
    out = str(tmp_path / "out")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main([
            "--eval-only", "--tta",
            "--tta-min-sizes", "32", "48",
            "--test-dataset", "synthetic_tta",
            "--output-dir", out,
            "--image-size", "64",
            "--max-instances", "4",
            "--num-proposals", "16",
        ]) == 0
    printed = buf.getvalue()
    assert "bbox/AP" in printed
    assert "bbox_TTA/AP" in printed
    assert "segm_TTA/AP" in printed


def test_merge_detections_negative_coords_stay_per_class():
    """A flipped-aug detection mapped back through boxes_to_original can
    carry negative x; its class-offset clone must not dip into the
    previous class's coordinate band and suppress an unrelated box."""
    boxes = jnp.array([
        [5.0, 5.0, 20.0, 20.0],     # class 0
        [-20.0, 5.0, 0.0, 20.0],    # class 1, negative x band
    ])
    scores = jnp.array([0.6, 0.9])
    classes = jnp.array([0, 1])
    valid = jnp.array([True, True])
    b, s, c, v = merge_detections(
        boxes, scores, classes, valid, nms_thresh=0.5, topk=2
    )
    # different classes never suppress each other, whatever the coords
    assert bool(v[0]) and bool(v[1])
    assert sorted(int(x) for x in np.asarray(c)) == [0, 1]
    np.testing.assert_allclose(sorted(float(x) for x in np.asarray(s)),
                               [0.6, 0.9], rtol=1e-6)
