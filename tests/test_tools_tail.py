"""Tool-tail coverage: boundary AP, PQ-for-semseg, and the image demo CLI
(reference `tools/evaluate_coco_boundary_ap.py`,
`tools/evaluate_pq_for_semantic_segmentation.py`, `demo/demo.py`)."""
import json
import os
import sys

import numpy as np
import pytest

from s2d_tpu.data import rle

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


# ----------------------------------------------------------- boundary AP

def _square(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_boundary_iou_penalizes_contour_errors():
    from s2d_tpu.evaluation.boundary import boundary_iou, mask_to_boundary

    gt = _square(64, 64, 10, 50, 10, 50)
    assert boundary_iou(gt, gt) == 1.0

    # interior-preserving contour damage: shave a 2px strip off one side.
    # Mask IoU stays high; boundary IoU must drop far more.
    dt = _square(64, 64, 10, 50, 12, 50)
    inter, union = rle.iou_intersection_union(rle.encode(gt), rle.encode(dt))
    mask_iou = inter / union
    b_iou = boundary_iou(gt, dt)
    assert mask_iou > 0.9
    assert b_iou < mask_iou

    # the boundary band is a ring: it excludes deep-interior pixels
    band = mask_to_boundary(gt, dilation_ratio=0.02)
    assert band[10, 10] and not band[30, 30]


def test_boundary_ap_perfect_and_degraded():
    from s2d_tpu.evaluation.boundary import evaluate_detections_boundary
    from s2d_tpu.evaluation.ytvos_eval import evaluate_detections_masks

    gts, dts_perfect, dts_ragged = [], [], []
    for img in (1, 2):
        gt = _square(64, 64, 8, 56, 8, 56)
        ragged = gt.copy()
        # sawtooth the left edge: tiny area change, big contour change
        ragged[8:56:2, 8:11] = False
        gts.append({"image_id": img, "category_id": 1,
                    "segmentation": rle.encode(gt)})
        dts_perfect.append({"image_id": img, "category_id": 1,
                            "segmentation": rle.encode(gt), "score": 0.9})
        dts_ragged.append({"image_id": img, "category_id": 1,
                           "segmentation": rle.encode(ragged), "score": 0.9})

    assert evaluate_detections_boundary(gts, dts_perfect)["AP"] == pytest.approx(1.0)
    mask_ap = evaluate_detections_masks(gts, dts_ragged)["AP"]
    bound_ap = evaluate_detections_boundary(gts, dts_ragged)["AP"]
    assert bound_ap <= mask_ap  # contour errors cost boundary AP first


def test_boundary_ap_cli(tmp_path, capsys):
    import evaluate_coco_boundary_ap as cli

    gt_json = {
        "images": [{"id": 1, "height": 64, "width": 64,
                    "file_name": "a.jpg"}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": rle.encode(_square(64, 64, 8, 56, 8, 56)),
            "area": 48 * 48, "bbox": [8, 8, 48, 48],
        }],
        "categories": [{"id": 1, "name": "fg"}],
    }
    dt = [{
        "image_id": 1, "category_id": 1, "score": 0.8,
        "segmentation": rle.encode(_square(64, 64, 8, 56, 8, 56)),
        "bbox": [8, 8, 48, 48],
    }]
    gt_path, dt_path = tmp_path / "gt.json", tmp_path / "dt.json"
    gt_path.write_text(json.dumps(gt_json))
    dt_path.write_text(json.dumps(dt))

    rc = cli.main(["--gt-json-file", str(gt_path), "--dt-json-file", str(dt_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "boundary/AP: 100.000" in out

    rc = cli.main(["--gt-json-file", str(gt_path), "--dt-json-file", str(dt_path),
                   "--iou-type", "segm"])
    assert rc == 0
    assert "segm/AP: 100.000" in capsys.readouterr().out


# ------------------------------------------------------------------- PQ

def test_pq_single_image_hand_case():
    from s2d_tpu.evaluation.pq import PQStat, pq_single_image

    # 8x8: gt left half class 1, right half class 2
    gt = np.zeros((8, 8), np.int64)
    gt[:, :4] = 1
    gt[:, 4:] = 2
    # dt: class 1 exact; right side split into class 2 (top, IoU .5 -> no
    # match) and class 3 (bottom, pure FP)
    dt = np.zeros((8, 8), np.int64)
    dt[:, :4] = 1
    dt[:4, 4:] = 2
    dt[4:, 4:] = 3
    stat = pq_single_image(gt, dt, ignore_label=255)
    res = stat.average()
    # cats: 1 (TP iou 1), 2 (FN: IoU .5 not > .5, plus the dt FP), 3 (FP)
    assert stat.stats[1].tp == 1 and stat.stats[1].iou == pytest.approx(1.0)
    assert stat.stats[2].fn == 1 and stat.stats[2].fp == 1
    assert stat.stats[3].fp == 1
    assert res["n"] == 3
    assert res["pq"] == pytest.approx((1.0 + 0.0 + 0.0) / 3)

    # accumulation across images
    total = PQStat()
    total += stat
    total += pq_single_image(gt, gt, ignore_label=255)
    assert total.stats[1].tp == 2


def test_pq_void_handling():
    from s2d_tpu.evaluation.pq import pq_single_image

    gt = np.full((8, 8), 255, np.int64)  # all VOID
    gt[:4] = 1
    dt = np.zeros((8, 8), np.int64)
    dt[:4] = 1          # matches class 1 exactly
    dt[4:] = 7          # lives entirely on VOID -> ignored, not a FP
    stat = pq_single_image(gt, dt, ignore_label=255)
    assert stat.stats[1].tp == 1
    assert 7 not in stat.stats or stat.stats[7].fp == 0


def test_pq_cli(tmp_path, capsys):
    import cv2

    import evaluate_pq_for_semantic_segmentation as cli
    from s2d_tpu.data.image_datasets import register_sem_seg

    img_root = tmp_path / "images"
    gt_root = tmp_path / "labels"
    img_root.mkdir()
    gt_root.mkdir()
    gt = np.zeros((32, 32), np.uint8)
    gt[:, 16:] = 1
    cv2.imwrite(str(gt_root / "im0.png"), gt)
    cv2.imwrite(str(img_root / "im0.jpg"), np.zeros((32, 32, 3), np.uint8))
    register_sem_seg("tiny_pq_val", str(img_root), str(gt_root),
                     num_classes=2, ignore_label=255)

    preds = [
        {"file_name": "im0.jpg", "category_id": 0,
         "segmentation": rle.encode(_square(32, 32, 0, 32, 0, 16))},
        {"file_name": "im0.jpg", "category_id": 1,
         "segmentation": rle.encode(_square(32, 32, 0, 32, 16, 32))},
    ]
    pred_path = tmp_path / "preds.json"
    pred_path.write_text(json.dumps(preds))

    rc = cli.main(["--dataset-name", "tiny_pq_val",
                   "--json-file", str(pred_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "100.0  100.0  100.0     2" in out
    assert "mIoU: 1.0" in out

    # sparse predictions: uncovered pixels count as class-0 PREDICTIONS
    # (reference tool initializes the canvas with zeros, line 184), so a
    # class-1-only prediction must NOT score a perfect class-0 too
    sparse = [preds[1]]  # only the class-1 half painted
    sparse_path = tmp_path / "sparse.json"
    sparse_path.write_text(json.dumps(sparse))
    rc = cli.main(["--dataset-name", "tiny_pq_val",
                   "--json-file", str(sparse_path)])
    out = capsys.readouterr().out
    assert rc == 0
    # class 0's gt half is now "predicted" by the zero canvas -> still a
    # TP at IoU 1 here, but mIoU stays 1.0 and, critically, no VOID
    # exemption: paint NOTHING and class 0 swallows the image
    empty_path = tmp_path / "empty.json"
    empty_path.write_text(json.dumps(
        [{"file_name": "im0.jpg", "category_id": 0,
          "segmentation": rle.encode(np.zeros((32, 32), bool))}]))
    rc = cli.main(["--dataset-name", "tiny_pq_val",
                   "--json-file", str(empty_path)])
    out = capsys.readouterr().out
    assert rc == 0
    # all-zeros canvas vs half-0/half-1 gt: class 0 IoU 0.5 (no match at
    # the >0.5 rule), class 1 FN -> PQ 0, mIoU (0.5 + 0)/2
    assert "  0.0    0.0    0.0" in out
    assert "mIoU: 0.25" in out


# ------------------------------------------------------------ image demo

def test_image_demo_cli(tmp_path):
    import cv2

    import demo as demo_cli

    img_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    np.random.RandomState(i).randint(0, 255, (64, 64, 3), np.uint8))

    opts = [
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "64",
        "SOLVER.AMP.ENABLED", "False",
    ]
    rc = demo_cli.main([
        "--input", str(img_dir / "*.jpg"), "--output", str(out_dir),
        "--task", "instance", "--confidence-threshold", "0.0", *opts,
    ])
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == ["im0.jpg", "im1.jpg"]
    # semantic task reuses the same compiled forward shape
    rc = demo_cli.main([
        "--input", str(img_dir / "im0.jpg"), "--output", str(out_dir),
        "--task", "semantic", *opts,
    ])
    assert rc == 0


def test_export_model_cli(tmp_path):
    """tools/export_model.py: the serialized StableHLO serving artifact
    reproduces the jitted eval pipeline (verified in-tool), writes a
    manifest + orbax params, and cross-lowers for TPU from a CPU host."""
    import export_model

    opts = [
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
    ]
    out = str(tmp_path / "export")
    rc = export_model.main([
        "--output", out, "--frames", "2", "--height", "64", "--width", "96",
        "--verify", *opts,
    ])
    assert rc == 0
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["input"]["frames"] == [2, 64, 96, 3]
    assert manifest["output_size"] == [128, 192]
    assert manifest["masks_packed_along_h"] is True
    # serving contract: exactly the documented outputs, all in prediction
    # order — the interactive kept-first transport layout ("order"/"small"
    # extras) must not leak into the artifact
    assert set(manifest["outputs"]) == {"scores", "labels", "keep", "masks"}
    assert os.path.exists(os.path.join(out, "module.bin"))
    assert os.path.isdir(os.path.join(out, "params"))

    # cross-platform lowering: a TPU artifact from this CPU host
    out_tpu = str(tmp_path / "export_tpu")
    rc = export_model.main([
        "--output", out_tpu, "--platform", "tpu",
        "--frames", "2", "--height", "64", "--width", "96", *opts,
    ])
    assert rc == 0
    manifest = json.load(open(os.path.join(out_tpu, "manifest.json")))
    assert manifest["platforms"] == ["tpu"]
