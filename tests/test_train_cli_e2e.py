"""End-to-end trainer CLI: a few KD train iterations through
tools/train_net_video.main() on a synthetic dataset (CPU, tiny model)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from s2d_tpu.data import register_ytvis, rle


@pytest.fixture(scope="module")
def train_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("train_e2e")
    img_root = root / "frames"
    img_root.mkdir()
    videos, annotations = [], []
    h, w, t = 64, 64, 4
    for vid in (1, 2):
        files = []
        (img_root / f"v{vid}").mkdir()
        for fi in range(t):
            name = f"v{vid}/{fi:05d}.jpg"
            img = np.random.RandomState(vid * 10 + fi).randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(str(img_root / name), img)
            files.append(name)
        videos.append({"id": vid, "file_names": files, "height": h, "width": w, "length": t})
        mask = np.zeros((h, w), bool)
        mask[10:30, 10:40] = True
        annotations.append({
            "id": vid, "video_id": vid, "category_id": 1,
            "segmentations": [rle.encode(mask)] * t, "iscrowd": 0,
        })
    (root / "train.json").write_text(json.dumps({
        "videos": videos, "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }))
    register_ytvis("tiny_train_e2e", str(root / "train.json"), str(img_root),
                   class_agnostic=True)
    return str(root)


def test_train_cli_few_iters(train_dataset, tmp_path, monkeypatch):
    import train_net_video

    out_dir = str(tmp_path / "out")
    rc = train_net_video.main([
        "SOLVER.MAX_ITER", "2",
        "SOLVER.IMS_PER_BATCH", "1",
        "DATASETS.TRAIN", "('tiny_train_e2e',)",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "64",
        "SOLVER.AMP.ENABLED", "False",
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    metrics_path = os.path.join(out_dir, "metrics.json")
    assert os.path.exists(metrics_path)
    lines = [json.loads(l) for l in open(metrics_path)]
    assert len(lines) == 2
    assert np.isfinite(lines[-1]["total_loss"])
    assert "kd_loss_mask" in lines[-1]
