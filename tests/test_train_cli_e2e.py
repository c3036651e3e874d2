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


_TINY_OPTS = [
    "SOLVER.IMS_PER_BATCH", "1",
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
    "DATASETS.TRAIN", "('tiny_train_e2e',)",
]


def test_train_cli_copy_paste(train_dataset, tmp_path):
    """DATALOADER.COPY_PASTE drives the clip copy-paste batch transform
    (reference train_loop.py:703) — the run must train, not just parse."""
    import train_net_video

    out_dir = str(tmp_path / "out_cp")
    rc = train_net_video.main(_TINY_OPTS + [
        "SOLVER.MAX_ITER", "2",
        "DATALOADER.COPY_PASTE", "True",
        "DATALOADER.COPY_PASTE_RATE", "1.0",
        "DATALOADER.COPY_PASTE_DENSIFY_SPARSE", "False",
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.json"))]
    assert len(lines) == 2 and np.isfinite(lines[-1]["total_loss"])


def test_train_cli_resume_continues_iteration(train_dataset, tmp_path):
    """Resume must continue from the stored step, not restart at 0
    (reference engine/defaults.py:450-473): total executed steps ==
    MAX_ITER, metrics.json iterations are contiguous across restarts."""
    import train_net_video

    out_dir = str(tmp_path / "out_resume")
    rc = train_net_video.main(_TINY_OPTS + [
        "SOLVER.MAX_ITER", "2",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    rc = train_net_video.main(["--resume"] + _TINY_OPTS + [
        "SOLVER.MAX_ITER", "3",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.json"))]
    iters = [l["iteration"] for l in lines if "total_loss" in l]
    # 2 steps in run 1 + exactly 1 fresh step in run 2 (not 3 more)
    assert iters == [0, 1, 2]
    # data/step timing is logged (reference IterationTimer counterpart)
    assert "data_time" in lines[-1] and "time" in lines[-1]


def test_train_cli_eval_period(train_dataset, tmp_path):
    """TEST.EVAL_PERIOD runs in-training evaluation (reference EvalHook,
    engine/defaults.py:519-565): AP metrics appear mid-train."""
    import train_net_video

    out_dir = str(tmp_path / "out_evalp")
    rc = train_net_video.main(_TINY_OPTS + [
        "SOLVER.MAX_ITER", "2",
        "TEST.EVAL_PERIOD", "2",
        "DATASETS.TEST", "('tiny_train_e2e',)",
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
        "INPUT.MIN_SIZE_TEST", "64",
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.json"))]
    eval_lines = [l for l in lines if any("AP" in k for k in l)]
    assert eval_lines, "mid-train eval metrics missing from metrics.json"


def test_train_cli_model_parallel(train_dataset, tmp_path):
    """--model-parallel 2 on the 8-virtual-device mesh: dp x tp training
    runs and produces finite losses."""
    import train_net_video

    out_dir = str(tmp_path / "out_tp")
    rc = train_net_video.main([
        "--model-parallel", "2",
        "SOLVER.MAX_ITER", "2",
        *_TINY_OPTS,
        "OUTPUT_DIR", out_dir,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.json"))]
    assert len(lines) == 2
    assert np.isfinite(lines[-1]["total_loss"])
