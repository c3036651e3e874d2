"""End-to-end eval path: registered dataset -> inference -> results.json ->
spatio-temporal AP. Tiny model, synthetic videos, CPU."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.config import load_config
from s2d_tpu.data import register_ytvis, rle
from s2d_tpu.evaluation.evaluator import evaluate_dataset
from s2d_tpu.models import build_model


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("e2e")
    img_root = root / "frames"
    img_root.mkdir()
    videos, annotations = [], []
    h, w, t = 64, 96, 3
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
        mask[16:40, 24:64] = True
        annotations.append(
            {
                "id": vid,
                "video_id": vid,
                "category_id": 1,
                "segmentations": [rle.encode(mask)] * t,
                "iscrowd": 0,
            }
        )
    data = {"videos": videos, "annotations": annotations,
            "categories": [{"id": 1, "name": "fg"}]}
    json_path = root / "valid.json"
    json_path.write_text(json.dumps(data))
    register_ytvis("tiny_e2e_val", str(json_path), str(img_root), class_agnostic=True)
    return str(root)


def test_eval_only_end_to_end(tiny_dataset, tmp_path):
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
        "INPUT.MIN_SIZE_TEST", "64",
        "SOLVER.AMP.ENABLED", "False",
    ])
    model = build_model(cfg, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 96, 3)))

    out_dir = str(tmp_path / "out")
    metrics = evaluate_dataset(cfg, model, variables, "tiny_e2e_val", output_dir=out_dir)

    # structure: all protocol metrics present, results.json written
    for key in ("AP", "AP50", "AP75", "APs", "APm", "APl", "AR1", "AR10", "AR100"):
        assert key in metrics
    results_path = os.path.join(out_dir, "results.json")
    assert os.path.exists(results_path)
    with open(results_path) as f:
        results = json.load(f)
    assert results, "expected some predictions"
    r = results[0]
    assert set(r) >= {"video_id", "score", "category_id", "segmentations"}
    assert len(r["segmentations"]) == 3  # all frames
    # RLEs decode at the original resolution
    seg = r["segmentations"][0]
    assert seg["size"] == [64, 96]
    rle.decode(seg)


@pytest.fixture(scope="module")
def many_videos_dataset(tmp_path_factory):
    """Six tiny videos of mixed lengths — more videos than any of the
    evaluator's pipeline queue depths (prefetch 2, finalize 2+2), so the
    three-thread overlap actually wraps around."""
    import cv2

    root = tmp_path_factory.mktemp("e2e_many")
    img_root = root / "frames"
    img_root.mkdir()
    videos, annotations = [], []
    h, w = 64, 96
    lengths = [3, 4, 5, 3, 6, 4]
    for vid, t in enumerate(lengths, start=1):
        files = []
        (img_root / f"v{vid}").mkdir()
        for fi in range(t):
            name = f"v{vid}/{fi:05d}.jpg"
            img = np.random.RandomState(vid * 100 + fi).randint(
                0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(str(img_root / name), img)
            files.append(name)
        videos.append({"id": vid, "file_names": files, "height": h,
                       "width": w, "length": t})
        mask = np.zeros((h, w), bool)
        mask[16:40, 24:64] = True
        annotations.append({
            "id": vid, "video_id": vid, "category_id": 1,
            "segmentations": [rle.encode(mask)] * t, "iscrowd": 0,
        })
    data = {"videos": videos, "annotations": annotations,
            "categories": [{"id": 1, "name": "fg"}]}
    json_path = root / "valid.json"
    json_path.write_text(json.dumps(data))
    register_ytvis("tiny_e2e_many", str(json_path), str(img_root),
                   class_agnostic=True)
    return lengths


def _tiny_cfg():
    return load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
        "INPUT.MIN_SIZE_TEST", "64",
        "SOLVER.AMP.ENABLED", "False",
    ])


def test_pipelined_finalize_order_and_lengths(many_videos_dataset, tmp_path):
    """With more videos than the queue depths, results.json must still be
    in dataset order, one group per video, each track carrying exactly
    that video's frame count (the T-bucket pad must never leak)."""
    lengths = many_videos_dataset
    cfg = _tiny_cfg()
    model = build_model(cfg, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 96, 3)))

    out_dir = str(tmp_path / "out")
    evaluate_dataset(cfg, model, variables, "tiny_e2e_many", output_dir=out_dir)
    with open(os.path.join(out_dir, "results.json")) as f:
        results = json.load(f)
    assert results
    seen = []
    for r in results:
        if r["video_id"] not in seen:
            seen.append(r["video_id"])
        assert len(r["segmentations"]) == lengths[r["video_id"] - 1]
    assert seen == sorted(seen), f"results out of dataset order: {seen}"


def test_finalize_error_propagates(many_videos_dataset, tmp_path, monkeypatch):
    """An error on the second finalize thread (mask readback) must surface
    from evaluate_dataset, not hang the pipeline or be swallowed."""
    from s2d_tpu.evaluation import inference as inf_mod

    def boom(handle, keep, timers=None, as_window=False):
        raise RuntimeError("mask readback exploded")

    monkeypatch.setattr(inf_mod, "finish_kept_masks_read", boom)
    cfg = _tiny_cfg()
    model = build_model(cfg, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 96, 3)))
    with pytest.raises(RuntimeError, match="mask readback exploded"):
        evaluate_dataset(cfg, model, variables, "tiny_e2e_many",
                         output_dir=str(tmp_path / "out_err"))
