"""The full S2D pipeline chained end-to-end on a synthetic video, each
stage consuming the PREVIOUS stage's on-disk artifact (the README's
four-stage recipe; reference README.md:24-27 stages 2-3 plus the round-2
self-distillation):

  keymask discovery (frames + stage-1 masks -> dataset.json)
    -> sparse video training on the discovered keymasks
    -> eval-only inference (results.json)
    -> convert_results_to_annotations (round-2 densification)
    -> KD self-distillation training on the converted annotations

Per-stage behavior is covered in the dedicated e2e tests; this test pins
the INTERFACES: every artifact a stage writes is loadable, non-empty, and
accepted verbatim by the next stage's CLI.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

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
]


@pytest.fixture(scope="module")
def pipeline_tree(tmp_path_factory):
    """Two synthetic videos: a bright moving patch over static noise (the
    same construction the keymask discovery e2e uses), with color-PNG
    pseudo-masks standing in for the stage-1 CutS3D frame masks."""
    import cv2

    root = tmp_path_factory.mktemp("pipeline")
    frames_root = root / "frames"
    masks_root = root / "masks"
    h, w, t, size = 64, 96, 4, 24
    for vid in range(2):
        name = f"vid{vid}"
        (frames_root / name).mkdir(parents=True)
        (masks_root / name).mkdir(parents=True)
        rng = np.random.RandomState(vid)
        bg = rng.randint(0, 80, (h, w, 3), np.uint8)
        patch = rng.randint(120, 255, (size, size, 3), np.uint8)
        y0 = (h - size) // 2
        for fi in range(t):
            x0 = 6 + fi * 3
            frame = bg.copy()
            frame[y0 : y0 + size, x0 : x0 + size] = patch
            cv2.imwrite(str(frames_root / name / f"{fi:05d}.jpg"),
                        cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            mask_png = np.zeros((h, w, 3), np.uint8)
            mask_png[y0 : y0 + size, x0 : x0 + size] = (255, 0, 0)
            cv2.imwrite(str(masks_root / name / f"{fi:05d}.png"),
                        cv2.cvtColor(mask_png, cv2.COLOR_RGB2BGR))
    return str(root), str(frames_root), str(masks_root)


def test_pipeline_chain(pipeline_tree, tmp_path):
    from s2d_tpu.data.ytvis import register_ytvis
    import keymask_ident
    import train_net_video
    import convert_results_to_annotations as convert_cli

    root, frames_root, masks_root = pipeline_tree

    # ---- stage 2: keymask discovery + merge -------------------------
    disco = os.path.join(root, "disco")
    rc = keymask_ident.main([
        "--frames-root", frames_root,
        "--masks-root", masks_root,
        "--output-root", disco,
        "--grid-size", "16",
        "--dbscan-min-samples", "2",
        "--matching-threshold", "0.3",
        "--merge",
    ])
    assert rc == 0
    dataset_json = os.path.join(disco, "dataset.json")
    merged = json.load(open(dataset_json))
    assert merged["videos"] and merged["annotations"]
    # discovery emits file_names relative to the frames root
    register_ytvis("chain_keymasks", dataset_json, frames_root,
                   class_agnostic=True)

    # ---- stage 3: sparse training on the discovered keymasks --------
    sparse_out = str(tmp_path / "sparse")
    rc = train_net_video.main([
        "SOLVER.MAX_ITER", "2",
        "DATASETS.TRAIN", "('chain_keymasks',)",
        "OUTPUT_DIR", sparse_out,
        *_TINY_OPTS,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(sparse_out, "metrics.json"))]
    assert np.isfinite(lines[-1]["total_loss"])

    # ---- stage 3b: eval-only inference over the same videos ---------
    eval_out = str(tmp_path / "eval")
    rc = train_net_video.main([
        "--eval-only",
        "DATASETS.TEST", "('chain_keymasks',)",
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
        "INPUT.MIN_SIZE_TEST", "64",
        "OUTPUT_DIR", eval_out,
        *_TINY_OPTS,
    ])
    assert rc == 0
    results_json = os.path.join(eval_out, "results.json")
    results = json.load(open(results_json))
    assert results, "eval produced no predictions"

    # ---- stage 4a: round-2 densification of the results --------------
    dense_json = str(tmp_path / "dense.json")
    rc = convert_cli.main([
        "--results", results_json,
        "--gt-json", dataset_json,
        "--output", dense_json,
        "--score-threshold", "0.0",
    ])
    assert rc in (0, None)
    dense = json.load(open(dense_json))
    assert dense["videos"] and dense["annotations"]
    register_ytvis("chain_dense", dense_json, frames_root,
                   class_agnostic=True)

    # ---- stage 4b: KD self-distillation on the converted set --------
    kd_out = str(tmp_path / "kd")
    rc = train_net_video.main([
        "SOLVER.MAX_ITER", "2",
        "DATASETS.TRAIN", "('chain_dense',)",
        "OUTPUT_DIR", kd_out,
        *_TINY_OPTS,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(kd_out, "metrics.json"))]
    assert np.isfinite(lines[-1]["total_loss"])
    assert "kd_loss_mask" in lines[-1]
