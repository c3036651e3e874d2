"""End-to-end keymask discovery CLI on a synthetic video with color-PNG
pseudo-masks: visibility -> windows -> matching -> YTVIS JSON -> merge."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def discovery_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("discovery")
    frames_root = root / "frames"
    masks_root = root / "masks"
    name = "vid0"
    (frames_root / name).mkdir(parents=True)
    (masks_root / name).mkdir(parents=True)

    rng = np.random.RandomState(0)
    h, w, t, size, speed = 64, 96, 4, 24, 3
    bg = rng.randint(0, 80, (h, w, 3), np.uint8)
    patch = rng.randint(120, 255, (size, size, 3), np.uint8)
    y0 = (h - size) // 2
    for fi in range(t):
        x0 = 6 + fi * speed
        frame = bg.copy()
        frame[y0 : y0 + size, x0 : x0 + size] = patch
        cv2.imwrite(str(frames_root / name / f"{fi:05d}.jpg"),
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        mask_png = np.zeros((h, w, 3), np.uint8)
        mask_png[y0 : y0 + size, x0 : x0 + size] = (255, 0, 0)
        cv2.imwrite(str(masks_root / name / f"{fi:05d}.png"),
                    cv2.cvtColor(mask_png, cv2.COLOR_RGB2BGR))
    return str(frames_root), str(masks_root), str(root / "out")


def test_keymask_cli_end_to_end(discovery_tree):
    import keymask_ident

    frames_root, masks_root, out_root = discovery_tree
    rc = keymask_ident.main([
        "--frames-root", frames_root,
        "--masks-root", masks_root,
        "--output-root", out_root,
        "--grid-size", "16",
        "--dbscan-min-samples", "2",
        "--matching-threshold", "0.3",
        "--merge",
    ])
    assert rc == 0
    anns = os.listdir(os.path.join(out_root, "annotations"))
    assert len(anns) == 1
    with open(os.path.join(out_root, "annotations", anns[0])) as f:
        data = json.load(f)
    assert data["categories"] == [{"id": 1, "name": "fg"}]
    assert data["videos"][0]["length"] == 4
    # the moving square should be discovered as at least one track
    assert data["annotations"], "expected a discovered instance"
    segs = data["annotations"][0]["segmentations"]
    assert sum(s is not None for s in segs) >= 2
    # merged dataset written
    with open(os.path.join(out_root, "dataset.json")) as f:
        merged = json.load(f)
    assert merged["annotations"]
    # candidate masks exported
    cand_dir = os.path.join(out_root, "candidates", "vid0")
    assert os.path.isdir(cand_dir) and os.listdir(cand_dir)


def test_keymask_cli_cotracker_backend(discovery_tree, tmp_path):
    """The CLI's --tracker cotracker path: neural-tracker backend (random
    init, no checkpoint) drives the same pipeline end-to-end."""
    import keymask_ident

    frames_root, masks_root, _ = discovery_tree
    out_root = str(tmp_path / "out_ct")
    rc = keymask_ident.main([
        "--frames-root", frames_root,
        "--masks-root", masks_root,
        "--output-root", out_root,
        "--tracker", "cotracker",
        "--grid-size", "8",
        "--dbscan-min-samples", "2",
        "--matching-threshold", "0.3",
    ])
    assert rc == 0
    anns = os.listdir(os.path.join(out_root, "annotations"))
    assert len(anns) == 1  # pipeline completed (content depends on the
    # random-init tracker; correctness of the net is test_cotracker.py's)
