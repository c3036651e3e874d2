"""tools/demo_video.py CLI: single-video back-compat and the multi-video
device fan-out (the reference AsyncPredictor's one-model-per-GPU queue,
`demo_video/predictor.py:130-218`, as round-robin data placement over the
8-virtual-device CPU mesh)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

_TINY_OPTS = [
    "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
    "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
    "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
    "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
    "MODEL.MASK_FORMER.NHEADS", "4",
    "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
    "MODEL.MASK_FORMER.DEC_LAYERS", "2",
    "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
    "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "4",
    "INPUT.MIN_SIZE_TEST", "64",
    "SOLVER.AMP.ENABLED", "False",
]


def _write_video(root, name, t=2, h=64, w=96):
    import cv2

    d = root / name
    d.mkdir(parents=True)
    for fi in range(t):
        img = np.random.RandomState(hash(name) % 1000 + fi).randint(
            0, 255, (h, w, 3), np.uint8
        )
        cv2.imwrite(str(d / f"{fi:05d}.jpg"), img)
    return d


def test_demo_cli_single_video(tmp_path):
    import demo_video

    vid = _write_video(tmp_path, "v1")
    out = tmp_path / "out"
    rc = demo_video.main([
        "--input", str(vid / "*.jpg"),
        "--output", str(out),
        "--confidence-threshold", "0.0",
        *_TINY_OPTS,
    ])
    assert rc == 0
    # single-video contract: overlays at the OUTPUT ROOT, one per frame
    assert sorted(os.listdir(out)) == ["frame_00000.png", "frame_00001.png"]


def test_demo_cli_multi_video_fanout(tmp_path, capsys):
    """--input matching DIRECTORIES fans videos out round-robin over the
    local devices; outputs land under per-video subdirs."""
    import jax

    import demo_video

    assert len(jax.local_devices()) >= 2
    for name in ("va", "vb", "vc"):
        _write_video(tmp_path / "vids", name)
    out = tmp_path / "out"
    rc = demo_video.main([
        "--input", str(tmp_path / "vids" / "v*"),
        "--output", str(out),
        "--confidence-threshold", "0.0",
        "--save-masks",
        *_TINY_OPTS,
    ])
    assert rc == 0
    for name in ("va", "vb", "vc"):
        files = sorted(os.listdir(out / name))
        assert "frame_00000.png" in files and "mask_00001.png" in files
    printed = capsys.readouterr().out
    # three videos placed on three DISTINCT devices (round-robin)
    devs = {line.split("@", 1)[1].split("]")[0].strip()
            for line in printed.splitlines()
            if line.startswith("[v") and "@" in line}
    assert len(devs) == 3, printed
    assert "processed 3 video(s)" in printed
