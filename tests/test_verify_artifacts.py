"""tools/verify_reference_artifacts.py end-to-end against synthetic
stand-ins (VERDICT r4 #6): the day-one runbook for the real
`s2d_zeroshot.pth` / `scaled_offline.pth` / YTVIS-2021 artifacts must run
TODAY — a torch-oracle checkpoint in the reference's student_teacher
layout, a tiny YTVIS directory, and an upstream-shaped CoTracker .pth all
flow through the one command and every stage passes."""
import json
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

TOY = dict(hid=64, queries=10, heads=4, ff=128, dec=4, enc=2)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("verify_artifacts")

    # --- s2d_zeroshot stand-in: torch oracle in student_teacher layout ---
    from torch_oracle import TorchVideoMaskFormer

    torch.manual_seed(5)
    tm = TorchVideoMaskFormer(
        num_classes=1, hidden_dim=TOY["hid"], mask_dim=TOY["hid"],
        num_queries=TOY["queries"], nheads=TOY["heads"], dim_ff=TOY["ff"],
        dec_layers=TOY["dec"], enc_layers=TOY["enc"],
    )
    sd = tm.state_dict()

    def remap(prefix):
        out = {}
        for k, v in sd.items():
            if k.startswith("backbone."):
                out[f"{prefix}.0.{k[len('backbone.'):]}"] = v
            elif k.startswith("sem_seg_head."):
                out[f"{prefix}.1.{k[len('sem_seg_head.'):]}"] = v
        return out

    ckpt = {}
    ckpt.update(remap("student"))
    ckpt.update(remap("teacher"))
    zeroshot = root / "s2d_zeroshot.pth"
    torch.save({"model": ckpt}, str(zeroshot))

    # --- scaled_offline stand-in: upstream-shaped CoTracker state dict ---
    from s2d_tpu.keymask.cotracker import CoTrackerNet, to_torch_state_dict

    # PRODUCTION dims: the runbook's build_cotracker() constructs the
    # default net, so the stand-in must be shaped like the real file
    net = CoTrackerNet()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 384, 512, 3)),
        jnp.zeros((8, 2)), 0,
    )
    cot_sd = to_torch_state_dict(params)
    cotracker = root / "scaled_offline.pth"
    torch.save({"model." + k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in cot_sd.items()}, str(cotracker))

    # --- YTVIS stand-in: 1 video x 2 frames, the builtin dir layout ---
    import cv2

    from s2d_tpu.data import rle

    ytvis = root / "ytvis_2021"
    frames = ytvis / "JPEGImages"
    (frames / "v1").mkdir(parents=True)
    h, w, t = 64, 64, 2
    files = []
    for fi in range(t):
        name = f"v1/{fi:05d}.jpg"
        cv2.imwrite(str(frames / name), np.random.RandomState(fi).randint(
            0, 255, (h, w, 3), np.uint8))
        files.append(name)
    mask = np.zeros((h, w), bool)
    mask[10:30, 10:40] = True
    (ytvis / "valid.json").write_text(json.dumps({
        "videos": [{"id": 1, "file_names": files, "height": h, "width": w,
                    "length": t}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": [rle.encode(mask)] * t,
                         "iscrowd": 0}],
        "categories": [{"id": 1, "name": "fg"}],
    }))
    return dict(zeroshot=str(zeroshot), cotracker=str(cotracker),
                ytvis=str(ytvis), out=str(root / "out"))


def test_runbook_end_to_end(artifacts, capsys):
    import verify_reference_artifacts as vra

    rc = vra.main([
        "--zeroshot", artifacts["zeroshot"],
        "--cotracker", artifacts["cotracker"],
        "--ytvis", artifacts["ytvis"],
        "--config-file", "",
        "--probe-size", "64", "96",
        "--nheads", str(TOY["heads"]),
        "--output-dir", artifacts["out"],
        "MODEL.MASK_FORMER.HIDDEN_DIM", str(TOY["hid"]),
        "MODEL.SEM_SEG_HEAD.MASK_DIM", str(TOY["hid"]),
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", str(TOY["hid"]),
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", str(TOY["queries"]),
        "MODEL.MASK_FORMER.NHEADS", str(TOY["heads"]),
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", str(TOY["ff"]),
        "MODEL.MASK_FORMER.DEC_LAYERS", str(TOY["dec"] + 1),
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", str(TOY["enc"]),
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "10",
        "INPUT.MIN_SIZE_TEST", "64",
        "SOLVER.AMP.ENABLED", "False",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[convert] PASS" in out
    assert "[golden-parity] PASS" in out
    assert "[eval] PASS" in out
    # our own-shaped synthetic cotracker file imports bijectively
    assert "[cotracker] PASS" in out
    assert "verify_reference_artifacts: PASS" in out
    # the AP verdict line appears when an expectation is given
    rc2 = vra.main([
        "--zeroshot", artifacts["zeroshot"],
        "--skip-parity",
        "--ytvis", artifacts["ytvis"],
        "--config-file", "",
        "--expected-ap", "99.0", "--ap-tolerance", "0.2",
        "--output-dir", artifacts["out"],
        "MODEL.MASK_FORMER.HIDDEN_DIM", str(TOY["hid"]),
        "MODEL.SEM_SEG_HEAD.MASK_DIM", str(TOY["hid"]),
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", str(TOY["hid"]),
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", str(TOY["queries"]),
        "MODEL.MASK_FORMER.NHEADS", str(TOY["heads"]),
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", str(TOY["ff"]),
        "MODEL.MASK_FORMER.DEC_LAYERS", str(TOY["dec"] + 1),
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", str(TOY["enc"]),
        "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS", "10",
        "INPUT.MIN_SIZE_TEST", "64",
        "SOLVER.AMP.ENABLED", "False",
    ])
    out2 = capsys.readouterr().out
    # random weights certainly don't hit AP 99: the verdict must FAIL
    assert rc2 == 1
    assert "north-star verdict" in out2
    assert "[eval] FAIL" in out2
