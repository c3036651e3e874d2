"""Pretrained-backbone prep + graft (VERDICT r4 missing #5): a raw
torchvision-shaped ResNet-50 state_dict flows through
tools/convert_pretrained_weights.py (reference convert-torchvision-to-d2
semantics) and loads through MODEL.WEIGHTS in the video CLI as a
backbone graft into a fresh model, BN folded."""
import json
import os
import pickle
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

_R50_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}
_R50_WIDTH = {1: 64, 2: 128, 3: 256, 4: 512}


def _tv_resnet50_state(rng):
    """Synthetic state dict with torchvision resnet50's exact key set."""
    sd = {}

    # He-ish scaled weights and near-identity BN stats: the grafted
    # 50-layer forward must stay finite (raw unit-normal weights explode)
    def conv(name, o, i, k):
        sd[name] = (rng.normal(size=(o, i, k, k))
                    * np.sqrt(2.0 / (i * k * k))).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.9, 1.1, size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(c,)) * 0.05).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.normal(size=(c,)) * 0.05).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.8, 1.2, size=(c,)).astype(
            np.float32
        )
        sd[f"{name}.num_batches_tracked"] = np.asarray(1, np.int64)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for stage, nblocks in _R50_BLOCKS.items():
        width = _R50_WIDTH[stage]
        out_ch = width * 4
        for b in range(nblocks):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1.weight", width, in_ch if b == 0 else out_ch, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2.weight", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3.weight", out_ch, width, 1)
            bn(f"{p}.bn3", out_ch)
            if b == 0:
                conv(f"{p}.downsample.0.weight", out_ch, in_ch, 1)
                bn(f"{p}.downsample.1", out_ch)
        in_ch = out_ch
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def r50_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp("tvprep")
    rng = np.random.RandomState(0)
    sd = _tv_resnet50_state(rng)
    pth = root / "r50.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))

    import convert_pretrained_weights as cpw

    out = root / "r50.pkl"
    rc = cpw.main(["--torchvision", str(pth), "--output", str(out)])
    assert rc == 0
    return sd, str(out)


def test_converted_naming_matches_reference_semantics(r50_pkl):
    sd, pkl_path = r50_pkl
    with open(pkl_path, "rb") as f:
        res = pickle.load(f)
    assert res["matching_heuristics"] is True and res["__author__"] == "torchvision"
    model = res["model"]
    # reference renames: stem for non-layer keys, layerN->res(N+1),
    # bnN->convN.norm, downsample.0->shortcut, downsample.1->shortcut.norm
    assert "stem.conv1.weight" in model
    assert "stem.conv1.norm.weight" in model  # bn1 under stem
    assert "res2.0.conv1.weight" in model
    assert "res2.0.conv2.norm.running_mean" in model
    assert "res2.0.shortcut.weight" in model
    assert "res2.0.shortcut.norm.weight" in model
    assert "res5.2.conv3.weight" in model
    assert "stem.fc.weight" in model  # the classifier rides along (ignored)
    np.testing.assert_array_equal(model["stem.conv1.weight"], sd["conv1.weight"])


def test_backbone_graft_values_and_bn_fold(r50_pkl):
    sd, pkl_path = r50_pkl
    import jax
    import jax.numpy as jnp

    from s2d_tpu.checkpoint.torch_import import (
        BN_EPS,
        is_backbone_only,
        load_backbone_weights,
        load_torch_checkpoint,
    )
    from s2d_tpu.config import load_config
    from s2d_tpu.models import build_model

    assert is_backbone_only(load_torch_checkpoint(pkl_path))
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "SOLVER.AMP.ENABLED", "False",
    ])
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3)))
    before = np.asarray(
        variables["params"]["predictor"]["query_feat"]
    ).copy()
    out = load_backbone_weights(pkl_path, variables)
    # backbone got the converted weights (OIHW -> HWIO), BN folded
    got = np.asarray(out["params"]["backbone"]["stem_conv1"]["kernel"])
    np.testing.assert_allclose(
        got, sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6
    )
    scale = sd["bn1.weight"] / np.sqrt(sd["bn1.running_var"] + BN_EPS)
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["stem_norm1"]["scale"]),
        scale, rtol=1e-5,
    )
    # non-backbone params untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["predictor"]["query_feat"]), before
    )
    # the grafted model runs
    y = model.apply(out, jnp.zeros((1, 1, 64, 64, 3)))
    assert np.isfinite(np.asarray(y["pred_masks"])).all()


def test_cli_trains_from_backbone_pkl(r50_pkl, tmp_path):
    """MODEL.WEIGHTS pointing at the prep pkl trains through the CLI
    (graft + fresh heads), mirroring the reference's d2 workflow."""
    import cv2

    import train_net_video
    from s2d_tpu.data import register_ytvis, rle

    _, pkl_path = r50_pkl
    img_root = tmp_path / "frames"
    (img_root / "v1").mkdir(parents=True)
    h = w = 64
    files = []
    for fi in range(4):
        name = f"v1/{fi:05d}.jpg"
        cv2.imwrite(str(img_root / name),
                    np.random.RandomState(fi).randint(0, 255, (h, w, 3), np.uint8))
        files.append(name)
    mask = np.zeros((h, w), bool)
    mask[10:30, 10:40] = True
    (tmp_path / "train.json").write_text(json.dumps({
        "videos": [{"id": 1, "file_names": files, "height": h, "width": w,
                    "length": 4}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": [rle.encode(mask)] * 4,
                         "iscrowd": 0}],
        "categories": [{"id": 1, "name": "fg"}],
    }))
    register_ytvis("tv_bb_train", str(tmp_path / "train.json"),
                   str(img_root), class_agnostic=True)
    out_dir = str(tmp_path / "out")
    rc = train_net_video.main([
        "SOLVER.MAX_ITER", "1",
        "SOLVER.IMS_PER_BATCH", "1",
        "DATASETS.TRAIN", "('tv_bb_train',)",
        "MODEL.WEIGHTS", pkl_path,
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
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.json"))]
    assert np.isfinite(lines[-1]["total_loss"])


def test_swin_prep_wraps_keys_unchanged(tmp_path):
    """--swin mirrors the reference's trivial wrapper: official checkpoint
    keys pass through untouched under {"model": ...}."""
    import convert_pretrained_weights as cpw

    sd = {
        "patch_embed.proj.weight": torch.zeros(96, 3, 4, 4),
        "layers.0.blocks.0.attn.qkv.weight": torch.zeros(288, 96),
        "norm.weight": torch.zeros(768),
    }
    pth = tmp_path / "swin.pth"
    torch.save({"model": sd}, str(pth))
    out = tmp_path / "swin.pkl"
    assert cpw.main(["--swin", str(pth), "--output", str(out)]) == 0
    with open(out, "rb") as f:
        res = pickle.load(f)
    assert res["__author__"] == "third_party"
    assert set(res["model"]) == set(sd)


def test_graft_merges_over_existing_backbone(monkeypatch):
    """Converted modules MERGE over the template backbone: modules the
    pretrain checkpoint has no counterpart for (e.g. Swin's detection-side
    out_norm{0..3}) keep their fresh init instead of vanishing."""
    from s2d_tpu.checkpoint import torch_import as ti

    variables = {"params": {
        "backbone": {"stem_conv1": {"kernel": np.zeros((1,))},
                     "out_norm0": {"scale": np.ones((4,))}},
        "predictor": {"query_feat": np.zeros((2, 2))},
    }}
    monkeypatch.setattr(
        ti, "_convert_resnet_backbone",
        lambda state, consumed: (
            consumed.update(state),
            {"stem_conv1": {"kernel": np.ones((1,))}},
        )[1],
    )
    out = ti.load_backbone_weights({"stem.conv1.weight": np.ones((1,))},
                                   variables)
    assert out["params"]["backbone"]["stem_conv1"]["kernel"][0] == 1.0
    # the module absent from the checkpoint survives with its init
    np.testing.assert_array_equal(
        out["params"]["backbone"]["out_norm0"]["scale"], np.ones((4,))
    )


def test_basic_block_resnets_rejected_clearly(tmp_path):
    """R18/34 basic-block checkpoints get a clear error, not a KeyError."""
    import convert_pretrained_weights as cpw

    from s2d_tpu.checkpoint.torch_import import load_backbone_weights

    rng = np.random.RandomState(0)
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for n in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{n}"] = np.ones(64, np.float32)
    # one basic block: conv1/conv2 only, no conv3
    for ci in (1, 2):
        sd[f"layer1.0.conv{ci}.weight"] = rng.randn(64, 64, 3, 3).astype(np.float32)
        for n in ("weight", "bias", "running_mean", "running_var"):
            sd[f"layer1.0.bn{ci}.{n}"] = np.ones(64, np.float32)
    pth = tmp_path / "r18.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(pth))
    out = tmp_path / "r18.pkl"
    assert cpw.main(["--torchvision", str(pth), "--output", str(out)]) == 0
    with pytest.raises(ValueError, match="bottleneck"):
        load_backbone_weights(str(out), {"params": {"backbone": {}}})
