"""Config loading: reference YAML files load unchanged, opts override works."""
import dataclasses
import os
import textwrap
import warnings

import pytest

from s2d_tpu.config import Config, load_config

REF_CFG_DIR = "/root/reference/model_training/configs/imagenet_video"


def test_defaults():
    cfg = Config()
    assert cfg.model.mask_former.num_object_queries == 100
    assert cfg.model.mask_former.dec_layers == 10
    assert cfg.model.sem_seg_head.num_classes == 1


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR), reason="reference absent")
def test_load_reference_inference_config():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg = load_config(
            os.path.join(
                REF_CFG_DIR, "s2d_inference_kd_video_mask2former_R50_cls_agnostic.yaml"
            )
        )
    assert cfg.model.meta_architecture == "KDVideoMaskFormer"
    assert cfg.model.mask_former.test.num_predictions == 50
    assert cfg.model.mask_former.test.nms_thresh == 0.75
    assert cfg.model.mask_former.test.object_mask_threshold == 0.8
    assert cfg.input.min_size_test == 360
    assert cfg.input.max_size_test == 1333
    assert cfg.model.resnets.stride_in_1x1 is False
    # from the _BASE_ file
    assert cfg.model.pixel_mean == (123.675, 116.280, 103.530)
    assert cfg.datasets.test == ("ytvis_2021_valid",)
    assert cfg.solver.clip_gradients.clip_value == 0.01


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            MODEL:
              MASK_FORMER:
                NUM_OBJECT_QUERIES: 64
                NHEADS: 4
            """
        )
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            """
            _BASE_: base.yaml
            MODEL:
              MASK_FORMER:
                NHEADS: 2
            """
        )
    )
    cfg = load_config(str(child))
    assert cfg.model.mask_former.num_object_queries == 64
    assert cfg.model.mask_former.nheads == 2


def test_opts_override():
    cfg = load_config(
        None,
        opts=[
            "MODEL.MASK_FORMER.TEST.NUM_PREDICTIONS",
            "10",
            "DATASETS.TEST",
            "('ytvis_2021_valid',)",
            "SOLVER.BASE_LR",
            "0.5",
        ],
    )
    assert cfg.model.mask_former.test.num_predictions == 10
    assert cfg.datasets.test == ("ytvis_2021_valid",)
    assert cfg.solver.base_lr == 0.5
    # untouched siblings retain defaults
    assert cfg.model.mask_former.nheads == 8


def test_opts_unknown_key_raises():
    with pytest.raises(KeyError):
        load_config(None, opts=["MODEL.NOT_A_KEY", "1"])


def test_config_is_immutable():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.output_dir = "x"  # type: ignore[misc]


def test_reference_yaml_configs_load_unchanged():
    """Every reference video config loads through our yacs-compatible
    loader (unknown d2 plumbing keys warn + ignore) — the 'reference YAML
    configs load unchanged' contract (README)."""
    import glob
    import warnings

    ref = "/root/reference/model_training/configs/imagenet_video"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    files = sorted(glob.glob(os.path.join(ref, "*.yaml")))
    assert len(files) >= 5
    for f in files:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # unknown-key notices
            cfg = load_config(f)
        assert cfg.model.mask_former.num_object_queries > 0
