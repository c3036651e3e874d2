"""Shape/smoke tests for the model stack on tiny inputs (CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.config import Config
from s2d_tpu.models import ResNet, VideoMaskFormer, build_model, preprocess_clip


def test_resnet_feature_pyramid():
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["res2"].shape == (1, 16, 24, 256)
    assert feats["res3"].shape == (1, 8, 12, 512)
    assert feats["res4"].shape == (1, 4, 6, 1024)
    assert feats["res5"].shape == (1, 2, 3, 2048)


def test_video_maskformer_tiny_forward():
    model = VideoMaskFormer(
        num_queries=8,
        hidden_dim=32,
        mask_dim=32,
        nheads=4,
        dim_feedforward=64,
        dec_layers=4,
        transformer_enc_layers=2,
    )
    x = jnp.zeros((1, 2, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape == (1, 8, 2)
    assert out["pred_masks"].shape == (1, 8, 2, 16, 24)
    assert len(out["aux_pred_logits"]) == 3  # dec_layers - 1 aux predictions
    assert out["aux_pred_masks"][0].shape == (1, 8, 2, 16, 24)


def test_preprocess_clip_pads():
    frames = jnp.ones((2, 60, 90, 3), jnp.uint8) * 128
    x, (h, w) = preprocess_clip(frames, (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
    assert x.shape == (1, 2, 64, 96, 3)
    assert (h, w) == (60, 90)
    # padding region is exactly zero
    assert float(jnp.abs(x[0, :, 60:, :, :]).max()) == 0.0
    assert float(jnp.abs(x[0, :, :, 90:, :]).max()) == 0.0


def test_build_model_from_config():
    cfg = Config()
    model = build_model(cfg, compute_dtype=jnp.float32)
    assert model.num_queries == 100
    assert model.dec_layers == 10
