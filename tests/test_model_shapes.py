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


def test_frame_valid_pad_parity():
    """T-bucketed eval: zero-padding the clip and masking pad keys yields
    EXACTLY the unpadded outputs on the real frames."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.models.meta_arch import VideoMaskFormer

    model = VideoMaskFormer(
        num_classes=1, hidden_dim=32, mask_dim=32, num_queries=6,
        nheads=4, dim_feedforward=64, dec_layers=3,
        transformer_enc_layers=1,
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out_plain = model.apply(params, x)

    x_pad = jnp.pad(x, ((0, 0), (0, 5), (0, 0), (0, 0), (0, 0)))
    frame_valid = jnp.arange(8) < 3
    out_pad = model.apply(params, x_pad, frame_valid=frame_valid)

    # backbone convs reassociate differently at batch 3 vs 8 (backend
    # matmul batching) — tolerance covers that fp noise; the strict
    # bitwise guarantee is the decoder-level test below
    np.testing.assert_allclose(
        np.asarray(out_pad["pred_logits"]), np.asarray(out_plain["pred_logits"]),
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_pad["pred_masks"][:, :, :3]),
        np.asarray(out_plain["pred_masks"]),
        atol=1e-3, rtol=1e-3,
    )


def test_frame_valid_decoder_exact():
    """Decoder-level: padded frames + frame_valid equal the unpadded
    forward on the real frames to summation-order noise (~1e-7; blocked
    keys contribute exact zeros but lengthen the reduction)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.models.transformer_decoder import VideoMaskedTransformerDecoder

    dec = VideoMaskedTransformerDecoder(
        num_classes=1, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=2, mask_dim=32,
    )
    t, pad = 3, 5
    ms = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (1, t, 8 // 2 ** i, 8 // 2 ** i, 32))
        for i in range(3)
    ]
    mf = jax.random.normal(jax.random.PRNGKey(9), (1, t, 16, 16, 32)) * 10.0
    params = dec.init(jax.random.PRNGKey(0), ms, mf)
    out = dec.apply(params, ms, mf)

    ms_p = [jnp.concatenate([m, jnp.zeros((1, pad, *m.shape[2:]))], axis=1) for m in ms]
    mf_p = jnp.concatenate([mf, jnp.zeros((1, pad, 16, 16, 32))], axis=1)
    out_p = dec.apply(params, ms_p, mf_p,
                      frame_valid=jnp.arange(t + pad) < t)
    np.testing.assert_allclose(
        np.asarray(out_p["pred_logits"]), np.asarray(out["pred_logits"]),
        atol=1e-4, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_p["pred_masks"][:, :, :t]), np.asarray(out["pred_masks"]),
        atol=1e-3, rtol=1e-4,
    )
