"""Legacy MaskFormer-v1 path (FPN pixel decoders, StandardTransformerDecoder)
and semantic TTA."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.models.meta_arch import VideoMaskFormer


def _tiny(**kw):
    return VideoMaskFormer(
        num_classes=2, hidden_dim=32, mask_dim=32, num_queries=5,
        nheads=4, dim_feedforward=64, dec_layers=3,
        transformer_enc_layers=2, backbone_depth=50, **kw
    )


@pytest.mark.parametrize("pd", ["fpn", "transformer_encoder"])
def test_fpn_pixel_decoders_forward(pd):
    model = _tiny(pixel_decoder_type=pd)
    x = jnp.zeros((1, 1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out["pred_logits"].shape == (1, 5, 3)
    assert out["pred_masks"].shape == (1, 5, 1, 16, 16)  # stride 4
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_maskformer_v1_decoder_forward():
    model = _tiny(
        pixel_decoder_type="transformer_encoder", decoder_type="maskformer_v1"
    )
    x = jnp.zeros((1, 1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out["pred_logits"].shape == (1, 5, 3)
    assert out["pred_masks"].shape == (1, 5, 1, 16, 16)
    # deep supervision from the intermediate layers (dec_layers-1 = 2 -> 1 aux)
    assert len(out["aux_pred_logits"]) == 1


def test_build_model_dispatch():
    from s2d_tpu.config import load_config
    from s2d_tpu.models import build_model

    cfg = load_config(None, [
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "TransformerEncoderPixelDecoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME", "StandardTransformerDecoder",
    ])
    model = build_model(cfg)
    assert model.pixel_decoder_type == "transformer_encoder"
    assert model.decoder_type == "maskformer_v1"
    default = build_model(load_config(None, []))
    assert default.pixel_decoder_type == "msdeformattn"
    assert default.decoder_type == "mask2former"


def test_tta_semantic_flip_symmetry():
    """An apply_fn that always marks the LEFT half of its view produces a
    left/right-symmetric average under flip TTA (the flipped view's mask is
    warped back to the right half)."""
    from s2d_tpu.evaluation.tta import tta_semantic_inference

    q, k = 3, 2

    def apply_fn(clip):
        _, _, h, w, _ = clip.shape
        logits = jnp.full((q, k + 1), -4.0).at[:, 0].set(4.0)
        masks = jnp.full((q, h // 4, w // 4), -6.0)
        masks = masks.at[:, :, : w // 8].set(6.0)  # left half on
        return logits, masks

    img = jnp.zeros((32, 48, 3))
    probs = np.asarray(
        tta_semantic_inference(apply_fn, img, scales=(1.0,), flip=True)
    )
    assert probs.shape == (k, 32, 48)
    np.testing.assert_allclose(probs, probs[:, :, ::-1], atol=1e-5)
    # without flip the mass stays on the left
    probs_noflip = np.asarray(
        tta_semantic_inference(apply_fn, img, scales=(1.0,), flip=False)
    )
    assert probs_noflip[0, :, :10].mean() > probs_noflip[0, :, -10:].mean()
