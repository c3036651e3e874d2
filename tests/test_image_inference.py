"""Image inference heads + 2D-PE image decoder variant."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.evaluation.image_inference import (
    instance_inference,
    panoptic_inference,
    semantic_inference,
)
from s2d_tpu.models import VideoMaskFormer


def test_semantic_inference():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))  # 3 classes + bg
    masks = jnp.asarray(rng.randn(6, 8, 8).astype(np.float32))
    out = semantic_inference(logits, masks)
    assert out.shape == (3, 8, 8)
    assert float(out.min()) >= 0.0


def test_instance_inference_rescoring():
    q, k = 5, 2
    logits = jnp.zeros((q, k + 1))
    logits = logits.at[0, 0].set(5.0)  # confident query 0 class 0
    masks = jnp.full((q, 8, 8), -5.0)
    masks = masks.at[0, :4].set(5.0)  # strong mask on the top half
    out = instance_inference(logits, masks, num_classes=k, topk=4)
    assert out["masks"].shape == (4, 8, 8)
    best = int(jnp.argmax(out["scores"]))
    assert int(out["labels"][best]) == 0
    assert bool(out["masks"][best, 0, 0])
    assert not bool(out["masks"][best, 7, 7])


def test_panoptic_inference():
    q, k = 4, 3
    logits = jnp.full((q, k + 1), -5.0)
    logits = logits.at[0, 0].set(5.0)  # query 0 -> class 0, confident
    logits = logits.at[1, 1].set(5.0)  # query 1 -> class 1, confident
    logits = logits.at[2:, k].set(5.0)  # others: no-object
    masks = jnp.full((q, 8, 8), -8.0)
    masks = masks.at[0, :, :4].set(8.0)  # left half
    masks = masks.at[1, :, 4:].set(8.0)  # right half
    seg, info = panoptic_inference(logits, masks, object_mask_threshold=0.5)
    seg = np.asarray(seg)
    assert set(np.unique(seg)) <= {0, 1, 2}
    assert (seg[:, :4] == 1).all()
    assert (seg[:, 4:] == 2).all()
    assert bool(info["valid"][0]) and bool(info["valid"][1])
    assert not bool(info["valid"][2])


def test_image_decoder_2d_pe():
    model = VideoMaskFormer(
        num_queries=4, hidden_dim=32, mask_dim=32, nheads=4,
        dim_feedforward=64, dec_layers=2, transformer_enc_layers=1,
        compute_dtype=jnp.float32,
    )
    # pe_3d=False path through the predictor directly
    from s2d_tpu.models.transformer_decoder import VideoMaskedTransformerDecoder

    dec = VideoMaskedTransformerDecoder(
        num_classes=1, hidden_dim=32, num_queries=4, nheads=4,
        dim_feedforward=64, dec_layers=2, mask_dim=32, pe_3d=False,
    )
    x = [jnp.zeros((1, 1, 2 * s, 3 * s, 32)) for s in (1, 2, 4)]
    mf = jnp.zeros((1, 1, 16, 24, 32))
    params = dec.init(jax.random.PRNGKey(0), x, mf)
    out = dec.apply(params, x, mf)
    assert out["pred_masks"].shape == (1, 4, 1, 16, 24)
