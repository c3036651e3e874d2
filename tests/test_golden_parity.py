"""Golden cross-implementation parity: torch oracle -> converter -> JAX model.

Random weights in reference checkpoint format are loaded through the
torch->flax converter and the full forward pass is compared between the
independent torch oracle (tests/torch_oracle.py) and the s2d_tpu model.
This covers: ResNet-50 + FrozenBN folding, the deformable-attention pixel
decoder, the 3D-PE masked video transformer decoder, and every weight-layout
transposition in the converter.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2d_tpu.checkpoint.torch_import import (
    convert_reference_network,
    extract_network,
)
from s2d_tpu.models import VideoMaskFormer

from torch_oracle import TorchVideoMaskFormer

HID, QUERIES, HEADS, FF, DEC, ENC = 64, 10, 4, 128, 4, 2


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchVideoMaskFormer(
        num_classes=1, hidden_dim=HID, mask_dim=HID, num_queries=QUERIES,
        nheads=HEADS, dim_ff=FF, dec_layers=DEC, enc_layers=ENC,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    state = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    state = {f"{k}": v for k, v in state.items()}
    return convert_reference_network(
        extract_network(state), dec_layers=DEC, enc_layers=ENC
    )


def test_full_forward_parity(torch_model, jax_params):
    rng = np.random.RandomState(0)
    t = 2
    images = rng.randn(t, 64, 96, 3).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(images).permute(0, 3, 1, 2), num_frames=t)

    model = VideoMaskFormer(
        num_classes=1, hidden_dim=HID, mask_dim=HID, num_queries=QUERIES,
        nheads=HEADS, dim_feedforward=FF, dec_layers=DEC + 1,
        transformer_enc_layers=ENC, compute_dtype=jnp.float32,
    )
    out = model.apply(jax_params, jnp.asarray(images)[None])

    ref_logits = ref["pred_logits"].numpy()
    ref_masks = ref["pred_masks"].numpy()
    got_logits = np.asarray(out["pred_logits"])
    got_masks = np.asarray(out["pred_masks"])

    assert got_logits.shape == ref_logits.shape
    assert got_masks.shape == ref_masks.shape
    np.testing.assert_allclose(got_logits, ref_logits, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(got_masks, ref_masks, rtol=1e-3, atol=2e-3)

    # every aux layer matches too (deep supervision path)
    for i, (rl, rm) in enumerate(zip(ref["aux_pred_logits"], ref["aux_pred_masks"])):
        np.testing.assert_allclose(
            np.asarray(out["aux_pred_logits"][i]), rl.numpy(), rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["aux_pred_masks"][i]), rm.numpy(), rtol=1e-3, atol=2e-3
        )
