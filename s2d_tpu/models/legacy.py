"""Legacy MaskFormer-v1 components: FPN pixel decoders + vanilla
transformer decoder.

Rebuilds of the reference's alternative (pre-Mask2Former) modeling path,
selected by `MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME` and
`MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME` / `TRANSFORMER_IN_FEATURE`
(`/root/reference/model_training/mask2former/modeling/meta_arch/
mask_former_head.py:118-132`):

  * `BasePixelDecoder` (`pixel_decoder/fpn.py:38`): plain FPN — res5 gets a
    3x3 GN+ReLU output conv; each finer level a 1x1 GN lateral + nearest
    upsample-add + 3x3 GN+ReLU output conv; 3x3 `mask_features` conv at the
    finest level. Multi-scale features = the 3 coarsest outputs.
  * `TransformerEncoderPixelDecoder` (`fpn.py:205`): same FPN, but res5 is
    first passed through an input-proj 1x1 conv and a 6-layer standard
    self-attention encoder with 2D sine PE; the encoder output replaces
    res5 in the FPN and is also returned as the transformer feature.
  * `StandardTransformerDecoder`
    (`transformer_decoder/maskformer_transformer_decoder.py:31` +
    `transformer.py`): vanilla DETR decoder — zero-initialized queries +
    learnable query PE, 6 post-norm layers of [self-attn, cross-attn over a
    SINGLE feature level with 2D sine PE, FFN], class head + 3-layer mask
    MLP, masks via einsum with mask_features; deep supervision from the
    per-layer intermediate outputs.

These are functional alternatives for config parity; every S2D run config
uses the MSDeformAttn + masked-attention path (meta_arch.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .position_encoding import position_embedding_sine_2d
from .attention import MultiheadAttention
from .transformer_decoder import FFN, MaskEmbedMLP


class _ConvGN(nn.Module):
    """Conv + GroupNorm(32) (+ optional relu) as in d2's Conv2d(norm=GN)."""

    features: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(x)
        return nn.relu(x) if self.relu else x


class BasePixelDecoder(nn.Module):
    """FPN-only pixel decoder. Input: dict res2..res5 of (BT, h, w, c);
    returns (mask_features (BT, H/4, W/4, mask_dim), ms_feats[res5', res4',
    res3'] at conv_dim channels) — the same interface as
    MSDeformAttnPixelDecoder so the meta-arch can swap them."""

    conv_dim: int = 256
    mask_dim: int = 256

    def fpn_levels(self, features: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        """coarse->fine FPN outputs [res5', res4', res3', res2']."""
        names = ["res5", "res4", "res3", "res2"]
        outs = []
        prev = None
        for i, n in enumerate(names):
            x = features[n]
            if prev is None:
                y = _ConvGN(self.conv_dim, 3, name=f"output{i}")(x)
            else:
                lat = _ConvGN(self.conv_dim, 1, relu=False, name=f"lateral{i}")(x)
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                up = up[:, : lat.shape[1], : lat.shape[2]]
                y = _ConvGN(self.conv_dim, 3, name=f"output{i}")(lat + up)
            outs.append(y)
            prev = y
        return outs

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], deterministic=True):
        outs = self.fpn_levels(features)
        mask_features = nn.Conv(
            self.mask_dim, (3, 3), padding=((1, 1), (1, 1)), name="mask_features"
        )(outs[-1])
        return mask_features, outs[:3]


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nheads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x, pos):
        sa = MultiheadAttention(self.d_model, self.nheads, name="self_attn")(
            x + pos, x + pos, x
        )
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + sa)
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        h = nn.Dense(self.d_model, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class TransformerEncoderPixelDecoder(BasePixelDecoder):
    """BasePixelDecoder with a standard transformer encoder on res5."""

    enc_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], deterministic=True):
        res5 = features["res5"]
        bt, h, w, _ = res5.shape
        x = nn.Conv(self.conv_dim, (1, 1), name="input_proj")(res5)
        pe = position_embedding_sine_2d(h, w, self.conv_dim // 2, x.dtype)
        x = x.reshape(bt, h * w, self.conv_dim)
        pe = jnp.broadcast_to(pe.reshape(1, h * w, self.conv_dim), x.shape)
        for i in range(self.enc_layers):
            x = TransformerEncoderLayer(
                self.conv_dim, self.nheads, self.dim_feedforward,
                name=f"encoder{i}",
            )(x, pe)
        transformer_out = x.reshape(bt, h, w, self.conv_dim)

        feats = dict(features)
        feats["res5"] = transformer_out
        outs = self.fpn_levels(feats)
        mask_features = nn.Conv(
            self.mask_dim, (3, 3), padding=((1, 1), (1, 1)), name="mask_features"
        )(outs[-1])
        # transformer feature first: StandardTransformerDecoder attends to it
        return mask_features, [transformer_out] + outs[1:3]


class StandardTransformerDecoder(nn.Module):
    """MaskFormer-v1 predictor over ONE feature level (no attention
    masking). Same output dict as VideoMaskedTransformerDecoder, T = 1."""

    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6
    mask_dim: int = 256

    @nn.compact
    def __call__(
        self,
        x: Sequence[jnp.ndarray],  # [(B, 1, h, w, C)] — single level used
        mask_features: jnp.ndarray,  # (B, 1, H, W, mask_dim)
    ) -> Dict[str, jnp.ndarray]:
        feat = x[0]
        b, t, h, w, c = feat.shape
        assert t == 1, "MaskFormer-v1 path is image-only"
        q = self.num_queries

        memory = feat.reshape(b, h * w, c)
        pe = position_embedding_sine_2d(h, w, c // 2, feat.dtype)
        pe = jnp.broadcast_to(pe.reshape(1, h * w, c), memory.shape)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (q, self.hidden_dim)
        )
        qpos = jnp.broadcast_to(query_embed[None], (b, q, self.hidden_dim))
        output = jnp.zeros((b, q, self.hidden_dim), feat.dtype)  # tgt = 0 (DETR)

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed_mlp = MaskEmbedMLP(self.hidden_dim, self.mask_dim, name="mask_embed")

        def heads(out):
            normed = decoder_norm(out)
            membed = mask_embed_mlp(normed)
            masks = jnp.einsum("bqc,bthwc->bqthw", membed, mask_features)
            return class_embed(normed), masks

        pred_logits, pred_masks = [], []
        for i in range(self.dec_layers):
            sa = MultiheadAttention(
                self.hidden_dim, self.nheads, name=f"layer{i}_self_attn"
            )(output + qpos, output + qpos, output)
            output = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_self_norm")(output + sa)

            ca = MultiheadAttention(
                self.hidden_dim, self.nheads, name=f"layer{i}_cross_attn"
            )(output + qpos, memory + pe, memory)
            output = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_cross_norm")(output + ca)

            output = FFN(self.hidden_dim, self.dim_feedforward, name=f"layer{i}_ffn")(output)

            out_cls, out_mask = heads(output)
            pred_logits.append(out_cls)
            pred_masks.append(out_mask)

        return {
            "pred_logits": pred_logits[-1],
            "pred_masks": pred_masks[-1],
            "aux_pred_logits": pred_logits[:-1],
            "aux_pred_masks": pred_masks[:-1],
        }
