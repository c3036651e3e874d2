"""Video multi-scale masked transformer decoder (Mask2Former-video).

TPU-native rebuild of the reference's
`VideoMultiScaleMaskedTransformerDecoder` (`/root/reference/model_training/
mask2former_video/modeling/transformer_decoder/
video_mask2former_transformer_decoder.py:208-480`):

  * learnable query features + query positional embeddings (Q, C), shared
    across frames — the temporal association mechanism
  * dec_layers-1 rounds of [masked cross-attention over one feature level ->
    self-attention among queries -> FFN], cycling the 3 pixel-decoder scales
  * prediction heads after every round (deep supervision): LayerNorm ->
    class linear / 3-layer mask MLP; masks via einsum(query, mask_features)
  * the next round's cross-attention mask is the sigmoid(mask) < 0.5
    binarization of the current prediction resized to the level's resolution,
    with fully-masked query rows unmasked (reference lines 413, 460-465)

All shapes static; the layer loop unrolls at trace time. Batch-first
(B, Q, C) attention; keys are the (T*H_l*W_l) flattened video features.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import interpolate_bilinear
from .attention import MultiheadAttention
from .position_encoding import (
    position_embedding_sine_2d,
    position_embedding_sine_3d,
)


class FFN(nn.Module):
    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        h = nn.Dense(self.d_model, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + h)


class MaskEmbedMLP(nn.Module):
    hidden_dim: int
    mask_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, name="layer0")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="layer1")(x))
        return nn.Dense(self.mask_dim, name="layer2")(x)


class VideoMaskedTransformerDecoder(nn.Module):
    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # cfg DEC_LAYERS - 1 (reference from_config:363)
    mask_dim: int = 256
    num_feature_levels: int = 3
    flash_cross_attention: bool = False  # Pallas flash kernel (eval only)
    pe_3d: bool = True  # False: image decoder (2D sine PE, T must be 1)

    @nn.compact
    def __call__(
        self,
        x: Sequence[jnp.ndarray],  # per-level (B, T, h_l, w_l, C), res5->res3
        mask_features: jnp.ndarray,  # (B, T, H, W, mask_dim), stride 4
        frame_valid: jnp.ndarray | None = None,  # (T,) bool; False = pad frame
    ) -> Dict[str, jnp.ndarray]:
        """frame_valid supports T-bucketed eval: videos are zero-padded to a
        length bucket (bounding recompiles across video lengths) and the pad
        frames' keys are excluded from every cross-attention, so the real
        frames' outputs equal the unpadded forward exactly."""
        assert len(x) == self.num_feature_levels
        b, t = x[0].shape[0], x[0].shape[1]
        q, c = self.num_queries, self.hidden_dim

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (q, c)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (q, c)
        )
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, c)
        )

        srcs, poses, sizes = [], [], []
        for i, feat in enumerate(x):
            _, _, h, w, _ = feat.shape
            sizes.append((h, w))
            src = feat.reshape(b, t * h * w, c) + level_embed[i][None, None, :]
            if self.pe_3d:
                pe = position_embedding_sine_3d(
                    t, h, w, c // 2, feat.dtype, frame_valid=frame_valid
                )
            else:
                assert t == 1, "2D positional encoding requires T == 1"
                pe = position_embedding_sine_2d(h, w, c // 2, feat.dtype)[None]
            poses.append(jnp.broadcast_to(pe.reshape(1, t * h * w, c), src.shape))
            srcs.append(src)

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed_mlp = MaskEmbedMLP(self.hidden_dim, self.mask_dim, name="mask_embed")

        def pad_block(attn_size):
            # (t*h*w,) True where the key belongs to a pad frame
            if frame_valid is None:
                return None
            hl, wl = attn_size
            return jnp.repeat(~frame_valid, hl * wl)

        def prediction_heads(output, attn_size):
            normed = decoder_norm(output)  # (B, Q, C)
            out_cls = class_embed(normed)
            membed = mask_embed_mlp(normed)
            out_mask = jnp.einsum("bqc,bthwc->bqthw", membed, mask_features)
            # next-level attention mask (reference resizes under AMP fp16;
            # default precision matches that, highest would be stricter)
            small = interpolate_bilinear(out_mask, attn_size, precision="default")
            blocked = jax.nn.sigmoid(small).reshape(b, q, -1) < 0.5
            pad = pad_block(attn_size)
            if pad is not None:
                blocked = blocked | pad[None, None, :]
            # a fully-blocked query row attends everywhere (reference line
            # 413) — everywhere REAL: pad keys stay blocked
            all_blocked = blocked.all(axis=-1, keepdims=True)
            blocked = blocked & ~all_blocked
            if pad is not None:
                blocked = blocked | pad[None, None, :]
            return out_cls, out_mask, jax.lax.stop_gradient(blocked)

        output = jnp.broadcast_to(query_feat[None], (b, q, c)).astype(mask_features.dtype)
        qpos = jnp.broadcast_to(query_embed[None], (b, q, c)).astype(mask_features.dtype)

        pred_logits, pred_masks = [], []
        out_cls, out_mask, attn_mask = prediction_heads(output, sizes[0])
        pred_logits.append(out_cls)
        pred_masks.append(out_mask)

        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            # cross-attention first (Mask2Former ordering)
            ca = MultiheadAttention(
                c, self.nheads, use_flash=self.flash_cross_attention,
                name=f"layer{i}_cross_attn",
            )(
                output + qpos,
                srcs[li] + poses[li],
                srcs[li],
                attn_mask=attn_mask[:, None, :, :],
            )
            output = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_cross_norm")(output + ca)

            sa = MultiheadAttention(c, self.nheads, name=f"layer{i}_self_attn")(
                output + qpos, output + qpos, output
            )
            output = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_self_norm")(output + sa)

            output = FFN(c, self.dim_feedforward, name=f"layer{i}_ffn")(output)

            out_cls, out_mask, attn_mask = prediction_heads(
                output, sizes[(i + 1) % self.num_feature_levels]
            )
            pred_logits.append(out_cls)
            pred_masks.append(out_mask)

        return {
            "pred_logits": pred_logits[-1],
            "pred_masks": pred_masks[-1],
            "aux_pred_logits": pred_logits[:-1],
            "aux_pred_masks": pred_masks[:-1],
        }
