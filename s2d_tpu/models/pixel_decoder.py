"""MSDeformAttn pixel decoder — deformable-DETR encoder + FPN fusion.

TPU-native rebuild of the reference's `MSDeformAttnPixelDecoder`
(`/root/reference/model_training/mask2former/modeling/pixel_decoder/
msdeformattn.py:164-358`):

  * 1x1 conv + GroupNorm(32) input projections on res5/res4/res3
    (top-down order, level 0 = res5)
  * 6 encoder layers: multi-scale deformable self-attention (the Pallas/XLA
    op in ops/ms_deform_attn.py — the reference's CUDA extension) + FFN(1024)
  * per-level reference points at normalized pixel centres (no padding mask:
    the reference always passes all-valid masks, msdeformattn.py:62)
  * FPN top-down fusion with res2 (bilinear upsample + 3x3 GN conv), then a
    1x1 `mask_features` projection.

Runs in float32 regardless of the surrounding compute dtype, mirroring the
reference's `@autocast(enabled=False)` island (msdeformattn.py:314).

Shapes are static: spatial dims come from the traced feature shapes, so the
per-level loop unrolls at trace time.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import ms_deform_attn
from ..ops.resize import interpolate_bilinear
from .position_encoding import position_embedding_sine_2d


def msda_offset_init_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional init of sampling offsets: head h points along angle
    2*pi*h/H, magnitude growing with point index (deformable-DETR init)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttnModule(nn.Module):
    """Projection wrapper around the deformable-attention core op."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, S, C) = src + pos
        reference_points: jnp.ndarray,  # (S, L, 2) in [0, 1]
        value_src: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        b, s, c = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points

        value = nn.Dense(c, name="value_proj")(value_src)
        value = value.reshape(b, s, m, c // m)

        offsets = nn.Dense(
            m * l * p * 2,
            name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                msda_offset_init_bias(m, l, p), dtype
            ),
        )(query).reshape(b, s, m, l, p, 2)
        attn = nn.Dense(
            m * l * p,
            name="attention_weights",
            kernel_init=nn.initializers.zeros,
        )(query).reshape(b, s, m, l * p)
        attn = nn.softmax(attn, axis=-1).reshape(b, s, m, l, p)

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype
        )  # (L, 2) xy
        locations = (
            reference_points[None, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(value, spatial_shapes, locations, attn, impl=self.impl)
        return nn.Dense(c, name="output_proj")(out)


class MSDeformAttnEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.0
    impl: str = "xla"
    # static per-instance so the remat-wrapped __call__ takes arrays only
    spatial_shapes: Tuple[Tuple[int, int], ...] = ()
    deterministic: bool = True

    @nn.compact
    def __call__(self, src, pos, reference_points):
        spatial_shapes = self.spatial_shapes
        deterministic = self.deterministic
        attn_out = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.impl, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn_out)

        ffn = nn.Dense(self.d_ffn, name="linear1")(src)
        ffn = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(ffn))
        ffn = nn.Dense(self.d_model, name="linear2")(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=deterministic)(ffn)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + ffn)


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """(S, L, 2) normalized pixel-centre reference points (all-valid masks)."""
    refs = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float64) + 0.5) / h
        xs = (np.arange(w, dtype=np.float64) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], axis=-1))
    pts = np.concatenate(refs, axis=0).astype(np.float32)  # (S, 2)
    return jnp.asarray(np.broadcast_to(pts[:, None, :], (pts.shape[0], len(spatial_shapes), 2)))


class MSDeformAttnPixelDecoder(nn.Module):
    """features dict (NHWC) -> (mask_features, multi_scale_features).

    multi_scale_features: [res5', res4', res3'] at conv_dim channels (the
    order the video decoder cycles through); mask_features: stride-4 map at
    mask_dim channels.
    """

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 6
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    n_points: int = 4
    common_stride: int = 4
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    dropout: float = 0.0
    msda_impl: str = "xla"
    remat: bool = False  # jax.checkpoint each encoder layer (training memory)

    @nn.compact
    def __call__(
        self, features: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        compute_dtype = jnp.float32  # fp32 island as in the reference
        # top-down order: res5, res4, res3 (level 0 = res5)
        names_td = sorted(self.transformer_in_features, reverse=True)
        srcs, pos_embeds, spatial_shapes = [], [], []
        for idx, name in enumerate(names_td):
            x = features[name].astype(compute_dtype)
            b, h, w, _ = x.shape
            proj = nn.Conv(self.conv_dim, (1, 1), name=f"input_proj{idx}_conv")(x)
            proj = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj{idx}_gn")(proj)
            srcs.append(proj.reshape(b, h * w, self.conv_dim))
            pe = position_embedding_sine_2d(h, w, self.conv_dim // 2, compute_dtype)
            pos_embeds.append(jnp.broadcast_to(pe.reshape(1, h * w, -1), srcs[-1].shape))
            spatial_shapes.append((h, w))

        level_embed = self.param(
            "level_embed",
            nn.initializers.normal(stddev=1.0),
            (len(names_td), self.conv_dim),
        )
        src_flat = jnp.concatenate(srcs, axis=1)
        pos_flat = jnp.concatenate(
            [p + level_embed[i][None, None, :] for i, p in enumerate(pos_embeds)],
            axis=1,
        )
        ref_points = encoder_reference_points(spatial_shapes)

        layer_cls = (
            nn.remat(MSDeformAttnEncoderLayer) if self.remat
            else MSDeformAttnEncoderLayer
        )
        out_seq = src_flat
        for i in range(self.transformer_enc_layers):
            out_seq = layer_cls(
                d_model=self.conv_dim,
                d_ffn=self.transformer_dim_feedforward,
                n_levels=len(names_td),
                n_heads=self.transformer_nheads,
                n_points=self.n_points,
                dropout=self.dropout,
                impl=self.msda_impl,
                spatial_shapes=tuple(spatial_shapes),
                deterministic=deterministic,
                name=f"encoder_layer{i}",
            )(out_seq, pos_flat, ref_points)

        # split back into per-level NHWC maps
        outs = []
        start = 0
        for (h, w) in spatial_shapes:
            outs.append(out_seq[:, start : start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # FPN top-down fusion: res2 lateral + upsampled out[-1]
        x2 = features["res2"].astype(compute_dtype)
        lateral = nn.Conv(self.conv_dim, (1, 1), use_bias=False, name="adapter1_conv")(x2)
        lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="adapter1_gn")(lateral)
        up = interpolate_bilinear(
            outs[-1].transpose(0, 3, 1, 2), x2.shape[1:3]
        ).transpose(0, 2, 3, 1)
        fused = lateral + up
        fused = nn.Conv(
            self.conv_dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            name="layer1_conv",
        )(fused)
        fused = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, name="layer1_gn")(fused))

        mask_features = nn.Conv(self.mask_dim, (1, 1), name="mask_features")(fused)
        return mask_features, outs
