"""Swin Transformer backbone (d2-weight-compatible), NHWC.

Rebuild of the reference's `D2SwinTransformer` wrapper + standard Swin
(`/root/reference/model_training/mask2former/modeling/backbone/swin.py`):

  * 4x4 patch embedding + LayerNorm
  * stages of [LN -> (shifted-)window MSA with relative position bias ->
    residual -> LN -> 4x MLP -> residual], window 7, shift w//2 on odd
    blocks, PatchMerging (2x2 concat -> LN -> linear 4C->2C) between stages
  * per-output LayerNorms (norm0..norm3), outputs res2..res5

Window attention reshapes are all static; the shifted-window attention mask
is a trace-time constant per (H, W). Feature maps are padded up to window
multiples inside each stage and cropped after, as the torch original does.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(window: int) -> np.ndarray:
    """(W*W, W*W) indices into the (2W-1)^2 relative-position bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, W^2, W^2) bool mask, True = blocked (cross-region)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // window, window, w // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return wins[:, :, None] != wins[:, None, :]


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        # x: (num_windows*B, W^2, C); mask: (num_windows, W^2, W^2) bool
        bnw, n, c = x.shape
        h = self.num_heads
        d = c // h
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _rel_pos_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(bnw, n, 3, h, d)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n)
            attn = jnp.where(mask[None, :, None], -1e9, attn)
            attn = attn.reshape(bnw, h, n, n)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_h = -h % win
        pad_w = -w % win
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        shift = self.shift if min(hp, wp) > win else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, win, shift))
        else:
            mask = None

        x = x.reshape(b, hp // win, win, wp // win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        x = WindowAttention(self.dim, win, self.num_heads, name="attn")(x, mask)
        x = x.reshape(b, hp // win, wp // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)

        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.Dense(c, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = x.shape[1:3]
        # torch order: x0=(0::2,0::2) x1=(1::2,0::2) x2=(0::2,1::2) x3=(1::2,1::2)
        merged = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        merged = nn.LayerNorm(epsilon=1e-5, name="norm")(merged)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(merged)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4), name="patch_embed_proj"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        features: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[si],
                    window=self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    name=f"stage{si}_block{bi}",
                )(x)
            name = f"res{si + 2}"
            if name in self.out_features:
                features[name] = nn.LayerNorm(
                    epsilon=1e-5, name=f"out_norm{si}"
                )(x)
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"downsample{si}")(x)
                dim *= 2
        return features


SWIN_FEATURE_CHANNELS = {
    "tiny": {"res2": 96, "res3": 192, "res4": 384, "res5": 768},
}
