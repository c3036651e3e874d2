"""Multi-head attention with torch `nn.MultiheadAttention` weight layout.

The video transformer decoder's self/cross attention layers use torch
MultiheadAttention (`/root/reference/model_training/mask2former_video/
modeling/transformer_decoder/video_mask2former_transformer_decoder.py:23,81`).
To load reference checkpoints 1:1 we keep the packed in-projection layout:
one (3C, C) `in_proj` weight (q|k|v stacked) + out projection.

Batch-first convention here: (B, L, C). Boolean masks follow torch: True =
position is NOT allowed to attend.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    use_flash: bool = False  # stream keys through the Pallas flash kernel
    # (forward-only: eval path; training uses the XLA einsum path)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, C)
        key: jnp.ndarray,  # (B, Lk, C)
        value: jnp.ndarray,  # (B, Lk, C)
        attn_mask: Optional[jnp.ndarray] = None,  # (B, H, Lq, Lk) bool, True=block
    ) -> jnp.ndarray:
        c, h = self.embed_dim, self.num_heads
        d = c // h
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        out_w = self.param(
            "out_proj_weight", nn.initializers.xavier_uniform(), (c, c)
        )
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (c,))

        q = query @ in_proj_w[:c].T + in_proj_b[:c]
        k = key @ in_proj_w[c : 2 * c].T + in_proj_b[c : 2 * c]
        v = value @ in_proj_w[2 * c :].T + in_proj_b[2 * c :]

        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, d).transpose(0, 2, 1, 3)

        if self.use_flash and attn_mask is not None:
            from ..ops.masked_attention_pallas import masked_cross_attention_flash

            blocked = jnp.broadcast_to(attn_mask, (b, h, lq, lk))
            out = masked_cross_attention_flash(
                q.reshape(b * h, lq, d),
                k.reshape(b * h, lk, d),
                v.reshape(b * h, lk, d),
                blocked.reshape(b * h, lq, lk),
            )
            out = out.reshape(b, h, lq, d).transpose(0, 2, 1, 3).reshape(b, lq, c)
            return out @ out_w.T + out_b

        # torch scales q by d**-0.5 before the matmul
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k)
        if attn_mask is not None:
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(attn_mask, neg, logits)
        probs = jnp.asarray(
            nn.softmax(logits.astype(jnp.float32), axis=-1), logits.dtype
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
        return out @ out_w.T + out_b
