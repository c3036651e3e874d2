"""Sine positional embeddings (2D image, 3D video).

Numerics match the reference's cumsum-based formulation with `normalize=True`
and no padding mask (`/root/reference/model_training/mask2former/modeling/
transformer_decoder/position_encoding.py` and `mask2former_video/modeling/
transformer_decoder/position_encoding.py:12-57`): with an all-ones not-mask,
cumsum along an axis of length N is simply arange(1..N), normalized by the
last value + eps then scaled by 2*pi. Channel layout: interleaved
(sin, cos) pairs, y-block then x-block; the video variant adds a
time embedding with its own frequency table over the full channel width.

Computed as plain functions of static shape — no parameters.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_EPS = 1e-6


def _axis_embed(n: int) -> np.ndarray:
    """Normalized cumsum positions for an un-masked axis of length n."""
    pos = np.arange(1, n + 1, dtype=np.float64)
    return pos / (n + _EPS) * (2 * math.pi)


def _freq(num_feats: int) -> np.ndarray:
    dim_t = np.arange(num_feats, dtype=np.float64)
    return 10000.0 ** (2.0 * (dim_t // 2) / num_feats)


def _interleave_sin_cos(x: np.ndarray) -> np.ndarray:
    """x: (..., F) phase values -> (..., F) with sin at even, cos at odd idx."""
    out = np.empty_like(x)
    out[..., 0::2] = np.sin(x[..., 0::2])
    out[..., 1::2] = np.cos(x[..., 1::2])
    return out


def _sine_2d_np(h: int, w: int, num_pos_feats: int) -> np.ndarray:
    y = _axis_embed(h)
    x = _axis_embed(w)
    freq = _freq(num_pos_feats)
    pos_y = _interleave_sin_cos(y[:, None, None] / freq)  # (H, 1, F)
    pos_x = _interleave_sin_cos(x[None, :, None] / freq)  # (1, W, F)
    return np.concatenate(
        [np.broadcast_to(pos_y, (h, w, num_pos_feats)),
         np.broadcast_to(pos_x, (h, w, num_pos_feats))],
        axis=-1,
    )


def position_embedding_sine_2d(h: int, w: int, num_pos_feats: int, dtype=jnp.float32):
    """(H, W, 2*num_pos_feats) sine embedding, channels = [y-block | x-block]."""
    return jnp.asarray(_sine_2d_np(h, w, num_pos_feats), dtype=dtype)


def position_embedding_sine_3d(
    t: int, h: int, w: int, num_pos_feats: int, dtype=jnp.float32,
    frame_valid=None,
):
    """(T, H, W, 2*num_pos_feats) video sine embedding.

    pos = concat(pos_y, pos_x) + pos_z, where pos_z uses a frequency table
    of width 2*num_pos_feats spanning the whole channel axis.

    With `frame_valid` (a traced (T,) bool; False = pad frame), the time
    phase follows the reference's padding-mask semantics
    (not_mask.cumsum normalized by its last value): pad frames do not
    advance the cumsum and the normalizer is the REAL frame count, so the
    embedding on real frames is independent of how much the clip was
    padded (T-bucketed eval)."""
    spatial = _sine_2d_np(h, w, num_pos_feats)
    freq_z = _freq(2 * num_pos_feats)
    if frame_valid is None:
        z = _axis_embed(t)
        pos_z = _interleave_sin_cos(z[:, None] / freq_z)  # (T, 2F)
        pos = spatial[None, :, :, :] + pos_z[:, None, None, :]
        return jnp.asarray(pos, dtype=dtype)

    fv = frame_valid.astype(jnp.float32)
    z = jnp.cumsum(fv) / (fv.sum() + _EPS) * (2 * math.pi)  # (T,)
    phase = z[:, None] / jnp.asarray(freq_z, jnp.float32)
    idx = jnp.arange(phase.shape[-1])
    pos_z = jnp.where(idx % 2 == 0, jnp.sin(phase), jnp.cos(phase))
    pos = jnp.asarray(spatial, jnp.float32)[None] + pos_z[:, None, None, :]
    return pos.astype(dtype)
