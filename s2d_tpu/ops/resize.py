"""Bilinear resize with PyTorch `F.interpolate(align_corners=False)` parity.

Used for mask upsampling at inference, attention-mask downsampling inside the
transformer decoder, and FPN top-down fusion — all places the reference calls
`F.interpolate(..., mode="bilinear", align_corners=False)` (e.g.
`/root/reference/model_training/mask2former_video/video_maskformer_model.py:
250-255`, `mask2former/modeling/pixel_decoder/msdeformattn.py:349`).

Torch's bilinear resize uses half-pixel source centres with coordinate
clamping at the borders (edge replication). We implement it as two 1-D
interpolation matmuls, which is both exact and MXU-friendly on TPU (a dense
(out, in) interpolation matrix has at most 2 nonzeros per row, but as a
matmul it runs on the systolic array and fuses well for the sizes involved).
Parity vs torch asserted in ``tests/test_resize.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, torch semantics."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    # half-pixel centres, clamped at 0 (torch clamps negative src coords to 0)
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    w_lo = 1.0 - w_hi
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += w_lo
    mat[np.arange(out_size), hi] += w_hi
    return mat.astype(np.float32)


def interpolate_bilinear(
    x: jnp.ndarray, size: tuple[int, int], precision: str = "highest"
) -> jnp.ndarray:
    """Resize the trailing two dims of `x` (..., H, W) to `size`=(H', W').

    precision: "highest" = exact f32 matmuls (torch-parity at threshold
    boundaries — used in the fp32 pixel-decoder island); "default" = the
    backend's fast path (the reference runs its decoder/inference resizes
    under AMP fp16, so this matches the reference's own numerics there).
    """
    out_h, out_w = size
    *lead, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mat_h = jnp.asarray(_interp_matrix(h, out_h), dtype=x.dtype)
    mat_w = jnp.asarray(_interp_matrix(w, out_w), dtype=x.dtype)
    flat = x.reshape(-1, h, w)
    hp = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    # (B, H, W) -> (B, H', W): contract H with mat_h, then W with mat_w.
    out = jnp.einsum("oh,bhw->bow", mat_h, flat, precision=hp)
    out = jnp.einsum("ow,bhw->bho", mat_w, out, precision=hp)
    return out.reshape(*lead, out_h, out_w)
