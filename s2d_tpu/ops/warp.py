"""Affine mask warping (transform replay for disentangled distillation).

TPU equivalent of the reference's `apply_transformation_frame_by_frame`
(`/root/reference/model_training/mask2former_video/data_video/
dataset_mapper.py:480-537`): teacher masks predicted in the PRIMARY view are
resampled into the DISTILL view's geometry using the per-frame affine the
mapper recorded. Bilinear sample + 0.5 binarization, zero padding outside.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sampling import grid_sample


def warp_masks_affine(
    masks: jnp.ndarray,  # (B, N, T, H, W) float/bool, primary view
    affine: jnp.ndarray,  # (B, T, 3, 3): primary px -> distill px
    binarize: bool = True,
) -> jnp.ndarray:
    """Resample masks into the distill view (same canvas size)."""
    b, n, t, h, w = masks.shape
    inv = jnp.linalg.inv(affine.astype(jnp.float32))  # distill px -> primary px

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=0).reshape(3, h * w)  # (3, HW)

    src = jnp.einsum("btij,jp->btip", inv, pts)  # (B, T, 3, HW)
    sx = src[:, :, 0] / jnp.maximum(src[:, :, 2], 1e-8)
    sy = src[:, :, 1] / jnp.maximum(src[:, :, 2], 1e-8)
    # pixel centres at integers -> align_corners=False normalized coords
    gx = (sx + 0.5) / w * 2.0 - 1.0
    gy = (sy + 0.5) / h * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(b * t, h, w, 2)

    # (B, N, T, H, W) -> (B*T, N, H, W) as channels
    chans = masks.astype(jnp.float32).transpose(0, 2, 1, 3, 4).reshape(b * t, n, h, w)
    warped = grid_sample(chans, grid)  # (B*T, N, H, W)
    warped = warped.reshape(b, t, n, h, w).transpose(0, 2, 1, 3, 4)
    return warped > 0.5 if binarize else warped
