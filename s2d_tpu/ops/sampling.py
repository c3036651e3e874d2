"""Bilinear grid sampling with PyTorch `F.grid_sample` semantics.

These are the numerical primitives under multi-scale deformable attention and
the point-sampled mask losses. Semantics match ``torch.nn.functional.
grid_sample(mode="bilinear", padding_mode="zeros", align_corners=False)``:
grid coords live in [-1, 1], pixel centres at half-integers, out-of-bounds
corners contribute zero. Parity is asserted against torch in
``tests/test_sampling.py``.

Reference behavior being reproduced (not ported): the reference uses
grid_sample inside its deformable-attention fallback
(`/root/reference/model_training/mask2former/modeling/pixel_decoder/ops/
functions/ms_deform_attn_func.py:52-72`) and its PointRend-style point
sampling (`mask2former_video/modeling/point_features.py:19-42`).

TPU notes: the gather is expressed as one flat `take_along_axis` over the
collapsed H*W axis so XLA lowers it to a single dynamic-gather; everything
else is VPU elementwise work that fuses around it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels from a flattened image.

    img_flat: (N, C, H*W), idx: (N, P) int32 -> (N, C, P)
    """
    n, c, _ = img_flat.shape
    idx = jnp.broadcast_to(idx[:, None, :], (n, c, idx.shape[-1]))
    return jnp.take_along_axis(img_flat, idx, axis=2)


def grid_sample(input: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample `input` at `grid` locations.

    Args:
      input: (N, C, H, W) feature map.
      grid: (N, Hg, Wg, 2) sampling locations, xy order, in [-1, 1]
        (align_corners=False convention).

    Returns:
      (N, C, Hg, Wg) sampled features; out-of-bounds reads contribute 0.
    """
    n, c, h, w = input.shape
    gshape = grid.shape[:-1]  # (N, Hg, Wg)
    gx = grid[..., 0].reshape(n, -1)
    gy = grid[..., 1].reshape(n, -1)

    # align_corners=False unnormalization: pixel centres at half-integers.
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def corner(xc, yc, wx, wy):
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = _gather_hw(input.reshape(n, c, h * w), yi * w + xi)
        weight = (wx * wy * valid.astype(input.dtype))[:, None, :]
        return vals * weight

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out.reshape((n, c) + gshape[1:])


def point_sample(input: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, C, H, W) features at [0, 1]-normalized points (N, P, 2).

    Returns (N, C, P). Matches the reference's `point_sample` wrapper
    (grid_sample on 2*coords-1 with align_corners=False).
    """
    grid = 2.0 * point_coords[:, None, :, :] - 1.0  # (N, 1, P, 2)
    return grid_sample(input, grid)[:, :, 0, :]
