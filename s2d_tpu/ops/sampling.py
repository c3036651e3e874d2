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

TPU notes: gathers are expressed as ROW gathers over a channels-last
(N, H*W, C) layout — `take_along_axis` along the second-minor axis with the
channel axis contiguous in lanes. This is the layout XLA TPU lowers to an
efficient row-gather; gathering along the minor (lane) axis instead falls
off a performance cliff (measured ~1000x slower end-to-end on the
deformable-attention workload).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_rows(input_rows: jnp.ndarray, grid: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear sample from a channels-last flattened image.

    Args:
      input_rows: (N, H*W, C) feature rows (row-major HW).
      grid: (N, P, 2) sampling locations, xy in [-1, 1]
        (align_corners=False convention).
      h, w: spatial dims of the flattened image.

    Returns:
      (N, P, C); out-of-bounds reads contribute 0.
    """
    gx = grid[..., 0]
    gy = grid[..., 1]
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

    dtype = input_rows.dtype

    def corner(xc, yc, wx, wy):
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        # row gather: (N, HW, C) indexed along axis 1
        vals = jnp.take_along_axis(
            input_rows, (yi * w + xi)[..., None], axis=1
        )
        weight = (wx * wy * valid.astype(dtype))[..., None]
        return vals * weight

    return (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )


def grid_sample(input: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample `input` at `grid` locations (torch layout).

    Args:
      input: (N, C, H, W) feature map.
      grid: (N, Hg, Wg, 2) sampling locations, xy order, in [-1, 1]
        (align_corners=False convention).

    Returns:
      (N, C, Hg, Wg) sampled features; out-of-bounds reads contribute 0.
    """
    n, c, h, w = input.shape
    gshape = grid.shape[:-1]  # (N, Hg, Wg)
    rows = input.reshape(n, c, h * w).transpose(0, 2, 1)  # (N, HW, C)
    pts = grid.reshape(n, -1, 2)
    out = grid_sample_rows(rows, pts, h, w)  # (N, P, C)
    return out.transpose(0, 2, 1).reshape((n, c) + gshape[1:])


def point_sample(input: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, C, H, W) features at [0, 1]-normalized points (N, P, 2).

    Returns (N, C, P). Matches the reference's `point_sample` wrapper
    (grid_sample on 2*coords-1 with align_corners=False).
    """
    grid = 2.0 * point_coords[:, None, :, :] - 1.0  # (N, 1, P, 2)
    return grid_sample(input, grid)[:, :, 0, :]
