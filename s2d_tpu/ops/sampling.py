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


def _corner_terms(grid: jnp.ndarray, h: int, w: int):
    """Shared bilinear-corner computation: yields (flat_idx, weight) per
    corner, with out-of-bounds corners carrying weight 0."""
    gx = grid[..., 0]
    gy = grid[..., 1]
    # align_corners=False unnormalization: pixel centres at half-integers.
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0
    corners = []
    for xc, yc, wx, wy in (
        (x0, y0, 1.0 - wx1, 1.0 - wy1),
        (x0 + 1.0, y0, wx1, 1.0 - wy1),
        (x0, y0 + 1.0, 1.0 - wx1, wy1),
        (x0 + 1.0, y0 + 1.0, wx1, wy1),
    ):
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        corners.append((yi * w + xi, wx * wy * valid))
    return corners


def pack_2x2(rows: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(N, H*W, C) -> (N, H*W, 4C): row (y, x) carries the 2x2 patch
    [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] (zero past the border), so one
    row fetch supplies all four bilinear corners."""
    n, hw, c = rows.shape
    v = rows.reshape(n, h, w, c)
    z_col = jnp.zeros((n, h, 1, c), rows.dtype)
    z_row = jnp.zeros((n, 1, w, c), rows.dtype)
    right = jnp.concatenate([v[:, :, 1:], z_col], axis=2)
    down = jnp.concatenate([v[:, 1:], z_row], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], z_col], axis=2)
    packed = jnp.concatenate([v, right, down, downright], axis=-1)
    return packed.reshape(n, hw, 4 * c)


def _packed_terms(grid: jnp.ndarray, h: int, w: int):
    """Base row index (clamped 2x2 anchor) + per-block weights.

    Block pixel (anchor+dx, anchor+dy) receives the ORIGINAL bilinear
    corner weight of whichever corner lands on that pixel (zero if none) —
    this keeps torch's zero-padding semantics exactly even when the anchor
    is clamped at the border."""
    gx = grid[..., 0]
    gy = grid[..., 1]
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0

    def axis_weights(c0, frac, size, anchor):
        # weight of original corner c at pixel p: w(c) if p == c else 0
        w0 = (1.0 - frac) * ((c0 >= 0) & (c0 <= size - 1))
        w1 = frac * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
        at0 = jnp.where(anchor == c0, w0, 0.0) + jnp.where(anchor == c0 + 1, w1, 0.0)
        at1 = jnp.where(anchor + 1 == c0, w0, 0.0) + jnp.where(
            anchor + 1 == c0 + 1, w1, 0.0
        )
        return at0, at1

    xb = jnp.clip(x0, 0, max(w - 2, 0))
    yb = jnp.clip(y0, 0, max(h - 2, 0))
    wx_at0, wx_at1 = axis_weights(x0, wx1, w, xb)
    wy_at0, wy_at1 = axis_weights(y0, wy1, h, yb)
    weights = jnp.stack(
        [wx_at0 * wy_at0, wx_at1 * wy_at0, wx_at0 * wy_at1, wx_at1 * wy_at1],
        axis=-1,
    )  # (N, P, 4) ordered like pack_2x2's blocks
    idx = (yb * w + xb).astype(jnp.int32)
    return idx, weights


def grid_sample_packed(
    packed_rows: jnp.ndarray,  # (N, H*W, 4C) from pack_2x2
    grid: jnp.ndarray,  # (N, P, 2) in [-1, 1]
    h: int,
    w: int,
    onehot: bool = True,
) -> jnp.ndarray:
    """Bilinear sampling with ONE row fetch per point (4x fewer gathers
    than the corner formulation; the TPU gather unit is issue-rate bound)."""
    n, hw, c4 = packed_rows.shape
    c = c4 // 4
    idx, weights = _packed_terms(grid, h, w)
    if onehot:
        sparse = jax.nn.one_hot(idx, hw, dtype=packed_rows.dtype)
        fetched = jnp.einsum("nph,nhc->npc", sparse, packed_rows)
    else:
        fetched = jnp.take_along_axis(packed_rows, idx[..., None], axis=1)
    p = grid.shape[1]
    fetched = fetched.reshape(n, p, 4, c)
    return (fetched * weights[..., None].astype(packed_rows.dtype)).sum(axis=2)


def grid_sample_rows(
    input_rows: jnp.ndarray,
    grid: jnp.ndarray,
    h: int,
    w: int,
    impl: str = "auto",
) -> jnp.ndarray:
    """Bilinear sample from a channels-last flattened image.

    Args:
      input_rows: (N, H*W, C) feature rows (row-major HW).
      grid: (N, P, 2) sampling locations, xy in [-1, 1]
        (align_corners=False convention).
      h, w: spatial dims of the flattened image.
      impl: "gather" (row take_along_axis), "onehot" (weighted sparse
        interpolation matrix contracted in ONE einsum — measured 4.3x
        faster than the gather unit on TPU v5e, where XLA rewrites the
        one-hot contraction instead of running it dense), or "auto"
        (onehot on TPU when H*W is modest, else gather).

    Returns:
      (N, P, C); out-of-bounds reads contribute 0.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # cutoff measured on v5e: at H*W=14400 (N=64, P=75K, D=32) onehot
        # runs 144 ms vs 770 ms gather (5.3x) — large-eval inputs whose res3
        # level exceeds 8192 rows stay on the fast path
        impl = "onehot" if (on_tpu and h * w <= 16384) else "gather"

    dtype = input_rows.dtype
    corners = _corner_terms(grid, h, w)

    if impl == "onehot":
        sparse = None
        for idx, weight in corners:
            term = jax.nn.one_hot(idx, h * w, dtype=dtype) * weight[..., None].astype(dtype)
            sparse = term if sparse is None else sparse + term
        return jnp.einsum("nph,nhc->npc", sparse, input_rows)

    out = None
    for idx, weight in corners:
        vals = jnp.take_along_axis(input_rows, idx[..., None], axis=1)
        term = vals * weight[..., None].astype(dtype)
        out = term if out is None else out + term
    return out


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
