"""ROIAlign via batched bilinear row-gathers (TPU-native).

Equivalent of detectron2/torchvision ROIAlign (aligned=True semantics) used
by the reference CutLER's ROI heads: each output cell averages
`sampling_ratio^2` bilinear samples of the feature map inside the box cell.
Built on the same row-gather/one-hot sampling primitive as deformable
attention (ops/sampling.py), so it inherits the fast TPU path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .sampling import grid_sample_rows


def roi_align(
    features: jnp.ndarray,  # (H, W, C) single level, channels-last
    boxes: jnp.ndarray,  # (R, 4) xyxy in feature-map pixel coords
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Returns (R, output_size, output_size, C)."""
    h, w, c = features.shape
    r = boxes.shape[0]
    s = sampling_ratio
    n_pts = output_size * s

    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    bw = jnp.maximum(x1 - x0, 1e-6)
    bh = jnp.maximum(y1 - y0, 1e-6)

    # aligned=True: sample points at fractional cell centres, offset -0.5
    steps = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts
    xs = x0[:, None] + steps[None, :] * bw[:, None]  # (R, n)
    ys = y0[:, None] + steps[None, :] * bh[:, None]

    gx = (xs * 2.0 + 1.0) / w - 1.0  # pixel coord -> align_corners=False grid
    gy = (ys * 2.0 + 1.0) / h - 1.0
    grid = jnp.stack(
        [
            jnp.broadcast_to(gx[:, None, :], (r, n_pts, n_pts)),
            jnp.broadcast_to(gy[:, :, None], (r, n_pts, n_pts)),
        ],
        axis=-1,
    ).reshape(1, r * n_pts * n_pts, 2)

    rows = features.reshape(1, h * w, c)
    sampled = grid_sample_rows(rows, grid, h, w)  # (1, R*n*n, C)
    sampled = sampled.reshape(r, output_size, s, output_size, s, c)
    return sampled.mean(axis=(2, 4))


def assign_boxes_to_levels(
    boxes: jnp.ndarray, min_level: int = 2, max_level: int = 5, canonical: int = 224
) -> jnp.ndarray:
    """FPN level assignment (d2 heuristic): level = 4 + log2(sqrt(area)/224)."""
    from .boxes import box_area

    area = jnp.maximum(box_area(boxes), 1e-6)
    lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(area) / canonical + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: dict,  # {"p2": (H2, W2, C), ..., "p5": ...}
    boxes: jnp.ndarray,  # (R, 4) xyxy in IMAGE pixel coords
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Fixed-shape multi-level ROIAlign: pool every box from every level,
    then select the assigned level's result (compute trade for shape
    stasis — R is small)."""
    levels = assign_boxes_to_levels(boxes)
    outs = []
    for li, name in enumerate(["p2", "p3", "p4", "p5"]):
        stride = 2 ** (li + 2)
        outs.append(
            roi_align(features[name], boxes / stride, output_size, sampling_ratio)
        )
    stacked = jnp.stack(outs)  # (4, R, s, s, C)
    sel = (levels - 2)[None, :, None, None, None] == jnp.arange(4)[:, None, None, None, None]
    return (stacked * sel).sum(axis=0)
