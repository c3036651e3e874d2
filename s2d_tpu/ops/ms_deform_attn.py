"""Multi-scale deformable attention — pure-JAX (XLA) implementation.

This is the TPU-native equivalent of the reference's CUDA extension
`MultiScaleDeformableAttention` (`/root/reference/model_training/mask2former/
modeling/pixel_decoder/ops/`): for every query, head, feature level, and
sampling point, bilinearly sample the value map at a predicted location and
accumulate with softmax attention weights. Semantics (normalized [0,1]
sampling locations, align_corners=False bilinear, zero padding out of bounds)
match the reference's own pure-torch oracle (`ops/functions/
ms_deform_attn_func.py:52-72`), which its CUDA kernel is tested against
(`ops/test.py:36-92`). We mirror that test strategy: this XLA version is the
oracle for the Pallas TPU kernel (``ms_deform_attn_pallas.py``), and is itself
tested against an independent numpy loop implementation + torch grid_sample.

Spatial shapes are STATIC (python tuple) — the level loop unrolls at trace
time so XLA sees fixed-shape gathers per level. That is the key departure
from the reference, whose spatial shapes are a runtime tensor.

Autodiff: plain jax.grad works through the gather/arithmetic — the backward
pass XLA generates is a scatter-add into the value gradient, which is exactly
what the reference hand-writes in CUDA (`ms_deform_im2col_cuda.cuh:306-927`).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .sampling import grid_sample, grid_sample_packed, grid_sample_rows, pack_2x2


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-scale deformable attention core.

    Args:
      value: (B, S, M, D) flattened multi-level value features, where
        S = sum(H_l * W_l), M = heads, D = head dim.
      spatial_shapes: static list of (H_l, W_l) per level, concatenation
        order matching `value`.
      sampling_locations: (B, Lq, M, L, P, 2) in [0, 1], xy order.
      attention_weights: (B, Lq, M, L, P), softmax-normalized over (L, P).
      impl: "xla" (this file), "xla_gather" (forces the row-gather sampling
        unit whose backward is a scatter-add — the training-safe XLA
        choice: the onehot unit's backward materializes the sparse
        interpolation matrix and OOMs HBM), "pallas" (separable-MXU TPU
        kernel, differentiable via a transposed-kernel custom VJP), or
        "pallas_auto" (same kernel with per-level axis orientation chosen
        to minimize padded MXU FLOPs — the TPU default for eval AND
        training since the on-chip measurements landed: 121.2 vs 93.7
        frames/s end-to-end eval on v5e, and the fastest measured KD train
        step; see PERFORMANCE.md).

    Returns:
      (B, Lq, M * D) attended features.
    """
    if impl in ("pallas", "pallas_auto"):
        import os

        from .ms_deform_attn_pallas import ms_deform_attn_pallas

        # S2D_MSDA_QTILE: lane-tile override for whole-pipeline A/B runs
        # (the kernel's ~2.6 ms/op non-MXU cost is per-grid-cell dispatch,
        # so fewer/larger tiles may win — measure before changing the
        # default). Read at TRACE time: set it before the process jits.
        q_tile = int(os.environ.get("S2D_MSDA_QTILE", "512"))
        return ms_deform_attn_pallas(
            value, tuple(spatial_shapes), sampling_locations,
            attention_weights,
            q_tile=q_tile,
            # "pallas_auto": per-level axis orientation with the smaller
            # spatial axis in the output (~42% fewer padded-K FLOPs at
            # wide aspect ratios); "pallas" keeps the original layout
            orient="auto" if impl == "pallas_auto" else "y",
        )
    return _ms_deform_attn_xla(
        value, tuple(spatial_shapes), sampling_locations, attention_weights,
        sample_impl="gather" if impl == "xla_gather" else "auto",
    )


def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations, attention_weights,
                        sample_impl: str = "auto"):
    """Channels-last row-gather formulation: per level, value rows are
    (B*M, H*W, D) and all Lq*P points gather rows at once — the layout XLA
    TPU lowers to fast row gathers (gathering along the lane axis instead
    is orders of magnitude slower)."""
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    assert len(spatial_shapes) == num_levels
    assert sum(h * w for h, w in spatial_shapes) == s

    # 2x2-packed single-fetch sampling (ops/sampling.py grid_sample_packed)
    # was probed end-to-end and measured slightly SLOWER (37.6 vs 41.4
    # frames/s) than the 4-corner combined-sparse einsum — the one-hot
    # rewrite is not row-issue-rate bound. Kept off; primitive retained.
    use_packed = False

    sampled_per_level = []
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        # (B, HW, M, D) -> (B*M, HW, D) rows
        v = value[:, start : start + h * w]
        v_rows = v.transpose(0, 2, 1, 3).reshape(b * m, h * w, d)
        # (B, Lq, M, P, 2) -> (B*M, Lq*P, 2), rescaled to [-1, 1]
        loc = sampling_locations[:, :, :, lid]
        grid = 2.0 * loc.transpose(0, 2, 1, 3, 4).reshape(b * m, lq * p, 2) - 1.0
        if use_packed and h * w <= 8192:
            packed = pack_2x2(v_rows, h, w)
            sampled_per_level.append(grid_sample_packed(packed, grid, h, w))
        else:
            # (B*M, Lq*P, D)
            sampled_per_level.append(
                grid_sample_rows(v_rows, grid, h, w, impl=sample_impl)
            )
        start += h * w

    # (B*M, Lq, L, P, D)
    sampled = jnp.stack(
        [x.reshape(b * m, lq, p, d) for x in sampled_per_level], axis=2
    )
    # (B, Lq, M, L, P) -> (B*M, Lq, L, P, 1)
    weights = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * m, lq, num_levels, p, 1
    )
    out = (sampled * weights).sum(axis=(2, 3))  # (B*M, Lq, D)
    return out.reshape(b, m, lq, d).transpose(0, 2, 1, 3).reshape(b, lq, m * d)
