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


def _upsample_int_axis(flat: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    """Integer-factor bilinear upsample along `axis` (1 or 2 of a (B, H, W)
    array) as m phase-wise 2-tap slice blends — the same two taps and
    float64-derived weights as `_interp_matrix` rows (output o = i*m + r
    reads src i + c_r, c_r = (r + 0.5)/m - 0.5, borders edge-clamped), so
    values match the dense-matmul path exactly in f32. At the eval
    protocol's x2/x4 mask upsamples this replaces ~600 GFLOP of dense
    (out, in) matmuls per clip with O(output) elementwise work."""
    lo = flat
    up = jnp.concatenate(
        [jnp.take(flat, jnp.asarray([0]), axis=axis),
         jax.lax.slice_in_dim(flat, 0, flat.shape[axis] - 1, axis=axis)],
        axis=axis,
    )  # src row i-1, clamped at 0
    dn = jnp.concatenate(
        [jax.lax.slice_in_dim(flat, 1, flat.shape[axis], axis=axis),
         jnp.take(flat, jnp.asarray([flat.shape[axis] - 1]), axis=axis)],
        axis=axis,
    )  # src row i+1, clamped at in-1
    f32 = jnp.float32
    phases = []
    for r in range(m):
        c = (r + 0.5) / m - 0.5  # float64, same derivation as the matrix
        if c < 0:
            ph = lo.astype(f32) * (1.0 + c) + up.astype(f32) * (-c)
        elif c == 0:
            ph = lo.astype(f32)
        else:
            ph = lo.astype(f32) * (1.0 - c) + dn.astype(f32) * c
        phases.append(ph.astype(flat.dtype))
    out = jnp.stack(phases, axis=axis + 1)  # (..., in, m, ...)
    shape = list(flat.shape)
    shape[axis] *= m
    return out.reshape(shape)


@functools.lru_cache(maxsize=64)
def composed_interp_matrix(
    in_size: int, mid_size: int, crop: int, out_size: int
) -> np.ndarray:
    """(out_size, in_size) matrix of resize(in->mid) -> crop[:crop] ->
    resize(crop->out) composed into ONE linear map (float64 compose, f32
    cast). Bilinear-of-bilinear is linear, so the eval postprocess's
    upsample->crop->resize chain collapses to a single pair of 1-D
    matmuls that never materializes the mid-resolution tensor."""
    m1 = _interp_matrix(in_size, mid_size).astype(np.float64)[:crop]
    m2 = _interp_matrix(crop, out_size).astype(np.float64)
    return (m2 @ m1).astype(np.float32)


def interpolate_bilinear(
    x: jnp.ndarray, size: tuple[int, int], precision: str = "highest"
) -> jnp.ndarray:
    """Resize the trailing two dims of `x` (..., H, W) to `size`=(H', W').

    precision: "highest" = exact f32 matmuls (torch-parity at threshold
    boundaries — used in the fp32 pixel-decoder island); "default" = the
    backend's fast path (the reference runs its decoder/inference resizes
    under AMP fp16, so this matches the reference's own numerics there).

    Integer UPSAMPLE factors take the phase-blend fast path (identical
    two-tap math, no dense interpolation matmul); everything else runs the
    two 1-D interpolation matmuls.
    """
    out_h, out_w = size
    *lead, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x
    flat = x.reshape(-1, h, w)
    hp = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    # W first (at the un-upsampled H — fewer matmul FLOPs when H grows)
    if w != out_w:
        # NOTE: the W axis stays on the matmul even for integer factors —
        # a phase-blend there interleaves LANES of the (often ~GB) output,
        # a relayout XLA executes as a full cross-lane shuffle (measured
        # on-chip: 121.9 -> 95.8 f/s end-to-end eval). The H axis is the
        # profitable one: its phase stack reshapes contiguously.
        mat_w = jnp.asarray(_interp_matrix(w, out_w), dtype=x.dtype)
        flat = jnp.einsum("ow,bhw->bho", mat_w, flat, precision=hp)
    if h != out_h:
        if out_h % h == 0 and out_h > h:
            # integer H-upsample: phase-wise 2-tap slice blends (identical
            # two-tap math, no dense (out, in) matmul; the (B, H, m, W) ->
            # (B, H*m, W) reshape is contiguous)
            flat = _upsample_int_axis(flat, out_h // h, axis=1)
        else:
            mat_h = jnp.asarray(_interp_matrix(h, out_h), dtype=x.dtype)
            flat = jnp.einsum("oh,bhw->bow", mat_h, flat, precision=hp)
    return flat.reshape(*lead, out_h, out_w)
