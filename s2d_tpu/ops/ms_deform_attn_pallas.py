"""Multi-scale deformable attention — Pallas TPU kernel (forward).

TPU-native replacement for the reference's CUDA im2col kernels
(`/root/reference/model_training/mask2former/modeling/pixel_decoder/ops/src/
cuda/ms_deform_im2col_cuda.cuh:243`): instead of per-thread gathers (the TPU
has no fast arbitrary-gather unit — measured 5x slower than one-hot matmuls
even in XLA), bilinear sampling is reformulated as two SEPARABLE sparse
contractions that run on the MXU:

  C[q, (w, d)] = sum_h A[q, h] * V[h, w, d]      (MXU, one-hot-pair A)
  out[q, d]   += sum_w WX[q, w] * C[q, w, d]     (VPU weighted reduction)

A is the 2-nonzero y-corner interpolation matrix, built in-kernel from a
broadcasted-iota compare against the corner row index — it never exists in
HBM. Per level the MXU contraction is (W*D, K=128) x (K=128, Q_tile): the K
dimension holds the level HEIGHT (G = 128 // H head slices are packed into
the one mandatory 128-lane K block; a point of group member g matches rows
g*H + y0), and the output dimension W*D is lane-dense. This shape beats
both XLA's fused one-hot (construction-bound on the VPU) and a direct
one-hot over H*W (whose output dim D=32 pads 4x on MXU pass granularity).

The P sampling points of a query are a static in-kernel loop accumulating
into one (D, Q_tile) output tile — measurement showed the kernel is bound
by OUTPUT traffic, not compute, so the 4x output reduction (and the f32
accumulation it brings) is the difference between winning and losing to
the XLA path.

Zero-padding semantics: out-of-range corners are sentineled to row -5
outside the kernel (matching no iota row), x-corners outside [0, W) match
no column of the WX compare — both contribute exactly 0, identical to the
reference's bilinear border handling (`ms_deform_im2col_cuda.cuh:39-84`).
The per-point attention weight is folded into the x-corner weights.

Numerics: the MXU contraction runs in `compute_dtype` (default bfloat16,
f32 accumulation) — the y-corner weights are rounded to bf16 (<=0.4% weight
error), the x-corner epilogue stays f32. This is the AMP-class precision the
reference trains/evals under (fp16 autocast); pass compute_dtype=float32 for
exact parity (4x slower MXU, used by the CPU tests).

Forward-only: training keeps the XLA row-gather path whose backward is the
scatter-add the reference hand-writes in CUDA. Parity vs an independent
numpy oracle is asserted in tests/test_ms_deform_attn.py (interpret mode).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(vt_ref, ya_ref, wy0_ref, wy1_ref, x0_ref, wx0_ref, wx1_ref,
            o_ref, *, w: int, d: int, n_points: int, q_tile: int,
            compute_dtype):
    k = vt_ref.shape[2]
    j = pl.program_id(1)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, q_tile), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1, q_tile), 0)

    acc = jnp.zeros((d, q_tile), jnp.float32)
    for p in range(n_points):  # static unroll; accumulate per-point samples
        sl = (0, slice(p, p + 1), pl.ds(j * q_tile, q_tile))
        ya, wy0, wy1 = ya_ref[sl], wy0_ref[sl], wy1_ref[sl]
        x0, wx0, wx1 = x0_ref[sl], wx0_ref[sl], wx1_ref[sl]

        # y-corner interpolation matrix A^T (K, Q_tile): two nonzeros per
        # column at packed rows ya and ya+1 (out-of-bounds corners were
        # sentineled outside and match no row)
        a_t = (
            jnp.where(h_iota == ya, wy0, 0.0)
            + jnp.where(h_iota == ya + 1, wy1, 0.0)
        ).astype(compute_dtype)

        # MXU: (W*D, K) x (K, Q_tile) -> C^T (W*D, Q_tile), f32 accumulate
        c_t = jax.lax.dot_general(
            vt_ref[0], a_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # x-corner weighted reduction on the VPU: C^T viewed as
        # (W, D, Q_tile) — a sublane split, no lane relayout — with the
        # (attention-weighted) x weights broadcast over D
        x0r = x0.reshape(1, 1, q_tile)
        wxt = jnp.where(w_iota == x0r, wx0.reshape(1, 1, q_tile), 0.0) + \
            jnp.where(w_iota == x0r + 1, wx1.reshape(1, 1, q_tile), 0.0)
        acc = acc + (c_t.reshape(w, d, q_tile) * wxt).sum(axis=0)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "q_tile", "compute_dtype", "interpret"),
)
def _sample_level(
    v_t: jnp.ndarray,  # (NG, W*D, K) zero-padded past G*H
    ya: jnp.ndarray,  # (NG, P, GLQ) int32 packed y-corner row (g*H + y0), -5 OOB
    wy0: jnp.ndarray,  # (NG, P, GLQ) f32
    wy1: jnp.ndarray,
    x0: jnp.ndarray,  # (NG, P, GLQ) int32
    wx0: jnp.ndarray,  # (NG, P, GLQ) f32, attention weight folded in
    wx1: jnp.ndarray,
    *,
    h: int,
    w: int,
    q_tile: int,
    compute_dtype,
    interpret: bool = False,
) -> jnp.ndarray:  # (NG, D, GLQ) f32 — P-points already accumulated
    ng, wd, k = v_t.shape
    d = wd // w
    n_points = ya.shape[1]
    glq = ya.shape[2]
    glq_pad = _round_up(glq, q_tile)
    if glq_pad != glq:
        pad = ((0, 0), (0, 0), (0, glq_pad - glq))
        ya = jnp.pad(ya, pad, constant_values=-5)
        x0 = jnp.pad(x0, pad, constant_values=-5)
        wy0, wy1, wx0, wx1 = (
            jnp.pad(a, pad) for a in (wy0, wy1, wx0, wx1)
        )

    grid = (ng, glq_pad // q_tile)
    # full point rows per n (block == array in the last two dims — the TPU
    # block-shape rule); index map constant in j, so the block is fetched
    # once per n and each step slices its own q_tile lanes
    point_spec = pl.BlockSpec((1, n_points, glq_pad), lambda i, j: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, w=w, d=d, n_points=n_points, q_tile=q_tile,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((ng, d, glq_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wd, k), lambda i, j: (i, 0, 0)),
            point_spec, point_spec, point_spec,
            point_spec, point_spec, point_spec,
        ],
        out_specs=pl.BlockSpec((1, d, q_tile), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(v_t, ya, wy0, wy1, x0, wx0, wx1)
    return out[:, :, :glq]


def _head_group(n: int, h: int) -> int:
    """Largest divisor of n with g*h <= 128 (K-packing factor)."""
    g = max(1, min(n, 128 // h))
    while n % g:
        g -= 1
    return g


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # (B, S, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    *,
    compute_dtype=jnp.bfloat16,
    q_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward multi-scale deformable attention via the separable MXU kernel.

    Same contract as `ms_deform_attn` (ms_deform_attn.py): returns
    (B, Lq, M*D) attended features.
    """
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    assert len(spatial_shapes) == num_levels
    assert sum(hh * ww for hh, ww in spatial_shapes) == s
    n = b * m
    f32 = jnp.float32

    out = None
    start = 0
    for lid, (hh, ww) in enumerate(spatial_shapes):
        g = _head_group(n, hh)
        k = _round_up(g * hh, 128)
        # (B, H*W, M, D) -> (N, W*D, H) -> pack G head slices along K
        v = value[:, start : start + hh * ww].astype(compute_dtype)
        v = v.reshape(b, hh, ww, m, d).transpose(0, 3, 2, 4, 1)
        v_t = v.reshape(n // g, g, ww * d, hh).transpose(0, 2, 1, 3)
        v_t = v_t.reshape(n // g, ww * d, g * hh)
        v_t = jnp.pad(v_t, ((0, 0), (0, 0), (0, k - g * hh)))

        # corner indices + weights (N, Lq, P); attention weight folded into
        # the x weights so the in-kernel P loop is a plain accumulation
        loc = sampling_locations[:, :, :, lid].astype(f32)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n, lq, p, 2)
        aw = attention_weights[:, :, :, lid].astype(f32)
        aw = aw.transpose(0, 2, 1, 3).reshape(n, lq, p)
        ix = jnp.clip(loc[..., 0] * ww - 0.5, -4.0, ww + 2.0)
        iy = jnp.clip(loc[..., 1] * hh - 0.5, -4.0, hh + 2.0)
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        wx1 = ix - x0f
        wy1 = iy - y0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        # pack: row = g*H + y0, with OOB y0 sentineled; a corner at
        # y0+1 == H must not leak into the next head slice's rows, so the
        # bottom weight is zeroed unless y0+1 <= H-1 (top likewise)
        g_off = ((jnp.arange(n, dtype=jnp.int32) % g) * hh)[:, None, None]
        ya = jnp.where((y0 >= -1) & (y0 <= hh - 1), y0 + g_off, -5)
        wy0v = jnp.where(y0 >= 0, 1.0 - wy1, 0.0)
        wy1v = jnp.where(y0 <= hh - 2, wy1, 0.0)

        def regroup(a):
            # (N, Lq, P) -> (NG, P, G*Lq): g joins the lane axis, P becomes
            # the in-kernel loop axis
            return (
                a.reshape(n // g, g, lq, p)
                .transpose(0, 3, 1, 2)
                .reshape(n // g, p, g * lq)
            )

        sampled = _sample_level(
            v_t,
            regroup(ya),
            regroup(wy0v),
            regroup(wy1v),
            regroup(x0),
            regroup((1.0 - wx1) * aw),
            regroup(wx1 * aw),
            h=hh,
            w=ww,
            q_tile=q_tile,
            compute_dtype=compute_dtype,
            interpret=interpret,
        )  # (NG, D, G*Lq) f32
        contrib = (
            sampled.reshape(n // g, d, g, lq)
            .transpose(0, 2, 1, 3)
            .reshape(n, d, lq)
        )
        out = contrib if out is None else out + contrib
        start += hh * ww

    # (B*M, D, Lq) -> (B, Lq, M*D)
    return out.reshape(b, m, d, lq).transpose(0, 3, 1, 2).reshape(b, lq, m * d)
