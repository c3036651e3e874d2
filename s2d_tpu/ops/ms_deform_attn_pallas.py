"""Multi-scale deformable attention — Pallas TPU kernels (fwd + bwd).

TPU-native replacement for the reference's CUDA im2col/col2im kernels
(`/root/reference/model_training/mask2former/modeling/pixel_decoder/ops/src/
cuda/ms_deform_im2col_cuda.cuh:243,306-927`): instead of per-thread gathers
and atomic-add scatters (the TPU has no fast arbitrary-gather unit —
measured 5x slower than one-hot matmuls even in XLA), bilinear sampling is
reformulated as two SEPARABLE sparse contractions that run on the MXU:

  C[q, (w, d)] = sum_h A[q, h] * V[h, w, d]      (MXU, one-hot-pair A)
  out[q, d]   += sum_w WX[q, w] * C[q, w, d]     (VPU weighted reduction)

A is the 2-nonzero y-corner interpolation matrix, built in-kernel from a
broadcasted-iota compare against the corner row index — it never exists in
HBM. Per level the MXU contraction is (W*D, K=128) x (K=128, Q_tile): the K
dimension holds the level HEIGHT (G = 128 // H head slices are packed into
the one mandatory 128-lane K block; a point of group member g matches rows
g*H + y0), and the output dimension W*D is lane-dense. This shape beats
both XLA's fused one-hot (construction-bound on the VPU) and a direct
one-hot over H*W (whose output D=32 pads 4x on MXU pass granularity).

The P sampling points of a query are a static in-kernel loop accumulating
into one (D, Q_tile) output tile — measurement showed the kernel is bound
by OUTPUT traffic, not compute, so the 4x output reduction matters more
than any compute tuning.

The BACKWARD is the same algebra transposed, with the corner matrices
recomputed in-kernel (as the reference's col2im recomputes its bilinear
weights):

  dC[q, (w, d)] = WX[q, w] * g[q, d]
  dV   += dC^T-side matmul:  (W*D, Q_tile) x (Q_tile, K)    [per-n accum]
  dA    = V^T-side matmul:   (K, W*D) x (W*D, Q_tile)
  dwy   = dA rows selected at the corner indices (masked sublane reduce)
  dWX   = sum_d C[q, w, d] * g[q, d]  (recomputed C — one extra fwd dot)

so the scatter-add into dV becomes a dense MXU accumulation — the
TPU-native answer to CUDA atomicAdd. Gradients w.r.t. sampling locations
and attention weights chain outside the kernel from (dwy, dwx).

Zero-padding semantics: out-of-range corners are sentineled to row -5
outside the kernel (matching no iota row), x-corners outside [0, W) match
no column of the WX compare — both contribute exactly 0, identical to the
reference's bilinear border handling (`ms_deform_im2col_cuda.cuh:39-84`).
The per-point attention weight is folded into the x-corner weights.

Numerics: the MXU contractions run in `compute_dtype` (default bfloat16,
f32 accumulation) — AMP-class precision, the same noise class as the
reference's fp16-autocast training; pass compute_dtype=float32 for exact
parity (4x slower MXU, used by the CPU tests). Parity vs an independent
numpy oracle and vs jax.grad of the XLA path is asserted in
tests/test_ms_deform_attn.py (interpret mode).
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


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(vt_ref, idx_ref, wts_ref, o_ref, *, w: int, d: int,
                n_points: int, q_tile: int, compute_dtype):
    k = vt_ref.shape[2]
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, q_tile), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1, q_tile), 0)

    acc = jnp.zeros((d, q_tile), jnp.float32)
    for p in range(n_points):  # static unroll; accumulate per-point samples
        ya = idx_ref[0, p : p + 1, :]
        x0 = idx_ref[0, n_points + p : n_points + p + 1, :]
        wy0 = wts_ref[0, p : p + 1, :]
        wy1 = wts_ref[0, n_points + p : n_points + p + 1, :]
        wx0 = wts_ref[0, 2 * n_points + p : 2 * n_points + p + 1, :]
        wx1 = wts_ref[0, 3 * n_points + p : 3 * n_points + p + 1, :]

        # y-corner interpolation matrix A^T (K, Q_tile): two nonzeros per
        # column at packed rows ya and ya+1
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
    static_argnames=("w", "q_tile", "compute_dtype", "interpret"),
)
def _sample_level(
    v_t: jnp.ndarray,  # (NG, W*D, K) zero-padded past G*H
    idx: jnp.ndarray,  # (NG, 2P, GLQ) int32: rows [0,P) ya, [P,2P) x0
    wts: jnp.ndarray,  # (NG, 4P, GLQ) f32: wy0 | wy1 | wx0*aw | wx1*aw
    *,
    w: int,
    q_tile: int,
    compute_dtype,
    interpret: bool = False,
) -> jnp.ndarray:  # (NG, D, GLQ) f32 — P points accumulated
    ng, wd, k = v_t.shape
    d = wd // w
    n_points = idx.shape[1] // 2
    glq = idx.shape[2]
    glq_pad = _round_up(glq, q_tile)
    if glq_pad != glq:
        idx = jnp.pad(
            idx, ((0, 0), (0, 0), (0, glq_pad - glq)), constant_values=-5
        )
        wts = jnp.pad(wts, ((0, 0), (0, 0), (0, glq_pad - glq)))

    grid = (ng, glq_pad // q_tile)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, w=w, d=d, n_points=n_points, q_tile=q_tile,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((ng, d, glq_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wd, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 2 * n_points, q_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 4 * n_points, q_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, q_tile), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(v_t, idx, wts)
    return out[:, :, :glq]


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_kernel(vt_ref, vtt_ref, g_ref, idx_ref, wts_ref, dv_ref, dwt_ref,
                *, w: int, d: int, n_points: int, q_tile: int,
                compute_dtype):
    k = vt_ref.shape[2]
    j = pl.program_id(1)
    num_j = pl.num_programs(1)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, q_tile), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1, q_tile), 0)

    @pl.when(j == 0)
    def _init():
        dv_ref[...] = jnp.zeros_like(dv_ref)

    g = g_ref[0].astype(jnp.float32)  # (D, Q_tile)
    dv_acc = jnp.zeros((vt_ref.shape[1], k), jnp.float32)
    for p in range(n_points):
        ya = idx_ref[0, p : p + 1, :]
        x0 = idx_ref[0, n_points + p : n_points + p + 1, :]
        wy0 = wts_ref[0, p : p + 1, :]
        wy1 = wts_ref[0, n_points + p : n_points + p + 1, :]
        wx0 = wts_ref[0, 2 * n_points + p : 2 * n_points + p + 1, :]
        wx1 = wts_ref[0, 3 * n_points + p : 3 * n_points + p + 1, :]

        a_t = (
            jnp.where(h_iota == ya, wy0, 0.0)
            + jnp.where(h_iota == ya + 1, wy1, 0.0)
        ).astype(compute_dtype)
        x0r = x0.reshape(1, 1, q_tile)
        wxt = jnp.where(w_iota == x0r, wx0.reshape(1, 1, q_tile), 0.0) + \
            jnp.where(w_iota == x0r + 1, wx1.reshape(1, 1, q_tile), 0.0)

        # dC (W, D, Q) = WX (W, 1, Q) * g (1, D, Q); flattened for the MXU
        dc = (wxt * g[None]).reshape(w * d, q_tile).astype(compute_dtype)

        # dV += dC @ A: (W*D, Q) x (Q, K) -> (W*D, K)   [lane contraction]
        dv_acc = dv_acc + jax.lax.dot_general(
            dc, a_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # dA = V^T @ dC: (K, W*D) x (W*D, Q) -> (K, Q)
        da = jax.lax.dot_general(
            vtt_ref[0], dc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dwy: dA rows at the corner indices (masked sublane reduction)
        dwy0 = jnp.sum(jnp.where(h_iota == ya, da, 0.0), axis=0,
                       keepdims=True)
        dwy1 = jnp.sum(jnp.where(h_iota == ya + 1, da, 0.0), axis=0,
                       keepdims=True)

        # dWX (W, 1, Q) = sum_d C (W, D, Q) * g (1, D, Q): recompute C
        c_t = jax.lax.dot_general(
            vt_ref[0], a_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwx_full = (c_t.reshape(w, d, q_tile) * g[None]).sum(
            axis=1, keepdims=True
        )  # (W, 1, Q)
        dwx0 = jnp.sum(
            jnp.where(w_iota == x0r, dwx_full, 0.0), axis=0
        )  # (1, Q)
        dwx1 = jnp.sum(jnp.where(w_iota == x0r + 1, dwx_full, 0.0), axis=0)

        dwt_ref[0, p : p + 1, :] = dwy0
        dwt_ref[0, n_points + p : n_points + p + 1, :] = dwy1
        dwt_ref[0, 2 * n_points + p : 2 * n_points + p + 1, :] = dwx0
        dwt_ref[0, 3 * n_points + p : 3 * n_points + p + 1, :] = dwx1

    dv_ref[0] = dv_ref[0] + dv_acc


@functools.partial(
    jax.jit,
    static_argnames=("w", "q_tile", "compute_dtype", "interpret"),
)
def _sample_level_bwd(
    v_t: jnp.ndarray,  # (NG, W*D, K)
    v_tt: jnp.ndarray,  # (NG, K, W*D) — pre-transposed, loop-invariant
    g: jnp.ndarray,  # (NG, D, GLQ) f32 cotangent of the level output
    idx: jnp.ndarray,  # (NG, 2P, GLQ) int32
    wts: jnp.ndarray,  # (NG, 4P, GLQ) f32
    *,
    w: int,
    q_tile: int,
    compute_dtype,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:  # dV_t (NG, W*D, K) f32, dwts (NG, 4P, GLQ) f32
    ng, wd, k = v_t.shape
    d = wd // w
    n_points = idx.shape[1] // 2
    glq = idx.shape[2]
    glq_pad = _round_up(glq, q_tile)
    if glq_pad != glq:
        padw = ((0, 0), (0, 0), (0, glq_pad - glq))
        idx = jnp.pad(idx, padw, constant_values=-5)
        wts = jnp.pad(wts, padw)
        g = jnp.pad(g, padw)

    grid = (ng, glq_pad // q_tile)
    dv, dwts = pl.pallas_call(
        functools.partial(
            _bwd_kernel, w=w, d=d, n_points=n_points, q_tile=q_tile,
            compute_dtype=compute_dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ng, wd, k), jnp.float32),
            jax.ShapeDtypeStruct((ng, 4 * n_points, glq_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wd, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, wd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, q_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 2 * n_points, q_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 4 * n_points, q_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, wd, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 4 * n_points, q_tile), lambda i, j: (i, 0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(v_t, v_tt, g, idx, wts)
    return dv, dwts[:, :, :glq]


# ---------------------------------------------------------------------------
# op-level wrapper with custom VJP
# ---------------------------------------------------------------------------


def _head_group(n: int, h: int) -> int:
    """Largest divisor of n with g*h <= 128 (K-packing factor)."""
    g = max(1, min(n, 128 // h))
    while n % g:
        g -= 1
    return g


def _level_prep(value_slice, loc, aw, hh, ww, n, lq, p, g, compute_dtype):
    """Build the packed kernel operands for one level.

    Returns (v_t, idx, wts, frac) where frac carries (fx, fy, aw, valid
    masks) needed by the backward chain rule.
    """
    b = value_slice.shape[0]
    m = n // b
    d = value_slice.shape[-1]
    k = _round_up(g * hh, 128)
    v = value_slice.astype(compute_dtype)
    v = v.reshape(b, hh, ww, m, d).transpose(0, 3, 2, 4, 1)
    v_t = v.reshape(n // g, g, ww * d, hh).transpose(0, 2, 1, 3)
    v_t = v_t.reshape(n // g, ww * d, g * hh)
    v_t = jnp.pad(v_t, ((0, 0), (0, 0), (0, k - g * hh)))

    ix = jnp.clip(loc[..., 0] * ww - 0.5, -4.0, ww + 2.0)
    iy = jnp.clip(loc[..., 1] * hh - 0.5, -4.0, hh + 2.0)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    fx = ix - x0f
    fy = iy - y0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    # pack: row = g*H + y0, with OOB y0 sentineled; a corner at y0+1 == H
    # must not leak into the next head slice's rows, so the bottom weight
    # is zeroed unless y0+1 <= H-1 (top likewise)
    g_off = ((jnp.arange(n, dtype=jnp.int32) % g) * hh)[:, None, None]
    ya = jnp.where((y0 >= -1) & (y0 <= hh - 1), y0 + g_off, -5)
    top_ok = y0 >= 0
    bot_ok = y0 <= hh - 2
    wy0 = jnp.where(top_ok, 1.0 - fy, 0.0)
    wy1 = jnp.where(bot_ok, fy, 0.0)
    wx0 = (1.0 - fx) * aw
    wx1 = fx * aw

    def regroup(a):
        # (N, Lq, P) -> (NG, P, G*Lq): g joins the lane axis, P becomes the
        # in-kernel loop axis
        return (
            a.reshape(n // g, g, lq, p)
            .transpose(0, 3, 1, 2)
            .reshape(n // g, p, g * lq)
        )

    idx = jnp.concatenate([regroup(ya), regroup(x0)], axis=1)
    wts = jnp.concatenate(
        [regroup(wy0), regroup(wy1), regroup(wx0), regroup(wx1)], axis=1
    )
    frac = (fx, fy, top_ok, bot_ok)
    return v_t, idx, wts, frac


def _ungroup(a, n, g, lq):
    """(NG, P-or-1, G*Lq) lane-packed -> (N, Lq, ...) order helpers."""
    p = a.shape[1]
    return (
        a.reshape(n // g, p, g, lq).transpose(0, 2, 1, 3).reshape(n, p, lq)
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6)
)
def _msda_pallas(
    static: Tuple,  # (spatial_shapes, b, m)
    value: jnp.ndarray,  # (B, S, M, D)
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    compute_dtype,
    q_tile: int,
    interpret: bool,
) -> jnp.ndarray:
    out, _ = _msda_pallas_fwd(
        static, value, sampling_locations, attention_weights,
        compute_dtype, q_tile, interpret,
    )
    return out


def _msda_pallas_fwd(static, value, sampling_locations, attention_weights,
                     compute_dtype, q_tile, interpret):
    spatial_shapes, b, m = static
    _, s, _, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    n = b * m
    f32 = jnp.float32

    out = None
    start = 0
    for lid, (hh, ww) in enumerate(spatial_shapes):
        g = _head_group(n, hh)
        loc = sampling_locations[:, :, :, lid].astype(f32)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n, lq, p, 2)
        aw = attention_weights[:, :, :, lid].astype(f32)
        aw = aw.transpose(0, 2, 1, 3).reshape(n, lq, p)
        v_t, idx, wts, _ = _level_prep(
            value[:, start : start + hh * ww], loc, aw, hh, ww, n, lq, p, g,
            compute_dtype,
        )
        sampled = _sample_level(
            v_t, idx, wts, w=ww, q_tile=q_tile,
            compute_dtype=compute_dtype, interpret=interpret,
        )  # (NG, D, G*Lq) f32
        contrib = (
            sampled.reshape(n // g, d, g, lq)
            .transpose(0, 2, 1, 3)
            .reshape(n, d, lq)
        )
        out = contrib if out is None else out + contrib
        start += hh * ww

    # (B*M, D, Lq) -> (B, Lq, M*D)
    result = (
        out.reshape(b, m, d, lq).transpose(0, 3, 1, 2).reshape(b, lq, m * d)
    )
    return result, (value, sampling_locations, attention_weights)


def _msda_pallas_bwd(static, compute_dtype, q_tile, interpret, residuals, gout):
    spatial_shapes, b, m = static
    value, sampling_locations, attention_weights = residuals
    _, s, _, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    n = b * m
    f32 = jnp.float32

    # cotangent (B, Lq, M*D) -> (N, D, Lq) -> per-level (NG, D, G*Lq)
    gq = (
        gout.astype(f32)
        .reshape(b, lq, m, d)
        .transpose(0, 2, 3, 1)
        .reshape(n, d, lq)
    )

    dvalue_parts = []
    dloc_parts = []
    daw_parts = []
    start = 0
    for lid, (hh, ww) in enumerate(spatial_shapes):
        g = _head_group(n, hh)
        loc = sampling_locations[:, :, :, lid].astype(f32)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n, lq, p, 2)
        aw = attention_weights[:, :, :, lid].astype(f32)
        aw = aw.transpose(0, 2, 1, 3).reshape(n, lq, p)
        v_t, idx, wts, frac = _level_prep(
            value[:, start : start + hh * ww], loc, aw, hh, ww, n, lq, p, g,
            compute_dtype,
        )
        fx, fy, top_ok, bot_ok = frac
        g_lvl = (
            gq.reshape(n // g, g, d, lq).transpose(0, 2, 1, 3)
            .reshape(n // g, d, g * lq)
        )
        dv_t, dwts = _sample_level_bwd(
            v_t, jnp.swapaxes(v_t, 1, 2), g_lvl, idx, wts,
            w=ww, q_tile=q_tile, compute_dtype=compute_dtype,
            interpret=interpret,
        )

        # dV_t (NG, W*D, K) -> dvalue level slice (B, H*W, M, D)
        dv = dv_t[:, :, : g * hh].reshape(n // g, ww * d, g, hh)
        dv = dv.transpose(0, 2, 1, 3).reshape(n, ww, d, hh)
        dv = dv.transpose(0, 3, 1, 2)  # (N, H, W, D)
        dv = dv.reshape(b, m, hh * ww, d).transpose(0, 2, 1, 3)
        dvalue_parts.append(dv.astype(value.dtype))

        # unpack dwts rows -> (N, Lq, P) each
        dwy0 = _ungroup(dwts[:, 0 * p : 1 * p], n, g, lq).transpose(0, 2, 1)
        dwy1 = _ungroup(dwts[:, 1 * p : 2 * p], n, g, lq).transpose(0, 2, 1)
        dwx0 = _ungroup(dwts[:, 2 * p : 3 * p], n, g, lq).transpose(0, 2, 1)
        dwx1 = _ungroup(dwts[:, 3 * p : 4 * p], n, g, lq).transpose(0, 2, 1)

        # chain rule through wy0 = (1-fy)[top], wy1 = fy[bot],
        # wx0 = (1-fx)*aw, wx1 = fx*aw; d(ix)/d(loc_x) = W, d(iy)/d(loc_y) = H
        dfy = jnp.where(bot_ok, dwy1, 0.0) - jnp.where(top_ok, dwy0, 0.0)
        dfx = (dwx1 - dwx0) * aw
        daw = dwx0 * (1.0 - fx) + dwx1 * fx
        dloc_x = dfx * ww
        dloc_y = dfy * hh
        dloc_parts.append(jnp.stack([dloc_x, dloc_y], axis=-1))
        daw_parts.append(daw)
        start += hh * ww

    dvalue = jnp.concatenate(dvalue_parts, axis=1)

    dloc = jnp.stack(
        [
            d_.reshape(b, m, lq, p, 2).transpose(0, 2, 1, 3, 4)
            for d_ in dloc_parts
        ],
        axis=3,
    ).astype(sampling_locations.dtype)
    daw = jnp.stack(
        [d_.reshape(b, m, lq, p).transpose(0, 2, 1, 3) for d_ in daw_parts],
        axis=3,
    ).astype(attention_weights.dtype)
    return dvalue, dloc, daw


_msda_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)


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
    """Multi-scale deformable attention via the separable MXU kernels.

    Same contract as `ms_deform_attn` (ms_deform_attn.py): returns
    (B, Lq, M*D) attended features. Differentiable (custom VJP backed by
    the transposed kernel).
    """
    b, s, m, d = value.shape
    assert sum(hh * ww for hh, ww in spatial_shapes) == s
    assert len(spatial_shapes) == sampling_locations.shape[3]
    return _msda_pallas(
        (tuple(spatial_shapes), b, m),
        value,
        sampling_locations,
        attention_weights,
        compute_dtype,
        q_tile,
        interpret,
    )
