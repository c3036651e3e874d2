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
HBM. Per level the MXU contraction is (W*D, K) x (K, Q_tile) with
K = H rounded up to 128: the K dimension is the level HEIGHT and the
output dimension W*D is lane-dense. This shape beats both XLA's fused
one-hot (construction-bound on the VPU) and a direct one-hot over H*W
(whose output D=32 pads 4x on MXU pass granularity — every dim pads to
128 in its MXU role, so the only knob that matters is which dims carry
real data).

ALL levels and all P sampling points of a query run inside ONE kernel,
accumulating into a single (D, Q_tile) output tile. Measurement showed the
kernel is bound by OUTPUT traffic and fixed per-call overheads, not
compute — emitting per-point (or per-level) partials was the difference
between winning and losing to the XLA path.

The BACKWARD is the same algebra transposed, with the corner matrices
recomputed in-kernel (as the reference's col2im recomputes its bilinear
weights):

  dC[q, (w, d)] = WX[q, w] * g[q, d]
  dV   += dC-side matmul:  (W*D, Q_tile) x (Q_tile, K)    [per-n accum]
  dA    = V^T-side matmul: (K, W*D) x (W*D, Q_tile)
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


def _point_rows(ref, lid, p, n_points, n_levels, kinds):
    """Slice the packed per-(level, point) rows out of a (1, kinds*L*P, Q)
    block: row layout is kind-major, then level, then point."""
    base = lid * n_points + p
    stride = n_levels * n_points
    return [
        ref[0, k * stride + base : k * stride + base + 1, :]
        for k in range(kinds)
    ]


def _fwd_kernel(*refs, spatial_shapes, d, n_points, q_tile, compute_dtype):
    n_levels = len(spatial_shapes)
    vt_refs = refs[:n_levels]
    idx_ref, wts_ref, o_ref = refs[n_levels], refs[n_levels + 1], refs[-1]

    acc = jnp.zeros((d, q_tile), jnp.float32)
    for lid, (hh, ww) in enumerate(spatial_shapes):
        k = vt_refs[lid].shape[2]
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, q_tile), 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (ww, 1, q_tile), 0)
        for p in range(n_points):  # static unroll
            ya, x0 = _point_rows(idx_ref, lid, p, n_points, n_levels, 2)
            wy0, wy1, wx0, wx1 = _point_rows(
                wts_ref, lid, p, n_points, n_levels, 4
            )
            a_t = (
                jnp.where(h_iota == ya, wy0, 0.0)
                + jnp.where(h_iota == ya + 1, wy1, 0.0)
            ).astype(compute_dtype)
            c_t = jax.lax.dot_general(
                vt_refs[lid][0], a_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            x0r = x0.reshape(1, 1, q_tile)
            wxt = jnp.where(
                w_iota == x0r, wx0.reshape(1, 1, q_tile), 0.0
            ) + jnp.where(w_iota == x0r + 1, wx1.reshape(1, 1, q_tile), 0.0)
            acc = acc + (c_t.reshape(ww, d, q_tile) * wxt).sum(axis=0)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(*refs, spatial_shapes, d, n_points, q_tile, compute_dtype):
    n_levels = len(spatial_shapes)
    vt_refs = refs[:n_levels]
    vtt_refs = refs[n_levels : 2 * n_levels]
    g_ref = refs[2 * n_levels]
    idx_ref, wts_ref = refs[2 * n_levels + 1], refs[2 * n_levels + 2]
    dv_refs = refs[2 * n_levels + 3 : 3 * n_levels + 3]
    dwt_ref = refs[-1]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        for dv_ref in dv_refs:
            dv_ref[...] = jnp.zeros_like(dv_ref)

    g = g_ref[0].astype(jnp.float32)  # (D, Q_tile)
    stride = n_levels * n_points
    for lid, (hh, ww) in enumerate(spatial_shapes):
        k = vt_refs[lid].shape[2]
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, q_tile), 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (ww, 1, q_tile), 0)
        dv_acc = jnp.zeros((vt_refs[lid].shape[1], k), jnp.float32)
        for p in range(n_points):
            ya, x0 = _point_rows(idx_ref, lid, p, n_points, n_levels, 2)
            wy0, wy1, wx0, wx1 = _point_rows(
                wts_ref, lid, p, n_points, n_levels, 4
            )
            a_t = (
                jnp.where(h_iota == ya, wy0, 0.0)
                + jnp.where(h_iota == ya + 1, wy1, 0.0)
            ).astype(compute_dtype)
            x0r = x0.reshape(1, 1, q_tile)
            wxt = jnp.where(
                w_iota == x0r, wx0.reshape(1, 1, q_tile), 0.0
            ) + jnp.where(w_iota == x0r + 1, wx1.reshape(1, 1, q_tile), 0.0)

            # dC (W, D, Q) = WX (W, 1, Q) * g (1, D, Q), flat for the MXU
            dc = (wxt * g[None]).reshape(ww * d, q_tile).astype(compute_dtype)

            # dV += dC @ A: (W*D, Q) x (Q, K), contraction over lanes
            dv_acc = dv_acc + jax.lax.dot_general(
                dc, a_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # dA = V^T @ dC: (K, W*D) x (W*D, Q)
            da = jax.lax.dot_general(
                vtt_refs[lid][0], dc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwy0 = jnp.sum(jnp.where(h_iota == ya, da, 0.0), axis=0,
                           keepdims=True)
            dwy1 = jnp.sum(jnp.where(h_iota == ya + 1, da, 0.0), axis=0,
                           keepdims=True)

            # dWX = sum_d C * g with C recomputed (one extra fwd dot)
            c_t = jax.lax.dot_general(
                vt_refs[lid][0], a_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwx_full = (c_t.reshape(ww, d, q_tile) * g[None]).sum(
                axis=1, keepdims=True
            )
            dwx0 = jnp.sum(jnp.where(w_iota == x0r, dwx_full, 0.0), axis=0)
            dwx1 = jnp.sum(
                jnp.where(w_iota == x0r + 1, dwx_full, 0.0), axis=0
            )

            base = lid * n_points + p
            dwt_ref[0, base : base + 1, :] = dwy0
            dwt_ref[0, stride + base : stride + base + 1, :] = dwy1
            dwt_ref[0, 2 * stride + base : 2 * stride + base + 1, :] = dwx0
            dwt_ref[0, 3 * stride + base : 3 * stride + base + 1, :] = dwx1
        dv_refs[lid][0] = dv_refs[lid][0] + dv_acc


def _run_fwd(v_ts, idx, wts, *, spatial_shapes, d, q_tile, compute_dtype,
             interpret):
    n = v_ts[0].shape[0]
    n_levels = len(spatial_shapes)
    n_points = idx.shape[1] // (2 * n_levels)
    lq = idx.shape[2]
    lq_pad = _round_up(lq, q_tile)
    if lq_pad != lq:
        idx = jnp.pad(
            idx, ((0, 0), (0, 0), (0, lq_pad - lq)), constant_values=-5
        )
        wts = jnp.pad(wts, ((0, 0), (0, 0), (0, lq_pad - lq)))

    grid = (n, lq_pad // q_tile)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, spatial_shapes=spatial_shapes, d=d,
            n_points=n_points, q_tile=q_tile, compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, lq_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, vt.shape[1], vt.shape[2]), lambda i, j: (i, 0, 0)
            )
            for vt in v_ts
        ]
        + [
            pl.BlockSpec(
                (1, idx.shape[1], q_tile), lambda i, j: (i, 0, j)
            ),
            pl.BlockSpec(
                (1, wts.shape[1], q_tile), lambda i, j: (i, 0, j)
            ),
        ],
        out_specs=pl.BlockSpec((1, d, q_tile), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*v_ts, idx, wts)
    return out[:, :, :lq]


def _run_bwd(v_ts, g, idx, wts, *, spatial_shapes, d, q_tile, compute_dtype,
             interpret):
    n = v_ts[0].shape[0]
    n_levels = len(spatial_shapes)
    n_points = idx.shape[1] // (2 * n_levels)
    lq = idx.shape[2]
    lq_pad = _round_up(lq, q_tile)
    if lq_pad != lq:
        padw = ((0, 0), (0, 0), (0, lq_pad - lq))
        idx = jnp.pad(idx, padw, constant_values=-5)
        wts = jnp.pad(wts, padw)
        g = jnp.pad(g, padw)

    v_tts = [jnp.swapaxes(vt, 1, 2) for vt in v_ts]
    grid = (n, lq_pad // q_tile)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, spatial_shapes=spatial_shapes, d=d,
            n_points=n_points, q_tile=q_tile, compute_dtype=compute_dtype,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(vt.shape, jnp.float32) for vt in v_ts
        )
        + (
            jax.ShapeDtypeStruct((n, 4 * n_levels * n_points, lq_pad),
                                 jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, vt.shape[1], vt.shape[2]), lambda i, j: (i, 0, 0)
            )
            for vt in v_ts
        ]
        + [
            pl.BlockSpec(
                (1, vt.shape[2], vt.shape[1]), lambda i, j: (i, 0, 0)
            )
            for vt in v_ts
        ]
        + [
            pl.BlockSpec((1, d, q_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec(
                (1, idx.shape[1], q_tile), lambda i, j: (i, 0, j)
            ),
            pl.BlockSpec(
                (1, wts.shape[1], q_tile), lambda i, j: (i, 0, j)
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (1, vt.shape[1], vt.shape[2]), lambda i, j: (i, 0, 0)
            )
            for vt in v_ts
        )
        + (
            pl.BlockSpec(
                (1, 4 * n_levels * n_points, q_tile), lambda i, j: (i, 0, j)
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*v_ts, *v_tts, g, idx, wts)
    dv_ts, dwts = outs[:-1], outs[-1]
    return list(dv_ts), dwts[:, :, :lq]


# ---------------------------------------------------------------------------
# operand preparation / unpacking
# ---------------------------------------------------------------------------


def _prep_operands(value, spatial_shapes, sampling_locations,
                   attention_weights, compute_dtype, orient="y"):
    """value/locs/weights -> per-level V_t tensors + ONE packed corner
    index/weight pair covering all (level, point) combinations, plus the
    per-level frac context the backward chain rule needs.

    `orient` picks which spatial axis rides the MXU (K, padded to 128)
    vs the VPU blend (output rows x D):
      * "y":   K = H, output rows = W*D (the original layout);
      * "swap": K = W, output rows = H*D;
      * "auto": per level, pick whichever orientation minimizes padded
        MXU FLOPs = output_rows x round_up(K, 128). At the eval protocol
        (every axis <= 128, K pads to 128 either way) this puts the
        smaller axis in the output: min(H, W)*D rows, ~42% fewer padded
        FLOPs at H/W = 0.575. At larger levels the round_up term decides
        (see the swap condition below).
    The kernel itself is orientation-agnostic: a swapped level just feeds
    it (W, H) as its "spatial shape" with the x/y corner roles exchanged.
    """
    b, s, m, d = value.shape
    _, lq, _, n_levels, p, _ = sampling_locations.shape
    n = b * m
    f32 = jnp.float32

    v_ts = []
    kernel_shapes = []  # (K axis, blend axis) as the kernel sees them
    idx_rows = {0: [], 1: []}  # K-corner | blend-corner
    wts_rows = {k: [] for k in range(4)}
    fracs = []
    start = 0
    for lid, (hh, ww) in enumerate(spatial_shapes):
        # "auto": pick the orientation with fewer PADDED MXU FLOPs —
        # output_rows * round_up(K, 128), i.e. swap (K=W) iff
        # H*ceil128(W) < W*ceil128(H). A bare `hh < ww` compare is wrong
        # once the swapped axis exceeds 128 (e.g. a 92x160 level: 92<160
        # would swap onto K=256 and do ~15% MORE work).
        swapped = orient == "swap" or (
            orient == "auto"
            and hh * _round_up(ww, 128) < ww * _round_up(hh, 128)
        )
        v = value[:, start : start + hh * ww].astype(compute_dtype)
        v = v.reshape(b, hh, ww, m, d)

        loc = sampling_locations[:, :, :, lid].astype(f32)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n, lq, p, 2)
        aw = attention_weights[:, :, :, lid].astype(f32)
        aw = aw.transpose(0, 2, 1, 3).reshape(n, lq, p)
        ix = jnp.clip(loc[..., 0] * ww - 0.5, -4.0, ww + 2.0)
        iy = jnp.clip(loc[..., 1] * hh - 0.5, -4.0, hh + 2.0)
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        fx = ix - x0f
        fy = iy - y0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        def rows(a):  # (N, Lq, P) -> (N, P, Lq)
            return a.transpose(0, 2, 1)

        if not swapped:
            k = _round_up(hh, 128)
            # (B, H, W, M, D) -> (N, W*D, H), zero pad rows past H
            v_t = v.transpose(0, 3, 2, 4, 1).reshape(n, ww * d, hh)
            v_ts.append(jnp.pad(v_t, ((0, 0), (0, 0), (0, k - hh))))
            kernel_shapes.append((hh, ww))
            ka = jnp.where((y0 >= -1) & (y0 <= hh - 1), y0, -5)
            ok0 = y0 >= 0
            ok1 = y0 <= hh - 2
            idx_rows[0].append(rows(ka))
            idx_rows[1].append(rows(x0))
            wts_rows[0].append(rows(jnp.where(ok0, 1.0 - fy, 0.0)))
            wts_rows[1].append(rows(jnp.where(ok1, fy, 0.0)))
            wts_rows[2].append(rows((1.0 - fx) * aw))
            wts_rows[3].append(rows(fx * aw))
        else:
            k = _round_up(ww, 128)
            # (B, H, W, M, D) -> (N, H*D, W), zero pad rows past W
            v_t = v.transpose(0, 3, 1, 4, 2).reshape(n, hh * d, ww)
            v_ts.append(jnp.pad(v_t, ((0, 0), (0, 0), (0, k - ww))))
            kernel_shapes.append((ww, hh))
            ka = jnp.where((x0 >= -1) & (x0 <= ww - 1), x0, -5)
            ok0 = x0 >= 0
            ok1 = x0 <= ww - 2
            idx_rows[0].append(rows(ka))
            idx_rows[1].append(rows(y0))
            wts_rows[0].append(rows(jnp.where(ok0, 1.0 - fx, 0.0)))
            wts_rows[1].append(rows(jnp.where(ok1, fx, 0.0)))
            wts_rows[2].append(rows((1.0 - fy) * aw))
            wts_rows[3].append(rows(fy * aw))
        fracs.append((swapped, fx, fy, ok0, ok1, aw))
        start += hh * ww

    # kind-major, then level, then point: (N, kinds*L*P, Lq)
    idx = jnp.concatenate(
        [jnp.concatenate(idx_rows[k], axis=1) for k in (0, 1)], axis=1
    )
    wts = jnp.concatenate(
        [jnp.concatenate(wts_rows[k], axis=1) for k in range(4)], axis=1
    )
    return v_ts, idx, wts, fracs, kernel_shapes


def _unpack_dv(dv_t, hh, ww, b, m, d, value_dtype, swapped=False):
    """dV_t (N, blend*D, K) -> (B, H*W, M, D) level slice."""
    n = b * m
    if swapped:
        dv = dv_t[:, :, :ww].reshape(n, hh, d, ww).transpose(0, 1, 3, 2)
    else:
        dv = dv_t[:, :, :hh].reshape(n, ww, d, hh).transpose(0, 3, 1, 2)
    return dv.reshape(b, m, hh * ww, d).transpose(0, 2, 1, 3).astype(
        value_dtype
    )


# ---------------------------------------------------------------------------
# op-level wrapper with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6))
def _msda_pallas(
    static: Tuple,  # (spatial_shapes, b, m, orient)
    value: jnp.ndarray,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
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
    spatial_shapes, b, m, orient = static
    d = value.shape[-1]
    lq = sampling_locations.shape[1]
    n = b * m

    v_ts, idx, wts, _, kernel_shapes = _prep_operands(
        value, spatial_shapes, sampling_locations, attention_weights,
        compute_dtype, orient,
    )
    sampled = _run_fwd(
        v_ts, idx, wts, spatial_shapes=kernel_shapes, d=d, q_tile=q_tile,
        compute_dtype=compute_dtype, interpret=interpret,
    )  # (N, D, Lq) f32 — levels and points accumulated
    result = (
        sampled.reshape(b, m, d, lq)
        .transpose(0, 3, 1, 2)
        .reshape(b, lq, m * d)
    )
    return result, (value, sampling_locations, attention_weights)


def _msda_pallas_bwd(static, compute_dtype, q_tile, interpret, residuals,
                     gout):
    spatial_shapes, b, m, orient = static
    value, sampling_locations, attention_weights = residuals
    d = value.shape[-1]
    _, lq, _, n_levels, p, _ = sampling_locations.shape
    n = b * m
    f32 = jnp.float32

    v_ts, idx, wts, fracs, kernel_shapes = _prep_operands(
        value, spatial_shapes, sampling_locations, attention_weights,
        compute_dtype, orient,
    )
    g = (
        gout.astype(f32)
        .reshape(b, lq, m, d)
        .transpose(0, 2, 3, 1)
        .reshape(n, d, lq)
    )
    dv_ts, dwts = _run_bwd(
        v_ts, g, idx, wts, spatial_shapes=kernel_shapes, d=d,
        q_tile=q_tile, compute_dtype=compute_dtype, interpret=interpret,
    )

    dvalue = jnp.concatenate(
        [
            _unpack_dv(dv_ts[lid], hh, ww, b, m, d, value.dtype,
                       swapped=fracs[lid][0])
            for lid, (hh, ww) in enumerate(spatial_shapes)
        ],
        axis=1,
    )

    stride = n_levels * p
    dloc_levels = []
    daw_levels = []
    for lid in range(n_levels):
        hh, ww = spatial_shapes[lid]
        swapped, fx, fy, ok0, ok1, aw = fracs[lid]

        def grab(kind):  # (N, P, Lq) -> (N, Lq, P)
            rows = dwts[:, kind * stride + lid * p : kind * stride
                        + lid * p + p]
            return rows.transpose(0, 2, 1)

        dw0, dw1, dw2, dw3 = (grab(k) for k in range(4))
        if not swapped:
            # kinds: (wy0, wy1) pure y-corner wts on the MXU side,
            # (wx0*aw, wx1*aw) on the blend side
            dfy = jnp.where(ok1, dw1, 0.0) - jnp.where(ok0, dw0, 0.0)
            dfx = (dw3 - dw2) * aw
            daw = dw2 * (1.0 - fx) + dw3 * fx
        else:
            # kinds: (wx0, wx1) pure x-corner wts on the MXU side,
            # (wy0*aw, wy1*aw) on the blend side
            dfx = jnp.where(ok1, dw1, 0.0) - jnp.where(ok0, dw0, 0.0)
            dfy = (dw3 - dw2) * aw
            daw = dw2 * (1.0 - fy) + dw3 * fy
        dloc_levels.append(
            jnp.stack([dfx * ww, dfy * hh], axis=-1)
            .reshape(b, m, lq, p, 2)
            .transpose(0, 2, 1, 3, 4)
        )
        daw_levels.append(
            daw.reshape(b, m, lq, p).transpose(0, 2, 1, 3)
        )

    dloc = jnp.stack(dloc_levels, axis=3).astype(sampling_locations.dtype)
    daw = jnp.stack(daw_levels, axis=3).astype(attention_weights.dtype)
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
    orient: str = "y",
) -> jnp.ndarray:
    """Multi-scale deformable attention via the separable MXU kernels.

    Same contract as `ms_deform_attn` (ms_deform_attn.py): returns
    (B, Lq, M*D) attended features. Differentiable (custom VJP backed by
    the transposed kernel). `orient`: "y" (original: K=H), "swap" (K=W),
    or "auto" (per level, smaller axis to the output — fewer padded-K
    FLOPs; see _prep_operands). "y" stays the default until the swapped
    layout is measured on hardware.
    """
    b, s, m, d = value.shape
    assert sum(hh * ww for hh, ww in spatial_shapes) == s
    assert len(spatial_shapes) == sampling_locations.shape[3]
    assert orient in ("y", "swap", "auto")
    return _msda_pallas(
        (tuple(spatial_shapes), b, m, orient),
        value,
        sampling_locations,
        attention_weights,
        compute_dtype,
        q_tile,
        interpret,
    )
