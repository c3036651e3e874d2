"""Fused lattice point-loss kernel: blends + ce/dice sums, no (R, S) pool.

The criterion's per-layer point loss (reference criterion.py:75-136) reads
a prediction pool and a target pool of S ~ 471K points per row and runs an
elementwise chain (selection weights, sigmoid-BCE, dice partials) over
them. Even with lattice sampling (ops/lattice.py) and a bf16 chain, XLA
materializes the (R, S) pools in HBM and streams them several times per
layer pass — measured ~8.9 ms per pass at full scale, ~20x over the
intrinsic compute. This kernel fuses the whole pass:

    grid over the Ly lattice rows; per row l:
      * y-blend 3-row windows of the VMEM-resident (zero-padded) source
        blocks: src rows l//m_y_p + {-1,0,1}, tgt rows l//m_y_t + {-1,0,1}
      * x-blend via ONE MXU contraction per map against a precomputed
        2-nonzero-per-column matrix (W_src, Lx) — handles any integer
        up/down x relation
      * selection weights (Bernoulli block + uncertainty >= thr), the
        stable sigmoid-BCE, and the dice partial products — all on
        (R, Lx) tiles that never leave VMEM
      * accumulate 5 per-row f32 sums (ce*w, w, sigmoid*tgt*w, sigmoid*w,
        tgt*w)

so HBM traffic per pass is the SOURCE maps + the Bernoulli block, not the
pools. The loss assembly (counts, keep, num_masks, dice ratio) stays in
XLA and autodiffs; the kernel pair is wrapped in a custom VJP whose
backward recomputes the blends per row and accumulates d_src in a
VMEM-resident padded block (the target is stop-gradient).

The uncertainty threshold is computed OUTSIDE on a column-strided
sub-lattice: striding the lattice columns by c IS the (Ly, Lx/c) lattice
with phase ux/c, so the subsample never materializes the full pool either.

Eligibility: lattice mode with integer y-UPSAMPLE for both maps
(Ly % H == 0); the x relation may be any integer up/down (the matrix
absorbs it). The production s2d shapes (pred 92x160, tgt 368x640,
lattice 736x640) qualify.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rows_per_step(ly: int, target: int = 8) -> int:
    """Largest divisor of Ly <= target: lattice rows per grid step (the
    per-step pallas overhead amortizes across the unrolled rows)."""
    for c in range(min(target, ly), 0, -1):
        if ly % c == 0:
            return c
    return 1


def x_blend_matrix(w: int, lx: int, phase_x: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    """(W, Lx) matrix B with B[c, j] = bilinear weight of source column c
    for lattice column j at x = (j + phase_x)/Lx (align_corners=False,
    zeros outside) — 2 nonzeros per column. Contraction (R, W) @ (W, Lx)
    reproduces ops.lattice._interp_axis on the x axis exactly."""
    j = jnp.arange(lx, dtype=jnp.float32)
    pos = (j + phase_x) / lx * w - 0.5
    c0 = jnp.floor(pos)
    frac = pos - c0
    c0i = c0.astype(jnp.int32)
    m0 = jax.nn.one_hot(c0i, w, axis=0, dtype=dtype)  # (W, Lx); OOB -> 0
    m1 = jax.nn.one_hot(c0i + 1, w, axis=0, dtype=dtype)
    return m0 * (1.0 - frac).astype(dtype) + m1 * frac.astype(dtype)


def y_blend_weights(h: int, ly: int, phase_y: jnp.ndarray) -> jnp.ndarray:
    """(Ly, 3) weights over source rows {l//m - 1, l//m, l//m + 1} for
    lattice row l (m = Ly // h, integer upsample; zero-padded sources make
    the border rows exact)."""
    assert ly % h == 0, (h, ly)
    from .lattice import upsample_blend_weights

    m = ly // h
    r = jnp.arange(ly, dtype=jnp.float32) % m
    # the ONE lattice phase/border convention, shared with _interp_axis
    w_m1, w_0, w_p1 = upsample_blend_weights(r, phase_y, m)
    return jnp.stack([w_m1, w_0, w_p1], axis=1)  # (Ly, 3)



def _padded_rows(h: int) -> int:
    """Row count of the zero-padded source block: 1 top border row + h
    source rows + bottom zero rows such that every ALIGNED 16-row window
    (see _yblend) fits. Window base = 8*(q//8), q <= h-1, so the block
    needs 8*((h-1)//8) + 16 rows — always a multiple of 8 (clean sublane
    tiles) and >= h + 2."""
    return ((h - 1) // 8) * 8 + 16


def _yblend(ref, q, wy_ref, l):
    """3-row window blend: ref is (R, rows, W), zero-padded on the row
    axis, rows q..q+2 are source rows q-1..q+1.

    Mosaic legality (first real-chip runs 2026-08-19): (a) weights are
    f32 scalars read from SMEM — a (1, 1) VMEM slice multiplied into
    (R, W) needs a sublane+lane vector.broadcast, which Mosaic does not
    implement; (b) a dynamic second-minor-dim slice must have a provably
    8-aligned offset ("cannot statically prove that index in dimension 1
    is a multiple of 8") — so load an ALIGNED 16-row window at
    8*(q//8) and select the 3 rows in-register with scalar weights that
    vanish off the window position (exact zeros, so the sum is the same
    3-term blend)."""
    base = pl.multiple_of((q // 8) * 8, 8)
    win = ref[:, pl.ds(base, 16), :]  # (R, 16, W), static size
    r = q - base  # traced, in [0, 8)
    w0, w1, w2 = wy_ref[l, 0], wy_ref[l, 1], wy_ref[l, 2]
    acc = None
    for j in range(10):  # rows r..r+2 with r <= 7 live in [0, 10)
        wj = (
            jnp.where(r == j, w0, 0.0)
            + jnp.where(r == j - 1, w1, 0.0)
            + jnp.where(r == j - 2, w2, 0.0)
        )
        term = win[:, j, :] * wj
        acc = term if acc is None else acc + term
    return acc, (w0, w1, w2)


def _xblend(strip, bx_ref, xw_ref, shift: bool, compute_dtype):
    """x-resample a (R, W) strip to (R, Lx). shift=True is the W == Lx
    fast path: a 3-term lane-shift blend (pltpu.roll + border masks)
    instead of a (R, W) x (W, Lx) MXU contraction whose K = W."""
    if not shift:
        return jax.lax.dot_general(
            strip, bx_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
    w0, w1, w2 = xw_ref[0, 0], xw_ref[0, 1], xw_ref[0, 2]  # SMEM scalars
    lane = jax.lax.broadcasted_iota(jnp.int32, strip.shape, 1)
    lx = strip.shape[1]
    left = pltpu.roll(strip, 1, 1)  # left[j] = strip[j - 1]
    left = jnp.where(lane == 0, jnp.zeros_like(strip), left)
    # roll requires non-negative shifts; lx-1 == -1 (mod lx)
    right = pltpu.roll(strip, strip.shape[1] - 1, 1)  # right[j] = strip[j+1]
    right = jnp.where(lane == lx - 1, jnp.zeros_like(strip), right)
    return (left * w0 + strip * w1 + right * w2).astype(compute_dtype)


def _xblend_t(dpv, bxt_ref, xw_ref, shift: bool):
    """transpose of _xblend: (R, Lx) cotangent -> (R, W)."""
    if not shift:
        return jax.lax.dot_general(
            dpv, bxt_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    w0, w1, w2 = xw_ref[0, 0], xw_ref[0, 1], xw_ref[0, 2]  # SMEM scalars
    lane = jax.lax.broadcasted_iota(jnp.int32, dpv.shape, 1)
    lx = dpv.shape[1]
    right = pltpu.roll(dpv, dpv.shape[1] - 1, 1)  # dpv[c + 1]
    right = jnp.where(lane == lx - 1, jnp.zeros_like(dpv), right)
    left = pltpu.roll(dpv, 1, 1)  # dpv[c - 1]
    left = jnp.where(lane == 0, jnp.zeros_like(dpv), left)
    return right * w0 + dpv * w1 + left * w2


def _fwd_kernel(src_ref, tgt_ref, bern_ref, thr_ref, wyp_ref, wyt_ref,
                bxp_ref, bxt_ref, xwp_ref, xwt_ref, out_ref, *,
                m_y_p: int, m_y_t: int, shift_p: bool, shift_t: bool,
                rows_per_step: int, compute_dtype):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    thr = thr_ref[...]  # (R, 1) f32

    # several lattice rows per grid step: the per-step pallas overhead
    # (semaphores, bookkeeping) amortizes across the unrolled rows
    for k in range(rows_per_step):
        l = step * rows_per_step + k
        qp = l // m_y_p
        qt = l // m_y_t
        sp, _ = _yblend(src_ref, qp, wyp_ref, l)  # (R, Wp)
        st, _ = _yblend(tgt_ref, qt, wyt_ref, l)  # (R, Wt)
        pv = _xblend(sp, bxp_ref, xwp_ref, shift_p, compute_dtype)
        tv = _xblend(st, bxt_ref, xwt_ref, shift_t, compute_dtype)

        unc = -jnp.abs(pv)
        sel = (unc >= thr).astype(compute_dtype)
        w = bern_ref[k] + sel  # (R, Lx)

        # transcendentals run in f32: Mosaic rejects f32-constant
        # broadcasts into bf16 vectors ("'vector.broadcast' op ...
        # (f32) -> vector<...xbf16>", first real-chip run 2026-08-19);
        # the bwd kernel already upcasts for logistic — mirror it here
        pv32 = pv.astype(jnp.float32)
        ce = (
            jnp.maximum(pv32, 0.0)
            - pv32 * tv.astype(jnp.float32)
            + jax.nn.softplus(-jnp.abs(pv32))
        ).astype(compute_dtype)
        probs = jax.lax.logistic(pv32).astype(compute_dtype)

        # (R, 8) output, one column per sum — keepdims reductions and
        # column writes stay 2D throughout (Mosaic dislikes 1D
        # vectors/transposes)
        def acc(c, x):
            out_ref[:, c:c + 1] += x.astype(jnp.float32).sum(
                axis=1, keepdims=True
            )

        acc(0, ce * w)
        acc(1, w)
        acc(2, probs * tv * w)
        acc(3, probs * w)
        acc(4, tv * w)


def _bwd_kernel(src_ref, tgt_ref, bern_ref, thr_ref, wyp_ref, wyt_ref,
                bxp_ref, bxt_ref, bxpt_ref, xwp_ref, xwt_ref, g_ref,
                dsrc_ref, *, m_y_p: int, m_y_t: int, shift_p: bool,
                shift_t: bool, rows_per_step: int, compute_dtype):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    thr = thr_ref[...]
    # g: (R, 8) cotangents of the per-row sums (column k = sum k);
    # selection weights and the target are stop-gradient
    g_ce = g_ref[:, 0:1].astype(compute_dtype)  # (R, 1)
    g_num = g_ref[:, 2:3].astype(compute_dtype)
    g_ps = g_ref[:, 3:4].astype(compute_dtype)

    for k in range(rows_per_step):
        l = step * rows_per_step + k
        qp = l // m_y_p
        qt = l // m_y_t
        sp, wp = _yblend(src_ref, qp, wyp_ref, l)
        st, _ = _yblend(tgt_ref, qt, wyt_ref, l)
        pv = _xblend(sp, bxp_ref, xwp_ref, shift_p, compute_dtype)
        tv = _xblend(st, bxt_ref, xwt_ref, shift_t, compute_dtype)

        unc = -jnp.abs(pv)
        sel = (unc >= thr).astype(compute_dtype)
        w = bern_ref[k] + sel

        probs = jax.lax.logistic(
            pv.astype(jnp.float32)
        ).astype(compute_dtype)
        dprobs = probs * (1.0 - probs)
        dpv = w * (
            g_ce * (probs - tv) + (g_num * tv + g_ps) * dprobs
        )  # (R, Lx)

        dsp = _xblend_t(dpv, bxpt_ref, xwp_ref, shift_p)  # (R, Wp)

        # scatter the 3-row y-window back. Same Mosaic alignment rule as
        # _yblend: read-modify-write an ALIGNED 16-row window, with the
        # 3 real contributions placed by scalar weights that are exact
        # zeros elsewhere.
        base = pl.multiple_of((qp // 8) * 8, 8)
        r = qp - base
        cur = dsrc_ref[:, pl.ds(base, 16), :]  # (R, 16, Wp) f32
        dsp32 = dsp.astype(jnp.float32)
        rows = []
        for j in range(16):
            if j < 10:  # rows r..r+2 with r <= 7 live in [0, 10)
                wj = (
                    jnp.where(r == j, wp[0], 0.0)
                    + jnp.where(r == j - 1, wp[1], 0.0)
                    + jnp.where(r == j - 2, wp[2], 0.0)
                )
                rows.append(dsp32 * wj)
            else:
                rows.append(jnp.zeros_like(dsp32))
        upd = jnp.stack(rows, axis=1)  # (R, 16, Wp)
        dsrc_ref[:, pl.ds(base, 16), :] = cur + upd


def _prep(src, tgt, bern, thr, ly, lx, phase, compute_dtype):
    r, hp, wp = src.shape
    _, ht, wt = tgt.shape
    assert ly % hp == 0 and ly % ht == 0, (
        "fused point loss needs integer y-upsample for both maps"
    )
    r_pad = _round_up(r, 8)
    pad_r = r_pad - r

    def pad_rows(x):
        # zero row padding: 1 top border row + enough bottom rows that
        # every aligned 16-row _yblend window fits (exact zeros-outside
        # bilinear border either way), zero row-padding for the R axis
        bottom = _padded_rows(x.shape[1]) - x.shape[1] - 1
        return jnp.pad(
            x.astype(compute_dtype), ((0, pad_r), (1, bottom), (0, 0))
        )

    srcp = pad_rows(src)
    tgtp = pad_rows(tgt)
    # (Ly, R_pad, Lx): per-l partial blocks are (1, R_pad, Lx), whose
    # last two dims satisfy Mosaic's tiling divisibility (a (R, 1, Lx)
    # layout would put 1 on the second-minor dim — illegal). bf16 0/1.
    bernp = jnp.pad(
        jnp.swapaxes(
            bern.reshape(r, ly, lx).astype(compute_dtype), 0, 1
        ),
        ((0, 0), (0, pad_r), (0, 0)),
    )
    # padding rows: thr = +inf so sel = 0 there; bern rows are 0
    thrp = jnp.pad(
        thr.reshape(r, 1).astype(jnp.float32), ((0, pad_r), (0, 0)),
        constant_values=jnp.float32(3.0e38),
    )
    wyp = y_blend_weights(hp, ly, phase[0])
    wyt = y_blend_weights(ht, ly, phase[0])  # same lattice y-phase
    bxp = x_blend_matrix(wp, lx, phase[1], dtype=compute_dtype)
    bxt = x_blend_matrix(wt, lx, phase[1], dtype=compute_dtype)
    # W == Lx fast path: a 3-term lane-shift blend replaces the MXU
    # contraction (whose K = W is the dominant in-kernel matmul for the
    # identity-width target map). Weights = the m=1 y-blend row.
    # f32: the x-shift weights are read as SMEM scalars in-kernel
    xwp = y_blend_weights(wp, wp, phase[1])[0:1] \
        if wp == lx else jnp.zeros((1, 3), jnp.float32)
    xwt = y_blend_weights(wt, wt, phase[1])[0:1] \
        if wt == lx else jnp.zeros((1, 3), jnp.float32)
    return (srcp, tgtp, bernp, thrp, wyp, wyt, bxp, bxt, xwp, xwt,
            wp == lx, wt == lx, r_pad)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def fused_point_sums(
    src: jnp.ndarray,  # (R, Hp, Wp) prediction logits rows
    tgt: jnp.ndarray,  # (R, Ht, Wt) target rows (stop-gradient)
    bern: jnp.ndarray,  # (R, Ly*Lx) 0/1 Bernoulli weights
    thr: jnp.ndarray,  # (R,) or (R, 1) uncertainty thresholds (f32)
    phase: jnp.ndarray,  # (2,) = (u_y, u_x) shared lattice phase
    ly: int,
    lx: int,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Five (R,) f32 sums over the (Ly, Lx) lattice pool:
    (ce*w, w, sigmoid*tgt*w, sigmoid*w, tgt*w), where
    w = bern + [|pred| <= -thr]."""
    out = _fused_fwd_impl(
        src, tgt, bern, thr, phase, ly, lx, compute_dtype, interpret
    )
    return tuple(out[:, i] for i in range(5))


def _fused_fwd_impl(src, tgt, bern, thr, phase, ly, lx, compute_dtype,
                    interpret):
    r = src.shape[0]
    (srcp, tgtp, bernp, thrp, wyp, wyt, bxp, bxt, xwp, xwt, shift_p,
     shift_t, r_pad) = _prep(
        src, tgt, bern, thr, ly, lx, phase, compute_dtype
    )
    rps = _rows_per_step(ly)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, m_y_p=ly // src.shape[1], m_y_t=ly // tgt.shape[1],
            shift_p=shift_p, shift_t=shift_t, rows_per_step=rps,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        grid=(ly // rps,),
        in_specs=[
            pl.BlockSpec(srcp.shape, lambda l: (0, 0, 0)),
            pl.BlockSpec(tgtp.shape, lambda l: (0, 0, 0)),
            pl.BlockSpec((rps, r_pad, lx), lambda i: (i, 0, 0)),
            pl.BlockSpec((r_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wyp: scalar reads
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wyt
            pl.BlockSpec(bxp.shape, lambda i: (0, 0)),
            pl.BlockSpec(bxt.shape, lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # xwp
            pl.BlockSpec(memory_space=pltpu.SMEM),  # xwt
        ],
        out_specs=pl.BlockSpec((r_pad, 8), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(srcp, tgtp, bernp, thrp, wyp, wyt, bxp, bxt, xwp, xwt)
    return out[:r, :]


def _fused_fwd(src, tgt, bern, thr, phase, ly, lx, compute_dtype,
               interpret):
    out = _fused_fwd_impl(
        src, tgt, bern, thr, phase, ly, lx, compute_dtype, interpret
    )
    return (
        tuple(out[:, i] for i in range(5)),
        (src, tgt, bern, thr, phase),
    )


def _fused_bwd(ly, lx, compute_dtype, interpret, residuals, g):
    src, tgt, bern, thr, phase = residuals
    r = src.shape[0]
    (srcp, tgtp, bernp, thrp, wyp, wyt, bxp, bxt, xwp, xwt, shift_p,
     shift_t, r_pad) = _prep(
        src, tgt, bern, thr, ly, lx, phase, compute_dtype
    )
    gm = jnp.stack(
        [jnp.asarray(gi, jnp.float32) for gi in g] + [jnp.zeros((r,))] * 3,
        axis=1,
    )  # (R, 8)
    gm = jnp.pad(gm, ((0, r_pad - r), (0, 0)))
    rps = _rows_per_step(ly)
    dsrc = pl.pallas_call(
        functools.partial(
            _bwd_kernel, m_y_p=ly // src.shape[1], m_y_t=ly // tgt.shape[1],
            shift_p=shift_p, shift_t=shift_t, rows_per_step=rps,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (r_pad, _padded_rows(src.shape[1]), src.shape[2]), jnp.float32
        ),
        grid=(ly // rps,),
        in_specs=[
            pl.BlockSpec(srcp.shape, lambda l: (0, 0, 0)),
            pl.BlockSpec(tgtp.shape, lambda l: (0, 0, 0)),
            pl.BlockSpec((rps, r_pad, lx), lambda i: (i, 0, 0)),
            pl.BlockSpec((r_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wyp: scalar reads
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wyt
            pl.BlockSpec(bxp.shape, lambda i: (0, 0)),
            pl.BlockSpec(bxt.shape, lambda i: (0, 0)),
            pl.BlockSpec((bxp.shape[1], bxp.shape[0]), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # xwp
            pl.BlockSpec(memory_space=pltpu.SMEM),  # xwt
            pl.BlockSpec(gm.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (r_pad, _padded_rows(src.shape[1]), src.shape[2]),
            lambda i: (0, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(srcp, tgtp, bernp, thrp, wyp, wyt, bxp, bxt, bxp.T, xwp, xwt, gm)
    d_src = dsrc[:r, 1 : 1 + src.shape[1], :].astype(src.dtype)
    zeros = lambda x: jnp.zeros_like(x)
    return d_src, zeros(tgt), zeros(bern), zeros(thr), zeros(phase)


fused_point_sums.defvjp(_fused_fwd, _fused_bwd)
