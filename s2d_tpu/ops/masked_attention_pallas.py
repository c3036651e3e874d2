"""Flash-style masked cross-attention Pallas TPU kernel.

The video decoder's cross-attention attends 100 queries over T*H_l*W_l keys
with a per-(query, key) boolean mask (`/root/reference/model_training/
mask2former_video/modeling/transformer_decoder/
video_mask2former_transformer_decoder.py:415-420,460-465`). At whole-video
eval, K reaches hundreds of thousands, and the naive path materializes the
(heads, Q, K) logits + mask — the reference's main eval memory cliff
(mitigated there by CUDA-OOM retry, `utils/memory.py`).

This kernel streams keys in tiles with online softmax (flash attention),
so memory is O(Q x K_tile) regardless of video length. The boolean mask is
loaded tile-by-tile alongside K/V and applied as a -1e30 additive bias;
running max is clamped to >= -1e4 so fully-blocked tiles contribute
exp(-inf) = 0 rather than poisoning the rescaling.

Forward-only: the decoder uses it on the no-grad eval path; training keeps
the XLA einsum path (same math). Parity asserted in
tests/test_masked_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
M_CLAMP = -1.0e4


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    kt = pl.program_id(2)
    num_kt = pl.num_programs(2)

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, M_CLAMP)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # (TQ, Dh)
    k = k_ref[0].astype(jnp.float32)  # (TK, Dh)
    v = v_ref[0].astype(jnp.float32)
    blocked = mask_ref[0]  # (TQ, TK) bool

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(blocked, NEG_INF, logits)

    m_prev = m_ref[:, :1]  # (TQ, 1)
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(logits, axis=-1, keepdims=True)
    m_next = jnp.maximum(jnp.maximum(m_prev, m_curr), M_CLAMP)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(logits - m_next)  # (TQ, TK); 0 for blocked keys
    l_next = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    @pl.when(kt == num_kt - 1)
    def _finish():
        l_final = l_ref[:, :1]
        l_safe = jnp.where(l_final > 0, l_final, 1.0)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k_tile",))
def masked_cross_attention_flash(
    q: jnp.ndarray,  # (BH, Q, Dh)
    k: jnp.ndarray,  # (BH, K, Dh)
    v: jnp.ndarray,  # (BH, K, Dh)
    blocked: jnp.ndarray,  # (BH, Q, K) bool, True = may not attend
    k_tile: int = 1024,
) -> jnp.ndarray:
    """Softmax((q k^T) * Dh^-0.5 + mask) v, streamed over key tiles."""
    bh, q_len, dh = q.shape
    k_len = k.shape[1]
    scale = dh ** -0.5

    q_pad = _round_up(q_len, 128)
    k_pad = _round_up(k_len, k_tile)
    dh_pad = _round_up(dh, 128)

    qp = jnp.zeros((bh, q_pad, dh_pad), q.dtype).at[:, :q_len, :dh].set(q)
    kp = jnp.zeros((bh, k_pad, dh_pad), k.dtype).at[:, :k_len, :dh].set(k)
    vp = jnp.zeros((bh, k_pad, dh_pad), v.dtype).at[:, :k_len, :dh].set(v)
    # padded keys are blocked for everyone; padded queries see all-blocked
    mp = jnp.ones((bh, q_pad, k_pad), bool)
    mp = mp.at[:, :q_len, :k_len].set(blocked)

    grid = (bh, 1, k_pad // k_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, dh_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_pad, dh_pad), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, k_tile, dh_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, k_tile, dh_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, q_pad, k_tile), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, q_pad, dh_pad), lambda b, i, j: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((q_pad, 128), jnp.float32),
            pltpu.VMEM((q_pad, 128), jnp.float32),
            pltpu.VMEM((q_pad, dh_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, mp)
    return out[:, :q_len, :dh]
