"""Random-phase lattice point sampling: gather-free bilinear pools.

The criterion's PointRend-style losses (reference criterion.py:75-136 and
matcher.py:212-264) are Monte-Carlo estimates of mask integrals over a
point pool. With an iid-uniform pool the per-layer (R, S) bilinear
samplings are GATHERS and their backward is a scatter-add — both measured
as the dominant cost of the full KD train step on TPU even after the
matmul-backward rewrite (PERFORMANCE.md), because the TPU has no fast
arbitrary-gather/scatter unit and pallas offers no vector gather either.

This module replaces the iid pool with a jittered-lattice pool: points sit
on an (Ly, Lx) lattice whose axes are integer multiples or divisors of
every map resolution involved, shifted by ONE random phase (u, v) ~
U[0,1)^2 drawn per step:

    y_i = (i + u_y) / Ly,  x_j = (j + u_x) / Lx.

Sampling every map at all lattice points is then separable bilinear
interpolation with per-axis integer scale: a blend of (strided) shifted
slices — pure dense ops whose transpose (backward) is also dense. No
gather, no scatter, no index arithmetic.

Statistically this is classic random-phase stratified MC: for any
integrable f, E_phase[mean_points f] = integral f, so every loss/cost
stays an unbiased estimate of the same integral the reference computes;
stratification LOWERS the estimator variance vs iid at equal point count.
The trade is correlation structure: all points share one phase per step
(fresh each step), the same flavour of common-random-numbers trade the
shared-pool criterion already makes across layers (criterion.py).
"""
from __future__ import annotations

import functools
import math
from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp


def valid_axis_counts(sizes: Iterable[int], max_mult: int = 16) -> list:
    """Axis lengths L compatible with every map axis length in `sizes`:
    for each n, L % n == 0 (integer upsample) or n % L == 0 (integer
    downsample)."""
    sizes = sorted(set(int(s) for s in sizes))
    cands = set()
    for n in sizes:
        for m in range(1, max_mult + 1):
            cands.add(n * m)
        for d in range(1, n + 1):
            if n % d == 0:
                cands.add(n // d)
    return sorted(
        L for L in cands
        if L > 0 and all(L % n == 0 or n % L == 0 for n in sizes)
    )


@functools.lru_cache(maxsize=None)
def choose_lattice(
    target_count: int, hs: Tuple[int, ...], ws: Tuple[int, ...]
) -> Tuple[int, int]:
    """Pick (Ly, Lx) valid for all (hs, ws) scoring count closeness
    (log-space) PLUS a cost term on the largest upsample multiplier — an
    m-fold axis upsample is an m-way interleave loop in _interp_axis, so
    a count-perfect lattice like 23x7040 (x44 interleave) loses to a
    near-count one like 368x320. Ties prefer map-like aspect, then the
    larger pool, then larger Ly (determinism)."""
    rows = valid_axis_counts(hs)
    cols = valid_axis_counts(ws)
    aspect = max(hs) / max(ws)

    def max_mult(L, sizes):
        return max((L // n if L % n == 0 else 1) for n in sizes)

    best, best_key = None, None
    for ly in rows:
        for lx in cols:
            s = ly * lx
            cost = abs(math.log(s / target_count)) + 0.05 * max(
                max_mult(ly, hs), max_mult(lx, ws)
            )
            key = (
                round(cost, 6),
                abs(math.log((ly / lx) / aspect)),
                -s,
                -ly,
            )
            if best_key is None or key < best_key:
                best, best_key = (ly, lx), key
    if best is None:
        raise ValueError(f"no valid lattice for hs={hs} ws={ws}")
    return best


def upsample_blend_weights(r, phase, m, dtype=jnp.float32):
    """3-tap weights over source taps {-1, 0, +1} for integer upsampling
    by m at output residue(s) r with a random phase: output position
    q + (r + phase)/m - 0.5 (half-integer centres, zeros outside).

    THE single definition of the lattice phase/border convention —
    _interp_axis builds its blends from it."""
    delta = (r + phase) / m - 0.5  # in [-0.5, 0.5)
    f = jnp.floor(delta)  # -1 or 0
    frac = (delta - f).astype(dtype)
    is_m1 = (f < -0.5).astype(dtype)
    w_m1 = (1.0 - frac) * is_m1
    w_0 = frac * is_m1 + (1.0 - frac) * (1.0 - is_m1)
    w_p1 = frac * (1.0 - is_m1)
    return w_m1, w_0, w_p1


def _interp_axis(x: jnp.ndarray, axis: int, L: int, phase: jnp.ndarray):
    """Resample `axis` (length n) of `x` to L lattice positions: output i
    bilinearly samples source coordinate (i + phase)/L in [0, 1], i.e.
    pixel position (i + phase)/L * n - 0.5 (half-integer centres, zeros
    outside — exactly grid_sample_rows' align_corners=False convention).
    Requires L % n == 0 or n % L == 0."""
    n = x.shape[axis]
    phase = phase.astype(jnp.float32)
    if L % n == 0:
        m = L // n
        # residue r of output index: source position q + (r+phase)/m - 0.5
        xm1 = jnp.pad(
            jax.lax.slice_in_dim(x, 0, n - 1, axis=axis),
            [(1, 0) if a == axis % x.ndim else (0, 0) for a in range(x.ndim)],
        )
        xp1 = jnp.pad(
            jax.lax.slice_in_dim(x, 1, n, axis=axis),
            [(0, 1) if a == axis % x.ndim else (0, 0) for a in range(x.ndim)],
        )
        outs = []
        for r in range(m):
            w_m1, w_0, w_p1 = upsample_blend_weights(r, phase, m, x.dtype)
            outs.append(w_m1 * xm1 + w_0 * x + w_p1 * xp1)
        out = jnp.stack(outs, axis=axis % x.ndim + 1)  # (..., n, m, ...)
        shape = list(x.shape)
        shape[axis] = L
        return out.reshape(shape)
    if n % L == 0:
        d = n // L
        # constant fractional offset: position j*d + (phase*d - 0.5)
        off = phase * d - 0.5
        c = jnp.floor(off)  # in [-1, d-1]
        frac = (off - c).astype(x.dtype)
        pad = [(1, d) if a == axis % x.ndim else (0, 0) for a in range(x.ndim)]
        xp = jnp.pad(x, pad)
        starts = [0] * x.ndim
        starts[axis % x.ndim] = (c + 1).astype(jnp.int32)
        a = jax.lax.dynamic_slice(
            xp,
            [jnp.asarray(s, jnp.int32) for s in starts],
            [n + 1 if ai == axis % x.ndim else s
             for ai, s in enumerate(xp.shape)],
        )
        v0 = jax.lax.slice_in_dim(a, 0, (L - 1) * d + 1, stride=d, axis=axis)
        v1 = jax.lax.slice_in_dim(a, 1, (L - 1) * d + 2, stride=d, axis=axis)
        return (1.0 - frac) * v0 + frac * v1
    raise ValueError(f"axis length {n} incompatible with lattice {L}")


def lattice_sample(
    maps: jnp.ndarray,  # (R, H, W)
    ly: int,
    lx: int,
    phase: jnp.ndarray,  # (2,) = (u_y, u_x) in [0, 1)
) -> jnp.ndarray:
    """Bilinearly sample every map at all (ly, lx) lattice points:
    returns (R, ly, lx). Equivalent to grid_sample_rows at the coords
    ((j + u_x)/lx, (i + u_y)/ly) but built entirely from dense slice
    blends (no gathers; dense backward)."""
    rows = _interp_axis(maps, 1, ly, phase[0])
    return _interp_axis(rows, 2, lx, phase[1])


def lattice_coords(ly: int, lx: int, phase) -> jnp.ndarray:
    """The (ly*lx, 2) xy coords in [0, 1] the lattice samples at, row-major
    (for tests/parity with pool-based sampling)."""
    ys = (jnp.arange(ly) + phase[0]) / ly
    xs = (jnp.arange(lx) + phase[1]) / lx
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
