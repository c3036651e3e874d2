"""Per-part profile of the correlation tracker's frame transition.

The tracker was 544 ms per bidirectional call (T=24, P=256) with the
per-transition cost unprofiled (PERFORMANCE.md open item). This times the
transition's pieces and candidate rewrites at real shapes:

  * _extract_windows as-is (dense one-hot ROW-select einsum over H)
  * row-GATHER variant (channels-last row take + one-hot column einsum —
    the same layout finding that gave MSDA its 100x)
  * the grouped-conv NCC slide vs a shifted-slice patches formulation
  * full _match_step as-is vs rewired
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

from s2d_tpu.keymask import tracker as TR


def timed(fn, iters=20):
    out = fn()
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    return (time.perf_counter() - start) / iters


def extract_windows_gather(img, anchors, size, half):
    """Row-axis take (W lanes dense) + per-point one-hot column select."""
    h, w = img.shape
    offs = jnp.arange(size) - half
    rows_idx = anchors[:, 1][:, None] + offs[None]  # (P, size)
    cols_idx = anchors[:, 0][:, None] + offs[None]
    valid_r = (rows_idx >= 0) & (rows_idx < h)
    rows = jnp.take(img, jnp.clip(rows_idx, 0, h - 1).reshape(-1), axis=0)
    rows = rows.reshape(*rows_idx.shape, w) * valid_r[..., None]
    col_sel = jax.nn.one_hot(cols_idx, w, dtype=img.dtype)  # (P, size, W)
    return jnp.einsum("psw,ptw->pst", rows, col_sel)


def ncc_patches(template, win, patch, search):
    """NCC via shifted slices instead of grouped convs: returns corrs
    (P, C, C), C = 2*search + 1."""
    p = template.shape[0]
    c = 2 * search + 1
    t0 = template - template.mean(axis=(1, 2), keepdims=True)
    npix = patch * patch
    slices = [
        win[:, i : i + c, j : j + c]
        for i in range(patch)
        for j in range(patch)
    ]
    patches = jnp.stack(slices, axis=-1)  # (P, C, C, patch*patch)
    corr_raw = jnp.einsum(
        "pyxk,pk->pyx", patches, t0.reshape(p, npix)
    )
    w_sum = patches.sum(-1)
    w_sq = (patches * patches).sum(-1)
    t_var = (t0 * t0).sum(axis=(1, 2))[:, None, None]
    w_var = w_sq - w_sum * w_sum / npix
    return corr_raw / (jnp.sqrt(t_var * jnp.maximum(w_var, 0.0)) + 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="384x512")
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    h, w = (int(x) for x in args.hw.split("x"))
    p = args.points
    patch, search = 9, 12
    rng = np.random.RandomState(0)
    img_prev = jnp.asarray(rng.rand(h, w), jnp.float32)
    img_next = jnp.asarray(rng.rand(h, w), jnp.float32)
    pts = jnp.asarray(
        np.stack([rng.uniform(20, w - 20, p), rng.uniform(20, h - 20, p)], 1),
        jnp.float32,
    )
    anchors = jnp.floor(pts).astype(jnp.int32)

    half_t = (patch - 1) // 2
    half_w = search + half_t
    win_sz = 2 * search + patch + 1

    # --- window extraction variants
    f_onehot = jax.jit(
        lambda: TR._extract_windows(img_next, anchors, win_sz, half_w)
    )
    f_gather = jax.jit(
        lambda: extract_windows_gather(img_next, anchors, win_sz, half_w)
    )
    a = f_onehot()
    b = f_gather()
    err = float(jnp.abs(a - b).max())
    print(f"extract parity max err: {err:.2e}", flush=True)
    print(f"extract one-hot : {timed(f_onehot, args.iters)*1e3:7.2f} ms", flush=True)
    print(f"extract gather  : {timed(f_gather, args.iters)*1e3:7.2f} ms", flush=True)

    # --- NCC variants on the same windows
    frac = pts - jnp.floor(pts)
    tpl = TR._frac_shift(
        TR._extract_windows(img_prev, anchors, patch + 1, half_t), frac
    )
    winb = TR._frac_shift(
        TR._extract_windows(img_next, anchors, win_sz, half_w), frac
    )
    tpl, winb = jax.device_put(tpl), jax.device_put(winb)

    def ncc_conv():
        dn = jax.lax.conv_dimension_numbers(
            (1, p, win_sz - 1, win_sz - 1), (p, 1, patch, patch),
            ("NCHW", "OIHW", "NCHW"),
        )

        def slide(kernel, data):
            return jax.lax.conv_general_dilated(
                data[None], kernel[:, None], (1, 1), "VALID",
                dimension_numbers=dn, feature_group_count=p,
            )[0]

        t0 = tpl - tpl.mean(axis=(1, 2), keepdims=True)
        npix = patch * patch
        corr_raw = slide(t0, winb)
        w_sum = slide(jnp.ones_like(tpl), winb)
        w_sq = slide(jnp.ones_like(tpl), winb * winb)
        t_var = (t0 * t0).sum(axis=(1, 2))[:, None, None]
        w_var = w_sq - w_sum * w_sum / npix
        return corr_raw / (jnp.sqrt(t_var * jnp.maximum(w_var, 0.0)) + 1e-6)

    f_conv = jax.jit(ncc_conv)
    f_pat = jax.jit(lambda: ncc_patches(tpl, winb, patch, search))
    ca, cb = f_conv(), f_pat()
    print(f"ncc parity max err: {float(jnp.abs(ca - cb).max()):.2e}", flush=True)
    print(f"ncc grouped-conv: {timed(f_conv, args.iters)*1e3:7.2f} ms", flush=True)
    print(f"ncc patches     : {timed(f_pat, args.iters)*1e3:7.2f} ms", flush=True)

    # --- full transition as-is
    f_step = jax.jit(
        lambda: TR._match_step(img_prev, img_next, pts, patch, search, 2)
    )
    print(f"_match_step     : {timed(f_step, args.iters)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
