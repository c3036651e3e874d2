#!/usr/bin/env python
"""Measure the bbox-crop mask transport vs the full-row slice (VERDICT
r4/r5 #1) at the e2e protocol shapes.

bench_eval_cli's random-init model binarizes noise, so its "objects" span
the whole canvas and the crop path correctly falls back — this bench
measures the leg the crop transport actually targets: a trained model's
localized instances. It builds the packed survivor canvas at protocol
shapes (n_keep x T x ceil(H/8) x W uint8, the exact array the evaluator
reads back), then times, per object-size scenario:

  full   slice-to-survivors D2H (the round-4 path)
  crop   _crop_packed_jit dispatch + crop D2H + host paste
         (the round-5 path, bit-exactness asserted against `full`)

  python tools/bench_crop_transport.py [--keep 16] [--t 16] [--hw 720x1280]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

import jax
import jax.numpy as jnp


def run_case(name, packed_dev, boxes_np, boxes_dev, h, iters=4):
    """Times both transports for one scenario; returns a report dict."""
    from s2d_tpu.evaluation.inference import (
        crop_bucket,
        crop_offsets,
        _crop_packed_jit,
    )

    n, t, h8, w = packed_dev.shape
    # jax Arrays cache their host value after the first __array__ read —
    # produce a FRESH device array per iteration (trivial xor jit, new
    # buffer each call) so every timed read really rides the link. Both
    # paths pay the same one trivial dispatch.
    bump = jax.jit(lambda x: x ^ jnp.uint8(0))

    # --- full path: D2H of the whole survivor slice ---
    full_s = []
    for _ in range(iters):
        fresh = bump(packed_dev)
        t0 = time.perf_counter()
        full_np = np.asarray(fresh)
        full_s.append(time.perf_counter() - t0)
    full_bits = np.unpackbits(full_np, axis=-2).view(np.bool_)[..., :h, :]

    # --- crop path: dispatch + D2H + paste ---
    ch8, cw = crop_bucket(boxes_np, h8, w)
    engaged = ch8 * cw < 0.7 * h8 * w
    crop_s, paste_s = [], []
    for _ in range(iters):
        fresh = bump(packed_dev)
        t0 = time.perf_counter()
        crops_dev = _crop_packed_jit(fresh, boxes_dev, ch8=ch8, cw=cw)
        crops = np.asarray(crops_dev)
        t1 = time.perf_counter()
        y0, x0 = crop_offsets(boxes_np, h8, w, ch8, cw)
        bits = np.unpackbits(crops, axis=-2).view(np.bool_)
        out = np.zeros((n, t, h, w), np.bool_)
        for i in range(n):
            yp = int(y0[i]) * 8
            h_i = min(bits.shape[2], h - yp)
            out[i, :, yp: yp + h_i, x0[i]: x0[i] + cw] = bits[i, :, :h_i]
        crop_s.append(t1 - t0)
        paste_s.append(time.perf_counter() - t1)
    np.testing.assert_array_equal(out, full_bits)  # bit-exact

    full_med = float(np.median(full_s))
    crop_med = float(np.median(crop_s))
    return {
        "case": name,
        "crop_window": [ch8 * 8, cw],
        "engaged": engaged,
        "full_mb": round(full_np.nbytes / 1e6, 2),
        "crop_mb": round(crops.nbytes / 1e6, 2),
        "full_d2h_s": round(full_med, 3),
        "crop_d2h_s": round(crop_med, 3),
        "paste_s": round(float(np.median(paste_s)), 3),
        "bytes_ratio": round(full_np.nbytes / max(crops.nbytes, 1), 2),
        "d2h_speedup": round(full_med / max(crop_med, 1e-9), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", type=int, default=16)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", default="720x1280")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))
    h8 = -(-h // 8)
    n, t = args.keep, args.t

    rng = np.random.default_rng(3)
    # scenario: per-survivor object boxes at a given canvas fraction
    scenarios = {
        "small_objects_10pct": (int(h * 0.3), int(w * 0.33)),
        "medium_objects_25pct": (int(h * 0.5), int(w * 0.5)),
        "large_objects_60pct": (int(h * 0.75), int(w * 0.8)),
    }
    reports = []
    for name, (bh, bw) in scenarios.items():
        masks = np.zeros((n, t, h, w), bool)
        boxes = np.zeros((n, 4), np.int64)
        for i in range(n):
            y = int(rng.integers(0, h - bh + 1))
            x = int(rng.integers(0, w - bw + 1))
            masks[i, :, y: y + bh, x: x + bw] = (
                rng.random((t, bh, bw)) > 0.3
            )
            boxes[i] = (y // 8, x, -(-(y + bh) // 8) - y // 8, bw)
        packed = np.packbits(masks, axis=-2)
        assert packed.shape == (n, t, h8, w)
        packed_dev = jax.device_put(jnp.asarray(packed))
        boxes_dev = jax.device_put(jnp.asarray(boxes, jnp.int32))
        jax.block_until_ready(packed_dev)
        rep = run_case(name, packed_dev, boxes, boxes_dev, h)
        reports.append(rep)
        print(json.dumps(rep))
    # protocol-level summary: per-video masks leg at the 4x T=16 bench
    print(json.dumps({
        "backend": jax.default_backend(),
        "protocol": f"keep={n} t={t} {args.hw}",
        "summary": {r["case"]: f"{r['bytes_ratio']}x bytes, "
                               f"{r['d2h_speedup']}x d2h"
                    for r in reports},
    }))


if __name__ == "__main__":
    main()
