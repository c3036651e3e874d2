#!/usr/bin/env python
"""Stage-level timing of the eval postprocess at the bench.py protocol
shapes (Q=100, K=1, T=8, mask logits 92x160, image 360x640, output
720x1280, 50 predictions, NMS 0.75).

Each stage is jitted separately and timed with a forced device->host
scalar read (axon block_until_ready is enqueue-ack only). Stage timings
overlap-free is not guaranteed (XLA fuses differently in the full jit),
so the full postprocess_video is timed too as ground truth.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

import jax
import jax.numpy as jnp

from s2d_tpu.evaluation.inference import postprocess_video
from s2d_tpu.ops.nms import greedy_mask_nms, mask_iou_matrix
from s2d_tpu.ops.resize import interpolate_bilinear

Q, K, T = 100, 1, 8
MH, MW = 92, 160
IMG = (360, 640)
OUT = (720, 1280)
NPRED = 50


def timed(fn, barrier, iters):
    out = fn()
    barrier(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    barrier(out)
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    logits = jax.random.normal(k1, (Q, K + 1), jnp.float32)
    masks = jax.random.normal(k2, (Q, T, MH, MW), jnp.float32) * 2.0

    def bar_scalar(x):
        return float(jnp.ravel(x if not isinstance(x, (tuple, list)) else x[0])[0].astype(jnp.float32))

    # full production postprocess
    def full():
        return postprocess_video(
            logits, masks, num_predictions=NPRED, num_classes=K,
            image_size=IMG, output_size=OUT, use_nms=True, nms_thresh=0.75,
        )

    t_full = timed(full, lambda o: float(o["scores"][0]), args.iters)
    print(f"full postprocess_video: {t_full*1e3:.2f} ms", flush=True)

    # stage 1: softmax + topk + gather
    @jax.jit
    def s1(logits, masks):
        scores = jax.nn.softmax(logits, axis=-1)[:, :-1].reshape(-1)
        top_scores, top_idx = jax.lax.top_k(scores, NPRED)
        qidx = top_idx // K
        return top_scores, masks[qidx].astype(cdt)

    _, sel = s1(logits, masks)
    t1 = timed(lambda: s1(logits, masks), lambda o: bar_scalar(o[0]), args.iters)
    print(f"s1 topk+gather: {t1*1e3:.2f} ms", flush=True)

    # stage 2: x4 upsample + crop
    @jax.jit
    def s2(sel):
        up = interpolate_bilinear(sel, (MH * 4, MW * 4), precision="default")
        return up[:, :, : IMG[0], : IMG[1]]

    up = s2(sel)
    t2 = timed(lambda: s2(sel), bar_scalar, args.iters)
    print(f"s2 upsample x4 + crop: {t2*1e3:.2f} ms", flush=True)

    # stage 3: full-res resize + binarize — chunked (production) vs whole
    def s3_chunked_f(up):
        def resize_chunk(chunk):
            return interpolate_bilinear(chunk, OUT, precision="default") > 0.0

        chunks = jnp.stack(jnp.split(up, 5, axis=0))
        m = jax.lax.map(resize_chunk, chunks)
        return m.reshape(NPRED, T, *OUT)

    s3_chunked = jax.jit(s3_chunked_f)
    s3_whole = jax.jit(
        lambda up: interpolate_bilinear(up, OUT, precision="default") > 0.0
    )
    bin_masks = s3_chunked(up)
    t3c = timed(lambda: s3_chunked(up), bar_scalar, args.iters)
    print(f"s3 resize+binarize (5 chunks): {t3c*1e3:.2f} ms", flush=True)
    t3w = timed(lambda: s3_whole(up), bar_scalar, args.iters)
    print(f"s3 resize+binarize (whole):    {t3w*1e3:.2f} ms", flush=True)

    # stage 4: IoU matrix (whole-dot path) and per-frame scan path
    s4 = jax.jit(mask_iou_matrix)
    t4 = timed(lambda: s4(bin_masks), bar_scalar, args.iters)
    print(f"s4 IoU matrix (auto path): {t4*1e3:.2f} ms", flush=True)

    def iou_scan_f(m):
        flat = m.reshape(NPRED, T, -1)

        def frame_step(carry, frame):
            inter, area = carry
            f16 = frame.astype(jnp.bfloat16)
            inter = inter + jnp.matmul(
                f16, f16.T, preferred_element_type=jnp.float32
            )
            area = area + frame.sum(axis=1, dtype=jnp.float32)
            return (inter, area), None

        (inter, area), _ = jax.lax.scan(
            frame_step,
            (jnp.zeros((NPRED, NPRED), jnp.float32),
             jnp.zeros((NPRED,), jnp.float32)),
            flat.transpose(1, 0, 2),
        )
        union = area[:, None] + area[None, :] - inter
        return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)

    iou_scan = jax.jit(iou_scan_f)
    t4s = timed(lambda: iou_scan(bin_masks), bar_scalar, args.iters)
    print(f"s4 IoU matrix (T-scan):    {t4s*1e3:.2f} ms", flush=True)

    # stage 5: NMS keep kernel
    iou = s4(bin_masks)
    labels = jnp.zeros((NPRED,), jnp.int32)
    s5 = jax.jit(lambda iou, labels: greedy_mask_nms(iou, labels, 0.75))
    t5 = timed(lambda: s5(iou, labels), bar_scalar, args.iters)
    print(f"s5 greedy NMS: {t5*1e3:.2f} ms", flush=True)

    # stage 6: bit-pack for readback — production H-pack vs the old
    # W-axis jnp.packbits (lane-shuffle lowering) for reference
    from s2d_tpu.evaluation.inference import pack_mask_bits

    s6 = jax.jit(pack_mask_bits)
    t6 = timed(lambda: s6(bin_masks), bar_scalar, args.iters)
    print(f"s6 H-pack: {t6*1e3:.2f} ms", flush=True)
    s6w = jax.jit(lambda m: jnp.packbits(m, axis=-1))
    t6w = timed(lambda: s6w(bin_masks), bar_scalar, args.iters)
    print(f"s6 W-packbits (old): {t6w*1e3:.2f} ms", flush=True)

    total = t1 + t2 + t3c + t4 + t5 + t6
    print(f"stage sum: {total*1e3:.2f} ms (full: {t_full*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
