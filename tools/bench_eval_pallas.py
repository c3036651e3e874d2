"""End-to-end eval-path A/B: XLA MSDA vs the Pallas separable-MXU kernel.

Times the full bench.py protocol with both MSDA impls and checks that the
final postprocessed predictions agree (same top-k ordering, near-identical
masks) — the kernel's bf16 compute is AMP-class noise relative to the f32
XLA path, so agreement is measured at the decision level (binarized mask
IoU + score deltas), not bitwise."""
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

from s2d_tpu.config import Config
from s2d_tpu.evaluation.inference import postprocess_video, unpack_masks
from s2d_tpu.models import build_model, preprocess_clip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = Config()
    rng = jax.random.PRNGKey(0)
    frames = jax.random.uniform(rng, (args.t, 360, 640, 3), jnp.float32) * 255.0
    images, (h, w) = preprocess_clip(frames, cfg.model.pixel_mean, cfg.model.pixel_std)
    tcfg = cfg.model.mask_former.test

    results = {}
    for impl in ("xla", "pallas"):
        model = build_model(cfg, msda_impl=impl)
        variables = jax.jit(model.init)(rng, images[:, :1])

        @jax.jit
        def forward(variables, images, model=model):
            out = model.apply(variables, images)
            return out["pred_logits"][0], out["pred_masks"][0]

        def full():
            logits, masks = forward(variables, images)
            return postprocess_video(
                logits, masks,
                num_predictions=tcfg.num_predictions,
                num_classes=cfg.model.sem_seg_head.num_classes,
                image_size=(h, w), output_size=(720, 1280),
                use_nms=tcfg.use_nms, nms_thresh=tcfg.nms_thresh,
            )

        out = full()
        _ = float(out["scores"][0])
        start = time.perf_counter()
        for _ in range(args.iters):
            out = full()
        _ = float(out["scores"][0])
        dt = (time.perf_counter() - start) / args.iters
        print(f"{impl}: {dt*1e3:.1f} ms/clip = {args.t/dt:.1f} frames/s", flush=True)
        results[impl] = {
            k: np.asarray(v) for k, v in out.items()
        }
        results[impl]["masks"] = unpack_masks(out)

    a, b = results["xla"], results["pallas"]
    score_delta = np.abs(a["scores"] - b["scores"]).max()
    inter = np.logical_and(a["masks"], b["masks"]).sum()
    union = np.logical_or(a["masks"], b["masks"]).sum()
    iou = inter / max(union, 1)
    print(f"score max delta: {score_delta:.2e}  mask IoU (all preds): {iou:.4f}",
          flush=True)
    print(f"labels equal: {(a['labels'] == b['labels']).mean():.3f}  "
          f"keep equal: {(a['keep'] == b['keep']).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
