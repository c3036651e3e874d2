#!/usr/bin/env python
"""Image inference demo — CLI surface of the reference's
`/root/reference/model_training/demo/demo.py` (d2 VisualizationDemo):

  python tools/demo.py --config-file cfg.yaml --input 'imgs/*.jpg' \
      --output out/ [--task instance|semantic|panoptic] \
      [--confidence-threshold 0.5] [opts ...]

Each image runs one jit forward at T=1 through the shared video model and
is post-processed by the matching image inference head
(s2d_tpu/evaluation/image_inference.py); overlays are written per image.
The reference's --webcam / OpenCV-window modes are out of scope for a
headless TPU host — file output only.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from demo_video import PALETTE  # stable instance/class palette


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="s2d_tpu image demo")
    parser.add_argument("--config-file", default="")
    parser.add_argument("--input", nargs="+", required=True,
                        help="image paths or a single glob pattern")
    parser.add_argument("--output", required=True)
    parser.add_argument("--task", default="instance",
                        choices=["instance", "semantic", "panoptic"])
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--weights", default="")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import cv2
    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()  # S2D_PLATFORM=cpu forces XLA:CPU for local drives
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.config import load_config
    from s2d_tpu.checkpoint import load_reference_model
    from s2d_tpu.data.augment import resize_shortest_edge
    from s2d_tpu.evaluation.image_inference import (
        instance_inference,
        panoptic_inference,
        semantic_inference,
    )
    from s2d_tpu.ops.resize import interpolate_bilinear
    from s2d_tpu.models import build_model, preprocess_clip

    cfg = load_config(args.config_file or None, args.opts)
    os.makedirs(args.output, exist_ok=True)

    files = args.input
    if len(files) == 1 and any(c in files[0] for c in "*?["):
        files = sorted(glob.glob(files[0]))
    assert files, f"no images match {args.input!r}"

    on_tpu = jax.default_backend() == "tpu"
    model = build_model(
        cfg,
        msda_impl="pallas_auto" if on_tpu else None,
        flash_cross_attention=on_tpu,
    )
    weights = args.weights or cfg.model.weights
    variables = None
    num_classes = cfg.model.sem_seg_head.num_classes

    @jax.jit
    def forward(variables, frames_u8):
        # normalize/pad trace here: one uint8 upload + one dispatch per
        # image (same fusion as the evaluator and the video demo)
        images, _ = preprocess_clip(
            frames_u8, cfg.model.pixel_mean, cfg.model.pixel_std,
            cfg.model.mask_former.size_divisibility,
        )
        return model.apply(variables, images)

    for path in files:
        bgr = cv2.imread(path)
        if bgr is None:
            print(f"WARNING: unreadable image {path!r}, skipping")
            continue
        raw = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        oh, ow = raw.shape[:2]
        nh, nw = resize_shortest_edge(
            oh, ow, cfg.input.min_size_test, cfg.input.max_size_test
        )
        frame = cv2.resize(raw, (nw, nh), interpolation=cv2.INTER_LINEAR)
        h, w = nh, nw
        if variables is None:
            if weights and os.path.exists(weights):
                variables = load_reference_model(
                    weights,
                    which="student"
                    if cfg.model.mask_former.test.eval_student else "teacher",
                )
            else:
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(0), jnp.zeros((1, 1, nh, nw, 3))
                )
                if weights:
                    print(f"WARNING: weights {weights!r} not found; random init")

        start = time.perf_counter()
        out = forward(variables, frame[None])  # (1, H, W, 3) uint8
        logits = out["pred_logits"][0]    # (Q, K+1)
        qm = out["pred_masks"][0]         # (Q, 1, Hp/4, Wp/4) mask logits
        pad = (qm.shape[-2] * 4, qm.shape[-1] * 4)
        masks = interpolate_bilinear(qm, pad, precision="default")[:, 0, :h, :w]

        overlay = raw.astype(np.float32)

        def up(m, interp=cv2.INTER_NEAREST):
            return cv2.resize(np.asarray(m, np.uint8), (ow, oh), interpolation=interp)

        if args.task == "instance":
            res = instance_inference(logits, masks, num_classes=num_classes)
            scores = np.asarray(res["scores"])
            keep = scores >= args.confidence_threshold
            order = np.argsort(-scores)
            n = 0
            for qi in order:
                if not keep[qi]:
                    continue
                m = up(res["masks"][qi]).astype(bool)
                color = np.asarray(PALETTE[n % len(PALETTE)], np.float32)
                overlay[m] = 0.5 * overlay[m] + 0.5 * color
                n += 1
            msg = f"{n} instances"
        elif args.task == "semantic":
            sem = np.asarray(jnp.argmax(semantic_inference(logits, masks), axis=0))
            sem = up(sem)
            for c in np.unique(sem):
                color = np.asarray(PALETTE[int(c) % len(PALETTE)], np.float32)
                m = sem == c
                overlay[m] = 0.5 * overlay[m] + 0.5 * color
            msg = f"{len(np.unique(sem))} classes"
        else:  # panoptic
            seg, info = panoptic_inference(logits, masks)
            seg = up(seg)
            ids = [i for i in np.unique(seg) if i != 0]
            for si in ids:
                color = np.asarray(PALETTE[int(si) % len(PALETTE)], np.float32)
                m = seg == si
                overlay[m] = 0.5 * overlay[m] + 0.5 * color
            msg = f"{len(ids)} segments"
        elapsed = time.perf_counter() - start

        out_path = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(overlay.astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(f"{path}: {msg} in {elapsed:.2f}s -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
