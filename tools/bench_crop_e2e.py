#!/usr/bin/env python
"""End-to-end A/B of the bbox-crop mask transport on a model that
actually LOCALIZES (VERDICT r4 #1 "Done" criterion).

bench_eval_cli's random-init masks span the canvas, so its crop path
correctly falls back and the e2e number cannot show the win. This bench
makes the scenario real: it trains the production-scale model for a few
hundred steps THROUGH the real CLI on a synthetic colored-rectangles
YTVIS dataset (the ab_convergence task, but through the full
mapper/normalization pipeline), then runs the real eval CLI path twice
on protocol-shaped videos — S2D_CROP_MASKS=1 vs =0 — and reports e2e
frames/s, the per-stage attribution, and how many videos engaged the
crop transport.

  python tools/bench_crop_e2e.py [--train-steps 300] [--videos 4] [--t 16]
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


def build_rect_dataset(root, name, n_videos, t, h, w, seed):
    """Colored moving rectangles on dim noise, as JPEGs + YTVIS json."""
    import cv2

    from s2d_tpu.data import register_ytvis, rle

    img_root = os.path.join(root, f"frames_{name}")
    os.makedirs(img_root, exist_ok=True)
    rs = np.random.RandomState(seed)
    palette = np.array(
        [[255, 40, 40], [40, 255, 40], [40, 40, 255], [255, 255, 40]],
        np.uint8,
    )
    videos, annotations = [], []
    ann_id = 1
    for vid in range(1, n_videos + 1):
        files = []
        os.makedirs(os.path.join(img_root, f"v{vid}"), exist_ok=True)
        k = rs.randint(1, 4)
        rects = []
        for ni in range(k):
            bh, bw = rs.randint(h // 8, h // 3), rs.randint(w // 8, w // 3)
            y, x = rs.randint(0, h - bh), rs.randint(0, w - bw)
            dy, dx = rs.randint(-3, 4), rs.randint(-3, 4)
            rects.append((bh, bw, y, x, dy, dx, palette[ni % len(palette)]))
        segs = [[] for _ in range(k)]
        for fi in range(t):
            img = (rs.rand(h, w, 3) * 40).astype(np.uint8)
            for ni, (bh, bw, y, x, dy, dx, color) in enumerate(rects):
                yy = int(np.clip(y + dy * fi, 0, h - bh))
                xx = int(np.clip(x + dx * fi, 0, w - bw))
                img[yy:yy + bh, xx:xx + bw] = color
                m = np.zeros((h, w), bool)
                m[yy:yy + bh, xx:xx + bw] = True
                segs[ni].append(rle.encode(m))
            fname = f"v{vid}/{fi:05d}.jpg"
            cv2.imwrite(os.path.join(img_root, fname), img)
            files.append(fname)
        videos.append({"id": vid, "file_names": files, "height": h,
                       "width": w, "length": t})
        for ni in range(k):
            annotations.append({
                "id": ann_id, "video_id": vid, "category_id": 1,
                "segmentations": segs[ni], "iscrowd": 0,
            })
            ann_id += 1
    json_path = os.path.join(root, f"{name}.json")
    with open(json_path, "w") as f:
        json.dump({"videos": videos, "annotations": annotations,
                   "categories": [{"id": 1, "name": "fg"}]}, f)
    register_ytvis(name, json_path, img_root, class_agnostic=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=300)
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", default="720x1280")
    ap.add_argument("--root", default="/tmp/bench_crop_e2e")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse --root's existing checkpoint")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import train_net_video

    os.makedirs(args.root, exist_ok=True)
    # small frames for TRAINING throughput; protocol frames for eval
    build_rect_dataset(args.root, "crop_e2e_train", 8, 4, 360, 640, seed=1)
    build_rect_dataset(args.root, "crop_e2e_val", args.videos, args.t, h, w,
                       seed=2)

    out_dir = os.path.join(args.root, "out")
    if not args.skip_train:
        rc = train_net_video.main([
            "SOLVER.MAX_ITER", str(args.train_steps),
            "SOLVER.IMS_PER_BATCH", "1",
            "SOLVER.CHECKPOINT_PERIOD", str(args.train_steps),
            "DATASETS.TRAIN", "('crop_e2e_train',)",
            "INPUT.SAMPLING_FRAME_NUM", "2",
            "OUTPUT_DIR", out_dir,
        ])
        assert rc == 0

    # load the trained student back the same way --resume does
    from s2d_tpu.checkpoint import latest_step, restore_checkpoint
    from s2d_tpu.config import Config
    from s2d_tpu.evaluation import inference
    from s2d_tpu.evaluation.evaluator import evaluate_dataset
    from s2d_tpu.models import build_model
    from s2d_tpu.train import TrainState, build_optimizer

    import jax.numpy as jnp

    cfg = Config()
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(
        cfg, msda_impl="pallas_auto" if on_tpu else None,
        flash_cross_attention=on_tpu,
    )
    model_short = build_model(
        cfg, msda_impl="pallas_auto" if on_tpu else None,
    ) if on_tpu else None
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3))
    )
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    step = latest_step(ckpt_dir)
    assert step is not None, f"no checkpoint under {ckpt_dir}"
    tx = build_optimizer(cfg, variables)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=variables,
        teacher_params=jax.tree_util.tree_map(jnp.copy, variables),
        opt_state=tx.init(variables),
    )
    state = restore_checkpoint(ckpt_dir, state, step)
    print(f"loaded checkpoint step {step}")

    # count crop engagements via a thin spy — patch the INFERENCE module
    # attribute: evaluate_dataset re-imports the symbol from there on
    # every call, so that's the binding it actually uses
    kinds = []
    orig = inference.start_kept_masks_read

    def spy(device_out, keep, boxes=None):
        hdl = orig(device_out, keep, boxes=boxes)
        kinds.append(hdl[0])
        return hdl

    inference.start_kept_masks_read = spy

    report = {}
    for crop_flag in ("1", "0"):
        os.environ["S2D_CROP_MASKS"] = crop_flag
        kinds.clear()
        # warmup (compile), then timed
        evaluate_dataset(cfg, model, state.params, "crop_e2e_val",
                         output_dir=os.path.join(out_dir, f"inf_{crop_flag}"),
                         max_videos=1, model_short=model_short)
        kinds.clear()
        t0 = time.perf_counter()
        metrics = evaluate_dataset(
            cfg, model, state.params, "crop_e2e_val",
            output_dir=os.path.join(out_dir, f"inf_{crop_flag}"),
            model_short=model_short,
        )
        dt = time.perf_counter() - t0
        report[f"crop={crop_flag}"] = {
            "wall_s": round(dt, 2),
            "s_per_video": round(dt / args.videos, 2),
            "e2e_frames_per_s": round(args.videos * args.t / dt, 2),
            "ap": round(metrics.get("AP", 0.0), 4),
            "mask_read_kinds": list(kinds),
            "stage_s": {k.split("/", 1)[1]: v for k, v in metrics.items()
                        if k.startswith("stage_s/")},
        }
        print(json.dumps({f"crop={crop_flag}": report[f"crop={crop_flag}"]}))
    on_ = report["crop=1"]["e2e_frames_per_s"]
    off = report["crop=0"]["e2e_frames_per_s"]
    print(json.dumps({
        "backend": jax.default_backend(),
        "protocol": f"{args.videos}x t={args.t} {args.hw}, "
                    f"{args.train_steps}-step-trained production model",
        "e2e_speedup": round(on_ / max(off, 1e-9), 3),
        "crop_engaged": report["crop=1"]["mask_read_kinds"].count("crops"),
    }))


if __name__ == "__main__":
    main()
