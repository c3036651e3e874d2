#!/usr/bin/env python
"""End-to-end eval-CLI wall-clock at protocol-like shapes (VERDICT r2 #5).

bench.py is device-compute-only; this measures what a user actually waits
for: N synthetic videos on disk (real JPEG decode), the production eval
path (ClipMapper resize -> device upload -> pallas_auto forward ->
postprocess -> packed-mask readback -> RLE encode -> results.json), and
the YTVOS scoring. Reports wall-clock seconds per video and frames/s
END-TO-END, with S2D_PACK_MASKS=0 as the A/B for the packed-readback
default.

  python tools/bench_eval_cli.py [--videos 4] [--t 16] [--hw 720x1280]
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


def build_dataset(root: str, n_videos: int, t: int, h: int, w: int):
    import cv2

    from s2d_tpu.data import register_ytvis, rle

    img_root = os.path.join(root, "frames")
    os.makedirs(img_root, exist_ok=True)
    rng = np.random.RandomState(0)
    videos, annotations = [], []
    for vid in range(1, n_videos + 1):
        files = []
        os.makedirs(os.path.join(img_root, f"v{vid}"), exist_ok=True)
        for fi in range(t):
            name = f"v{vid}/{fi:05d}.jpg"
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_root, name), img)
            files.append(name)
        videos.append({"id": vid, "file_names": files, "height": h,
                       "width": w, "length": t})
        mask = np.zeros((h, w), bool)
        mask[h // 4: h // 2, w // 4: w // 2] = True
        annotations.append({
            "id": vid, "video_id": vid, "category_id": 1,
            "segmentations": [rle.encode(mask)] * t, "iscrowd": 0,
        })
    json_path = os.path.join(root, "val.json")
    with open(json_path, "w") as f:
        json.dump({"videos": videos, "annotations": annotations,
                   "categories": [{"id": 1, "name": "fg"}]}, f)
    register_ytvis("bench_eval_cli", json_path, img_root,
                   class_agnostic=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", default="720x1280",
                    help="original video resolution (resized to "
                    "MIN_SIZE_TEST by the mapper, masks back at full res)")
    ap.add_argument("--root", default="/tmp/bench_eval_cli")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    import shutil

    if os.path.exists(args.root):
        shutil.rmtree(args.root)
    os.makedirs(args.root)
    build_dataset(args.root, args.videos, args.t, h, w)

    from s2d_tpu.config import Config
    from s2d_tpu.evaluation.evaluator import evaluate_dataset
    from s2d_tpu.models import build_model

    cfg = Config()
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(
        cfg, msda_impl="pallas_auto" if on_tpu else None,
        flash_cross_attention=on_tpu,
    )
    model_short = build_model(
        cfg, msda_impl="pallas_auto" if on_tpu else None,
    ) if on_tpu else None
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jax.numpy.zeros((1, 1, 64, 64, 3))
    )

    out_dir = os.path.join(args.root, "out")
    # warmup pass (compile) on one video, then the timed full pass
    evaluate_dataset(cfg, model, variables, "bench_eval_cli",
                     output_dir=out_dir, max_videos=1,
                     model_short=model_short)
    start = time.perf_counter()
    metrics = evaluate_dataset(cfg, model, variables, "bench_eval_cli",
                               output_dir=out_dir,
                               model_short=model_short)
    dt = time.perf_counter() - start
    frames = args.videos * args.t
    stages = {k.split("/", 1)[1]: v for k, v in metrics.items()
              if k.startswith("stage_s/")}
    print(json.dumps({
        "videos": args.videos, "t": args.t, "hw": args.hw,
        "wall_s": round(dt, 2),
        "s_per_video": round(dt / args.videos, 2),
        "e2e_frames_per_s": round(frames / dt, 2),
        "pack_masks": os.environ.get("S2D_PACK_MASKS", "1") != "0",
        "ap": metrics.get("AP"),
        "stage_s": stages,
    }))
    # per-stage attribution (VERDICT r3 #2): stages live on three threads
    # (prefetch / main / finalize) and overlap, so they sum past the wall;
    # the critical path is whichever thread's column nears wall_s
    if stages:
        total = sum(stages.values())
        print("stage attribution (s, threads overlap):", file=sys.stderr)
        for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
            print(f"  {k:22s} {v:8.2f}  ({100*v/max(total,1e-9):4.1f}% of stage-sum)",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
