#!/usr/bin/env python
"""Discovery-quality A/B between the keymask point-tracker backends.

VERDICT r2 #8 asks for "a written case for the correlation tracker as the
production default with a quality A/B". The two backends implement the
same PointTracker protocol (`s2d_tpu/keymask/tracker.py` correlation
template tracker vs `s2d_tpu/keymask/cotracker.py` CoTracker-style net);
the reference pipeline's discovery quality depends on tracked-point
visibility/position fidelity (`/root/reference/keymask_ident/
cotracker_occlusions.py:355`, `cotracker_matching.py:1067`).

The experiment: synthetic videos with KNOWN instances — textured patches
moving over a textured background with z-order occlusion — rendered to
the pipeline's real input format (JPEG frames + per-frame color-PNG
pseudo-masks with NO temporal identity: random colors per frame, random
instance dropout like a real per-frame segmenter). Each backend runs the
FULL discovery CLI (tools/keymask_ident.py: visibility -> windows ->
matching -> merge), and the merged dataset is scored against the ground
truth tracks with the repo's own spatio-temporal YTVIS AP
(`s2d_tpu/evaluation/ytvos_eval.py:evaluate_vis`, class-agnostic).

Output: one JSON line per backend {backend, ap, ap50, ar10, wall_s,
n_tracks} + a side-by-side table. Feeds AB_KEYMASK.md.

  S2D_PLATFORM=cpu python tools/ab_keymask_quality.py --out /tmp/abk.json
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_video(rs: np.random.RandomState, t: int, h: int, w: int,
               n_inst: int):
    """Textured moving patches over a textured background.

    Returns (video (T,H,W,3) uint8, gt (N,T,H,W) bool) where gt holds the
    VISIBLE pixels per instance per frame (later z-order wins overlaps —
    matching what a per-frame segmenter would emit)."""
    # low-frequency textured background (tileable noise, upsampled)
    coarse = rs.randint(30, 110, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    bg = np.kron(coarse, np.ones((8, 8, 1), np.uint8))[:h, :w]
    patches, sizes, pos, vel = [], [], [], []
    for _ in range(n_inst):
        ph = rs.randint(h // 5, h // 3)
        pw = rs.randint(w // 5, w // 3)
        tex = np.kron(
            rs.randint(120, 255, (-(-ph // 4), -(-pw // 4), 3), np.uint8),
            np.ones((4, 4, 1), np.uint8),
        )[:ph, :pw]
        patches.append(tex)
        sizes.append((ph, pw))
        pos.append(np.array(
            [rs.randint(0, h - ph), rs.randint(0, w - pw)], float))
        speed = rs.uniform(1.5, 3.5, 2) * rs.choice([-1, 1], 2)
        vel.append(speed)

    video = np.zeros((t, h, w, 3), np.uint8)
    gt = np.zeros((n_inst, t, h, w), bool)
    for fi in range(t):
        frame = bg.copy()
        for ni in range(n_inst):  # later instances draw on top
            ph, pw = sizes[ni]
            y, x = pos[ni]
            # bounce off the borders
            if not (0 <= y <= h - ph):
                vel[ni][0] *= -1
                y = np.clip(y, 0, h - ph)
            if not (0 <= x <= w - pw):
                vel[ni][1] *= -1
                x = np.clip(x, 0, w - pw)
            pos[ni] = np.array([y, x])
            yi, xi = int(round(y)), int(round(x))
            frame[yi:yi + ph, xi:xi + pw] = patches[ni]
            gt[:, fi, yi:yi + ph, xi:xi + pw] = False  # occlude earlier
            gt[ni, fi, yi:yi + ph, xi:xi + pw] = True
            pos[ni] = pos[ni] + vel[ni]
        video[fi] = frame
    return video, gt


def write_inputs(root: str, videos, rs: np.random.RandomState,
                 dropout: float):
    """Render videos to the pipeline's input tree. Pseudo-masks carry NO
    temporal identity: random color per (instance, frame), and each
    instance's mask is dropped with prob `dropout` per frame."""
    import cv2

    frames_root = os.path.join(root, "frames")
    masks_root = os.path.join(root, "masks")
    for vi, (video, gt) in enumerate(videos):
        name = f"vid{vi}"
        os.makedirs(os.path.join(frames_root, name), exist_ok=True)
        os.makedirs(os.path.join(masks_root, name), exist_ok=True)
        t = len(video)
        for fi in range(t):
            cv2.imwrite(
                os.path.join(frames_root, name, f"{fi:05d}.jpg"),
                cv2.cvtColor(video[fi], cv2.COLOR_RGB2BGR),
            )
            png = np.zeros_like(video[fi])
            for ni in range(gt.shape[0]):
                if not gt[ni, fi].any() or rs.rand() < dropout:
                    continue
                color = rs.randint(40, 255, 3)
                png[gt[ni, fi]] = color
            cv2.imwrite(
                os.path.join(masks_root, name, f"{fi:05d}.png"),
                cv2.cvtColor(png, cv2.COLOR_RGB2BGR),
            )
    return frames_root, masks_root


def gt_annotations(videos, video_ids):
    from s2d_tpu.data import rle as rle_codec

    anns = []
    for (video, gt), vid in zip(videos, video_ids):
        for ni in range(gt.shape[0]):
            segs = []
            for fi in range(len(video)):
                m = gt[ni, fi]
                segs.append(rle_codec.encode(m) if m.any() else None)
            if any(s is not None for s in segs):
                anns.append({
                    "video_id": vid, "category_id": 1,
                    "segmentations": segs, "iscrowd": 0,
                })
    return anns


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--hw", default="96x128")
    ap.add_argument("--instances", type=int, default=3)
    ap.add_argument("--dropout", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backends", default="correlation,cotracker")
    ap.add_argument("--grid-size", type=int, default=16)
    ap.add_argument("--work-dir", default="/tmp/ab_keymask")
    ap.add_argument("--out", default="/tmp/ab_keymask.json")
    args = ap.parse_args(argv)

    from s2d_tpu.utils import jax_setup
    jax_setup.setup_runtime()

    import keymask_ident  # tools/ sibling

    from s2d_tpu.evaluation.ytvos_eval import evaluate_vis

    h, w = (int(x) for x in args.hw.split("x"))
    rs = np.random.RandomState(args.seed)
    videos = [
        make_video(rs, args.t, h, w, args.instances)
        for _ in range(args.videos)
    ]
    if os.path.isdir(args.work_dir):
        shutil.rmtree(args.work_dir)
    frames_root, masks_root = write_inputs(
        args.work_dir, videos, rs, args.dropout)

    results = {}
    for backend in args.backends.split(","):
        out_root = os.path.join(args.work_dir, f"out_{backend}")
        t0 = time.time()
        rc = keymask_ident.main([
            "--frames-root", frames_root,
            "--masks-root", masks_root,
            "--output-root", out_root,
            "--tracker", backend,
            "--grid-size", str(args.grid_size),
            "--dbscan-min-samples", "2",
            "--matching-threshold", "0.3",
            "--merge",
        ])
        wall = time.time() - t0
        assert rc == 0
        with open(os.path.join(out_root, "dataset.json")) as f:
            ds = json.load(f)
        # discovered video_id -> position in our `videos` list (dataset
        # file_names are "vidN/xxxxx.jpg")
        vid_of = {
            v["id"]: int(v["file_names"][0].split("/")[0][3:])
            for v in ds["videos"]
        }
        preds = [
            {
                "video_id": vid_of[a["video_id"]],
                "category_id": 1,
                "score": float(a.get("coverage", 1.0)),
                "segmentations": a["segmentations"],
            }
            for a in ds["annotations"]
        ]
        gts = gt_annotations(videos, list(range(len(videos))))
        metrics = evaluate_vis(gts, preds, use_cats=False)
        results[backend] = {
            "ap": round(metrics["AP"], 4),
            "ap50": round(metrics["AP50"], 4),
            "ap75": round(metrics["AP75"], 4),
            "ar10": round(metrics["AR10"], 4),
            "n_tracks": len(preds),
            "n_gt": len(gts),
            "wall_s": round(wall, 1),
        }
        print(f"[{backend}] {results[backend]}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
