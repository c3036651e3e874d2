#!/usr/bin/env python
"""Keymask discovery pipeline driver — CLI surface of the reference's
`keymask_ident/main_keymask_ident.py`:

  python tools/keymask_ident.py --frames-root DIR --masks-root DIR \
      --output-root DIR [--job-id J --videos-per-job K] [thresholds...]

Per video: visibility extraction -> visibility windows -> temporal
correspondence matching -> YTVIS annotation JSON. Reference behaviors kept:
job-array sharding (`--job-id`/`--videos-per-job`, reference lines 20-35),
skip-if-annotation-exists resume (86-88), per-stage try/except so one
failing video never kills the run (90-142), final success report.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="s2d_tpu keymask discovery")
    parser.add_argument("--frames-root", required=True,
                        help="root of per-video frame folders (JPEG)")
    parser.add_argument("--masks-root", required=True,
                        help="root of per-video per-frame color-PNG masks")
    parser.add_argument("--output-root", required=True)
    parser.add_argument("--job-id", type=int, default=0)
    parser.add_argument("--videos-per-job", type=int, default=-1)
    parser.add_argument("--visibility-threshold", type=float, default=0.3)
    parser.add_argument("--dbscan-min-samples", type=int, default=5,
                        help="visibility-window DBSCAN min_samples "
                             "(reference hardcodes 5)")
    parser.add_argument("--matching-threshold", type=float, default=0.5)
    parser.add_argument("--matching-min-samples", type=int, default=None,
                        help="override the temporal-clustering DBSCAN "
                             "min_samples (default: the reference's "
                             "width-adaptive 3-5 table; tiny synthetic "
                             "runs may need 1)")
    parser.add_argument("--grid-size", type=int, default=50)
    parser.add_argument("--tracker", choices=("correlation", "cotracker"),
                        default="correlation",
                        help="point tracker backend (PointTracker protocol)")
    parser.add_argument("--tracker-checkpoint", default="",
                        help="CoTracker .pth to import (--tracker cotracker)")
    parser.add_argument("--merge", action="store_true",
                        help="after the loop, merge per-video JSONs")
    parser.add_argument("--one2x-threshold", type=int, default=None)
    return parser.parse_args(argv)


def load_video_inputs(args, video_dir: str):
    """Host IO phase: frames + candidate-mask PNGs for one video.

    Split out of process_video so the driver can prefetch the NEXT
    video's IO on a thread while the tracker works on the current one
    (the compute phase is device-bound; this host work is pure cv2)."""
    import cv2

    from s2d_tpu.keymask import load_masks_from_color_png

    name = os.path.basename(video_dir)
    frame_files = sorted(
        glob.glob(os.path.join(video_dir, "*.jpg"))
        + glob.glob(os.path.join(video_dir, "*.png"))
    )
    video = np.stack(
        [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in frame_files]
    )
    t = len(video)

    mask_files = sorted(glob.glob(os.path.join(args.masks_root, name, "*.png")))
    masks_per_frame = []
    overall_ids, frame_of_id, mask_of_id = [], [], {}
    next_overall = 0
    for fi in range(t):
        frame_masks = {}
        if fi < len(mask_files):
            png = cv2.cvtColor(cv2.imread(mask_files[fi]), cv2.COLOR_BGR2RGB)
            for local_id, mask in load_masks_from_color_png(png).items():
                frame_masks[next_overall] = mask
                overall_ids.append(next_overall)
                frame_of_id.append(fi)
                mask_of_id[next_overall] = mask
                next_overall += 1
        masks_per_frame.append(frame_masks)
    return {
        "name": name,
        "frame_files": frame_files,
        "video": video,
        "masks_per_frame": masks_per_frame,
        "overall_ids": overall_ids,
        "frame_of_id": frame_of_id,
        "mask_of_id": mask_of_id,
    }


def process_video(args, video_dir: str, out_json: str, inputs=None) -> None:
    from s2d_tpu.keymask import (
        CorrelationTracker,
        extract_visibility_curves,
        match_candidates,
        match_matrix,
        group_quality,
        temporal_correspondence_clustering,
        visibility_windows,
        write_annotation_for_video,
    )

    if inputs is None:
        inputs = load_video_inputs(args, video_dir)
    name = inputs["name"]
    frame_files = inputs["frame_files"]
    video = inputs["video"]
    masks_per_frame = inputs["masks_per_frame"]
    overall_ids = inputs["overall_ids"]
    frame_of_id = inputs["frame_of_id"]
    mask_of_id = inputs["mask_of_id"]
    t = len(video)

    if args.tracker == "cotracker":
        from s2d_tpu.keymask.cotracker import build_cotracker

        tracker = build_cotracker(args.tracker_checkpoint or None)
    else:
        tracker = CorrelationTracker()

    # 1. visibility curves per seeded mask
    records = extract_visibility_curves(
        video, masks_per_frame, tracker, grid_size=args.grid_size
    )
    curves = np.asarray([r["visibility"] for r in records])

    # 2. visibility windows
    windows = visibility_windows(
        curves,
        threshold=args.visibility_threshold,
        min_samples=args.dbscan_min_samples,
    ) if len(curves) else []

    # 2b. export winner candidate masks (reference keymask_utils.py:70-128)
    from s2d_tpu.keymask.export import save_candidate_masks

    save_candidate_masks(
        os.path.join(args.output_root, "candidates", name),
        windows, records, masks_per_frame,
    )

    # 3. temporal correspondence matching of winner candidates
    candidates = []  # (seed_frame, mask)
    for wrec in windows:
        for row in wrec["winners"]:
            rec = records[row]
            # rec["mask_id"] IS the masks_per_frame key (visibility.py
            # seeds iterate .items()); treating it as a 1-based ordinal
            # here picked the wrong mask for 0-based or sparse key sets
            seed_mask = masks_per_frame[rec["frame"]].get(rec["mask_id"])
            if seed_mask is None:
                # defensive ordinal fallback, bounds-guarded (export.py:34)
                frame_masks = list(masks_per_frame[rec["frame"]].values())
                if 0 <= rec["mask_id"] - 1 < len(frame_masks):
                    seed_mask = frame_masks[rec["mask_id"] - 1]
            if seed_mask is not None:
                candidates.append((rec["frame"], seed_mask))

    all_matches = match_candidates(
        video, tracker, candidates, masks_per_frame,
        matching_threshold=args.matching_threshold,
    )
    mat = match_matrix(all_matches, overall_ids)
    labels = temporal_correspondence_clustering(
        mat, min_samples=args.matching_min_samples
    )
    groups = group_quality(mat, labels, frame_of_id)

    # 4. per-group per-frame masks -> annotation JSON
    group_masks = []
    for group in groups:
        per_frame = [None] * t
        for mid in group["matched_ids"]:
            fi = frame_of_id[mid]
            mask = mask_of_id[overall_ids[mid]]
            per_frame[fi] = mask if per_frame[fi] is None else (per_frame[fi] | mask)
        group_masks.append(per_frame)

    h, w = video.shape[1:3]
    data = write_annotation_for_video(
        video_id=abs(hash(name)) % 10**8,
        file_names=[os.path.join(name, os.path.basename(f)) for f in frame_files],
        height=h, width=w, groups=groups, group_masks=group_masks,
    )
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(data, f)


def main(argv=None):
    args = parse_args(argv)
    from s2d_tpu.utils import jax_setup

    # honors S2D_PLATFORM=cpu + enables the persistent compilation cache
    # (this jax build ignores the JAX_* env vars)
    jax_setup.setup_runtime()
    videos = sorted(
        d for d in glob.glob(os.path.join(args.frames_root, "*")) if os.path.isdir(d)
    )
    if args.videos_per_job > 0:
        lo = args.job_id * args.videos_per_job
        videos = videos[lo : lo + args.videos_per_job]

    pending = []
    skipped = 0
    for video_dir in videos:
        name = os.path.basename(video_dir)
        out_json = os.path.join(args.output_root, "annotations", f"{name}.json")
        if os.path.exists(out_json):
            skipped += 1
        else:
            pending.append((video_dir, out_json))

    # prefetch the NEXT video's host IO (frames + mask PNGs) on a thread
    # while the tracker processes the current one; per-video load errors
    # are carried as values so one bad video never kills the stream
    from s2d_tpu.data.loader import _prefetch

    def loaded():
        for video_dir, out_json in pending:
            try:
                yield video_dir, out_json, load_video_inputs(args, video_dir), None
            except Exception as e:
                yield video_dir, out_json, None, e

    ok, failed = 0, 0
    for video_dir, out_json, inputs, load_err in _prefetch(loaded(), depth=1):
        name = os.path.basename(video_dir)
        try:
            if load_err is not None:
                raise load_err
            process_video(args, video_dir, out_json, inputs=inputs)
            ok += 1
        except Exception:
            failed += 1
            print(f"FAILED {name}:\n{traceback.format_exc()}", file=sys.stderr)

    print(f"keymask_ident: {ok} ok, {failed} failed, {skipped} skipped")

    if args.merge:
        from s2d_tpu.keymask import merge_video_jsons

        paths = glob.glob(os.path.join(args.output_root, "annotations", "*.json"))
        merged = merge_video_jsons(paths, one2x_threshold=args.one2x_threshold)
        out = os.path.join(args.output_root, "dataset.json")
        with open(out, "w") as f:
            json.dump(merged, f)
        print(f"merged {len(paths)} videos -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
