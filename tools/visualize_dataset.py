#!/usr/bin/env python
"""Render a registered dataset's annotations as overlay PNGs — the manual
smoke check the reference exposes via `ytvis.py.__main__`
(`/root/reference/model_training/mask2former_video/data_video/datasets/
ytvis.py:418-487`) and its debug visualizer.

  python tools/visualize_dataset.py --dataset ytvis_2021_train \
      --output out/ [--max-videos 3]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PALETTE = [
    (220, 20, 60), (0, 82, 0), (119, 11, 32), (0, 0, 142), (0, 0, 230),
    (106, 0, 228), (0, 60, 100), (250, 170, 30), (100, 170, 30),
    (220, 220, 0), (175, 116, 175), (250, 0, 30), (165, 42, 42),
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--max-videos", type=int, default=3)
    args = parser.parse_args(argv)

    import cv2
    import numpy as np

    from s2d_tpu.data import get_dataset
    from s2d_tpu.data.mapper import _decode_segmentation, load_image_robust

    dicts, metadata = get_dataset(args.dataset)
    os.makedirs(args.output, exist_ok=True)
    for record in dicts[: args.max_videos]:
        vid = record["video_id"]
        h, w = record["height"], record["width"]
        for fi, path in enumerate(record["file_names"]):
            frame = load_image_robust(path).astype(np.float32)
            for ni, obj in enumerate(record["annotations"]):
                seg = obj["segmentations"][fi]
                if seg is None:
                    continue
                mask = _decode_segmentation(seg, h, w)
                color = np.asarray(PALETTE[ni % len(PALETTE)], np.float32)
                frame[mask] = 0.5 * frame[mask] + 0.5 * color
            out = os.path.join(args.output, f"v{vid}_f{fi:05d}.png")
            cv2.imwrite(out, cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(f"rendered video {vid} ({len(record['file_names'])} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
