#!/usr/bin/env python
"""Merge per-video keymask JSONs into one dataset — CLI surface of the
reference's `keymask_ident/merge_ytvis_jsons.py`:

  python tools/merge_ytvis_jsons.py --input-dir annotations/ \
      --output dataset.json [--one2x-threshold 2]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--one2x-threshold", type=int, default=None,
                        help="drop tracks whose one2x noise count exceeds this")
    args = parser.parse_args(argv)

    from s2d_tpu.keymask import merge_video_jsons

    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.json")))
    assert paths, f"no JSONs under {args.input_dir!r}"
    merged = merge_video_jsons(paths, one2x_threshold=args.one2x_threshold)
    with open(args.output, "w") as f:
        json.dump(merged, f)
    print(
        f"merged {len(paths)} videos: {len(merged['videos'])} videos, "
        f"{len(merged['annotations'])} annotations -> {args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
