"""Keymask discovery pipeline throughput on TPU.

Measures the point trackers (the pipeline's hot loop — the reference runs
one CoTracker call per (frame, mask) on GPU; here transitions are batched
on TPU) on a synthetic video at discovery-protocol shapes, reporting
point-frames/sec, plus one end-to-end visibility-extraction pass.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=24)
    ap.add_argument("--hw", default="384x512")
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--neural", action="store_true",
                    help="also time the CoTracker-style neural tracker")
    args = ap.parse_args()

    h, w = (int(x) for x in args.hw.split("x"))
    rng = np.random.RandomState(0)
    video = rng.randint(0, 255, (args.t, h, w, 3)).astype(np.uint8)
    pts = np.stack(
        [rng.uniform(20, w - 20, args.points), rng.uniform(20, h - 20, args.points)],
        axis=1,
    ).astype(np.float32)

    from s2d_tpu.keymask.tracker import CorrelationTracker

    trackers = [("correlation", CorrelationTracker())]
    if args.neural:
        import jax

        from s2d_tpu.keymask.cotracker import CoTrackerNet, CoTrackerTracker

        net = CoTrackerNet()
        params = net.init(
            jax.random.PRNGKey(0),
            np.zeros((2, 96, 128, 3), np.float32),
            np.zeros((8, 2), np.float32),
            0,
        )
        trackers.append(
            ("cotracker(random-init)",
             CoTrackerTracker(params=params, net=net))
        )

    # a second video with the same shape: measures the per-VIDEO cache-miss
    # cost (upload + preprocessing/encoding) without recompilation
    video2 = rng.randint(0, 255, (args.t, h, w, 3)).astype(np.uint8)

    for name, tracker in trackers:
        tracks, vis = tracker.track(video, pts, query_frame=0)  # warmup
        start = time.perf_counter()
        for _ in range(args.iters):
            tracks, vis = tracker.track(video, pts, query_frame=0)
        dt = (time.perf_counter() - start) / args.iters
        start = time.perf_counter()
        tracker.track(video2, pts, query_frame=0)  # per-video cache miss
        dt_miss = time.perf_counter() - start
        pf = args.t * args.points
        print(
            f"{name}: {dt*1e3:.0f} ms/track-call warm "
            f"({pf/dt/1e3:.1f}K point-frames/s), "
            f"{dt_miss*1e3:.0f} ms first-call-per-video  "
            f"vis mean {float(np.mean(vis)):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
