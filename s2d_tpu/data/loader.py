"""Train/test data loaders: python iterators with thread prefetch.

Replaces the reference's d2 loader builders (`/root/reference/
model_training/mask2former_video/data_video/build.py:142,208`): an infinite
shuffled sampler over dataset dicts, the clip mapper, fixed-shape batch
collation (images padded to a per-batch bucket divisible by
size_divisibility), and background-thread prefetch into host staging
buffers. Multi-host sharding = every host takes its slice of the (seeded)
permutation, the TPU analog of TrainingSampler's rank sharding.
"""
from __future__ import annotations

import itertools
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .mapper import ClipMapper


def _bucket(value: int, multiple: int = 64) -> int:
    return -(-value // multiple) * multiple


def collate_clips(
    samples: List[dict],
    pixel_mean: Sequence[float],
    pixel_std: Sequence[float],
    size_divisibility: int = 32,
    bucket_multiple: int = 64,
    pack_masks: bool = False,
) -> Dict[str, np.ndarray]:
    """Normalize, pad to the common bucketed canvas, stack.

    `pack_masks` bit-packs the target masks along W (np.packbits,
    MSB-first) — the (B, N, T, H, W) bool tensor is the largest array a
    train step uploads, and the step unpacks on device
    (train/trainer.py), cutting the host->device transfer 8x. The
    bucketed canvas W is always a multiple of 8 so no width metadata is
    needed (the step recovers W from the images)."""
    t = samples[0]["image"].shape[0]
    max_h = _bucket(max(s["image"].shape[1] for s in samples), bucket_multiple)
    max_w = _bucket(max(s["image"].shape[2] for s in samples), bucket_multiple)
    max_h = _bucket(max_h, size_divisibility)
    max_w = _bucket(max_w, size_divisibility)

    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    b = len(samples)
    n = samples[0]["masks"].shape[0]
    has_distill = "distill_image" in samples[0]
    if has_distill:
        # fold the distill view into the canvas size BEFORE allocating —
        # the image/mask buffers are the batch's largest arrays
        max_h = max(max_h, _bucket(max(s["distill_image"].shape[1] for s in samples), bucket_multiple))
        max_w = max(max_w, _bucket(max(s["distill_image"].shape[2] for s in samples), bucket_multiple))
    images = np.zeros((b, t, max_h, max_w, 3), np.float32)
    masks = np.zeros((b, n, t, max_h, max_w), bool)
    valid = np.zeros((b, n), bool)
    if has_distill:
        distill = np.zeros((b, t, max_h, max_w, 3), np.float32)
        affine = np.zeros((b, t, 3, 3), np.float32)
    for i, s in enumerate(samples):
        _, h, w, _ = s["image"].shape
        images[i, :, :h, :w] = (s["image"] - mean) / std
        masks[i, :, :, :h, :w] = s["masks"]
        valid[i] = s["valid"]
        if has_distill:
            _, dh, dw, _ = s["distill_image"].shape
            distill[i, :, :dh, :dw] = (s["distill_image"] - mean) / std
            affine[i] = s["distill_affine"]
    if pack_masks:
        masks = np.packbits(masks, axis=-1)
    batch = {"images": images, "masks": masks, "valid": valid}
    if has_distill:
        batch["distill_images"] = distill
        batch["distill_affine"] = affine
    return batch


def train_loader(
    dataset_dicts: List[dict],
    mapper: ClipMapper,
    batch_size: int,
    pixel_mean: Sequence[float],
    pixel_std: Sequence[float],
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
    prefetch: int = 2,
    batch_transform=None,
    pack_masks: bool | None = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite iterator of collated global batches for this host's shard.

    `batch_transform(samples: List[dict]) -> List[dict]` runs on the raw
    sample list before collation — the hook the video copy-paste
    augmentation uses (reference applies it inside run_step on the
    uncollated batch, `mask2former_video/engine/train_loop.py:703`; here
    it runs on the loader thread so the augmentation overlaps device
    compute).

    `pack_masks` defaults from S2D_PACK_MASKS (on unless =0) — the same
    escape hatch as the eval readback, gated on-chip by
    tools/check_packbits_onchip.py."""
    if pack_masks is None:
        pack_masks = os.environ.get("S2D_PACK_MASKS", "1") != "0"
    rng = np.random.RandomState(seed)

    def sample_stream():
        while True:
            order = rng.permutation(len(dataset_dicts))
            order = order[shard_index::num_shards]
            for idx in order:
                s = mapper(dataset_dicts[idx])
                if s is not None:
                    yield s

    def batch_stream():
        stream = sample_stream()
        while True:
            samples = list(itertools.islice(stream, batch_size))
            if batch_transform is not None:
                samples = batch_transform(samples)
            yield collate_clips(
                samples, pixel_mean, pixel_std, pack_masks=pack_masks
            )

    return _prefetch(batch_stream(), prefetch)


def test_loader(
    dataset_dicts: List[dict], mapper: ClipMapper, prefetch: int = 2
) -> Iterator[dict]:
    """One video per item, in order (reference test loader: batch size 1)."""

    def stream():
        for record in dataset_dicts:
            yield mapper(record)

    return _prefetch(stream(), prefetch)


class FinalizeThread:
    """Bounded background consumer for device->host finalize work (the
    readback + encode half of the prefetch/compute/finalize overlap the
    evaluators run).

    Deadlock-safe error path: after the callback raises, the worker keeps
    DRAINING the queue (discarding items) until close(), so a producer
    blocked in put() always wakes; put() re-raises the worker's error
    early, and close() flushes, joins, and re-raises it."""

    _SENTINEL = object()

    def __init__(self, fn, depth: int = 2):
        self._fn = fn
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: list = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                return
            if self._err:
                continue  # failed already: just drain
            try:
                self._fn(*item)
            except BaseException as e:
                self._err.append(e)

    def put(self, *item) -> None:
        if self._err:
            raise self._err[0]
        self._q.put(item)

    def close(self) -> None:
        """Flush remaining work, join, and re-raise any worker error."""
        self._q.put(self._SENTINEL)
        self._thread.join()
        if self._err:
            raise self._err[0]


def _prefetch(it: Iterator, depth: int) -> Iterator:
    if depth <= 0:
        return it
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side — a
            err.append(e)          # swallowed error silently truncates
        finally:                   # the dataset
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()

    def drained():
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    return drained()
