#!/usr/bin/env python
"""Host<->device transport microbench for the eval/train data paths.

Quantifies what the round-2 transport work changed (PERFORMANCE.md
"Host<->device transport"):

  * upload: eval frames uint8 vs f32 (preprocess_clip now transfers the
    caller's dtype), train target masks packbits-uint8 vs bool
    (collate_clips pack_masks);
  * readback: postprocess masks packed-uint8 vs bool
    (postprocess_video pack_bits).

Each measurement forces completion with a scalar device->host read (the
axon transport's block_until_ready is enqueue-ack only). Prints one line
per case: bytes, seconds, MB/s.

  python tools/bench_transport.py [--iters 5]
  S2D_PLATFORM=cpu python tools/bench_transport.py   # local smoke
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

import jax
import jax.numpy as jnp


def timed_upload(name, arr, iters):
    # warm (allocator, transport setup)
    x = jax.device_put(arr)
    _ = float(jnp.sum(x[..., 0].astype(jnp.float32)))
    start = time.perf_counter()
    for _ in range(iters):
        x = jax.device_put(arr)
        _ = float(x.ravel()[0].astype(jnp.float32))  # completion barrier
    dt = (time.perf_counter() - start) / iters
    mb = arr.nbytes / 1e6
    print(f"upload   {name:28s} {mb:9.1f} MB  {dt * 1e3:8.1f} ms  {mb / dt / 1e3:7.2f} GB/s")


def timed_readback(name, x, iters):
    """jax.Array caches its host copy after the first np.asarray — produce
    a FRESH device array per iteration (one cheap device op) so every
    np.asarray is a real device->host transfer."""

    def fresh():
        if x.dtype == jnp.bool_:
            return jnp.logical_or(x, False)
        return jnp.bitwise_or(x, jnp.zeros((), x.dtype))

    arr = np.asarray(fresh())  # warm (compile the refresh op)
    start = time.perf_counter()
    for _ in range(iters):
        arr = np.asarray(fresh())
    dt = (time.perf_counter() - start) / iters
    mb = arr.nbytes / 1e6
    print(f"readback {name:28s} {mb:9.1f} MB  {dt * 1e3:8.1f} ms  {mb / dt / 1e3:7.2f} GB/s")
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    # eval frame upload at protocol scale (T=8, 360x640)
    frames_u8 = rng.integers(0, 256, (8, 360, 640, 3), dtype=np.uint8)
    timed_upload("eval frames uint8", frames_u8, args.iters)
    timed_upload("eval frames f32 (old)", frames_u8.astype(np.float32), args.iters)

    # train target-mask upload (B=8, N=25, T=3, 512x896)
    masks = rng.random((8, 25, 3, 512, 896)) > 0.9
    timed_upload("train masks packed uint8", np.packbits(masks, axis=-1), args.iters)
    timed_upload("train masks bool (old)", masks, args.iters)

    # postprocess mask readback at protocol scale (50 preds, T=8, 720x1280)
    out_bool = jax.device_put(rng.random((50, 8, 720, 1280)) > 0.5)
    out_packed = jnp.packbits(out_bool, axis=-1)
    _ = float(out_packed.ravel()[0].astype(jnp.float32))
    timed_readback("postproc masks packed", out_packed, args.iters)
    timed_readback("postproc masks bool (old)", out_bool, args.iters)


if __name__ == "__main__":
    main()
