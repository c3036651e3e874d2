#!/usr/bin/env python
"""Attribute the round-2 packed-upload anomaly (VERDICT r2, Weak #4).

[transport] measured the PACKED train-mask upload (34.4 MB) SLOWER
end-to-end than the bool upload (275.3 MB): 15.8 vs 13.5 s. This harness
decomposes that path into its stages so the collate_clips(pack_masks)
default is justified by measurement, not assumption:

  1. host-side np.packbits cost (the loader pays this per step);
  2. device_put alone for: bool, packed (minor dim 112), packed padded to
     a 128 multiple, packed flattened 1D, and packed C-order after a
     reshape — separating transfer bytes from device relayout;
  3. the consume chain the train step actually runs: device_put +
     on-device unpackbits + reduce, vs device_put(bool) + reduce.

Barriers: one scalar device->host read per timed block (axon
block_until_ready is enqueue-ack only).
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


def report(name, mb, dt):
    print(f"{name:44s} {mb:9.1f} MB  {dt * 1e3:9.1f} ms  "
          f"{mb / dt / 1e3:7.3f} GB/s", flush=True)


def timed_host(name, fn, iters):
    fn()
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - start) / iters
    report(name, out.nbytes / 1e6, dt)
    return out


def timed_upload(name, arr, iters, consume=None):
    if consume is None:
        consume = jax.jit(lambda x: x.ravel()[:1].astype(jnp.float32).sum())
    x = jax.device_put(arr)
    _ = float(consume(x))
    start = time.perf_counter()
    for _ in range(iters):
        x = jax.device_put(arr)
        _ = float(consume(x))  # completion barrier
    dt = (time.perf_counter() - start) / iters
    report(name, arr.nbytes / 1e6, dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # train target-mask shape of the round-2 bench (B=8, N=25, T=3, 512x896)
    masks = rng.random((8, 25, 3, 512, 896)) > 0.9

    # 1. the host-side packbits the loader pays
    packed = timed_host(
        "host np.packbits", lambda: np.packbits(masks, axis=-1), args.iters
    )

    # 2. upload-only variants
    timed_upload("upload bool (8,25,3,512,896)", masks, args.iters)
    timed_upload("upload packed (...,112)", packed, args.iters)
    pad128 = np.pad(packed, [(0, 0)] * 4 + [(0, 128 - 112)])
    timed_upload("upload packed padded (...,128)", pad128, args.iters)
    timed_upload("upload packed flat 1D", packed.reshape(-1), args.iters)
    timed_upload(
        "upload uint8 full-width (...,896)",
        masks.astype(np.uint8), args.iters,
    )

    # 3. the chain the train step actually runs
    w = masks.shape[-1]
    unpack_consume = jax.jit(
        lambda x: jnp.unpackbits(x, axis=-1, count=w)
        .astype(jnp.bfloat16).sum()
    )
    bool_consume = jax.jit(lambda x: x.astype(jnp.bfloat16).sum())
    timed_upload(
        "chain packed: put+unpackbits+reduce", packed, args.iters,
        consume=unpack_consume,
    )
    timed_upload(
        "chain bool: put+reduce", masks, args.iters, consume=bool_consume
    )


if __name__ == "__main__":
    main()
