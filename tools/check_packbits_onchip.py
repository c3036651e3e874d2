#!/usr/bin/env python
"""ON-CHIP sanity gate for the bit-packed eval mask readback.

`postprocess_video` ships binarized masks through `pack_mask_bits`
(s2d_tpu/evaluation/inference.py — H-axis weighted-sum packing; W-axis
`jnp.packbits` lowered to a ~60 GB/s cross-lane shuffle). This gate
verifies, on whatever backend jax resolves (intended: the real TPU):

  1. pack_mask_bits vs np.packbits(axis=-2) bit-equality at the eval
     protocol mask shape (50, 8, 720, 1280) and at a ragged HEIGHT
     (H % 8 != 0), with a timing line for the readback;
  2. the full postprocess_video -> finalize_predictions chain equals the
     S2D_PACK_MASKS=0 (unpacked) chain at identical inputs;
  3. jnp.unpackbits vs np.unpackbits at a training target-mask shape
     (the train step unpacks loader-packed targets on device,
     train/trainer.py; loader falls back to pack_masks=False if this
     fails).

Prints ONE JSON line {"ok": bool, "backend": ...}; exit 0 iff ok. If it
fails, run eval/bench with S2D_PACK_MASKS=0.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

import jax
import jax.numpy as jnp

from s2d_tpu.evaluation.inference import (
    finalize_predictions,
    postprocess_video,
)

checks = {}
ok = True


def record(name, passed, detail=""):
    global ok
    checks[name] = {"pass": bool(passed), "detail": detail}
    ok = ok and bool(passed)


def main():
    rng = np.random.default_rng(0)

    from s2d_tpu.evaluation.inference import pack_mask_bits

    # 1. raw H-pack parity, protocol shape + ragged height
    for name, shape in [
        ("hpack_protocol", (50, 8, 720, 1280)),
        ("hpack_ragged", (4, 3, 30, 52)),
    ]:
        bits = rng.random(shape) > 0.5
        t0 = time.perf_counter()
        dev = np.asarray(pack_mask_bits(jnp.asarray(bits)))
        dt = time.perf_counter() - t0
        hpad = (-shape[-2]) % 8
        padded = np.pad(bits, [(0, 0)] * 2 + [(0, hpad), (0, 0)])
        ref = np.packbits(padded, axis=-2)
        record(name, np.array_equal(dev, ref), f"{dt * 1e3:.1f} ms incl. transfer")

    # 1b. unpackbits parity at a training target shape (B,N,T,H,W/8)
    packed_in = rng.integers(0, 256, size=(2, 8, 3, 96, 20), dtype=np.uint8)
    dev_u = np.asarray(
        jnp.unpackbits(jnp.asarray(packed_in), axis=-1, count=157)
    )
    ref_u = np.unpackbits(packed_in, axis=-1, count=157)
    record("unpackbits_train", np.array_equal(dev_u, ref_u))

    # 2. packed vs unpacked postprocess chain, identical inputs
    q, k, t = 12, 1, 4
    logits = jnp.asarray(rng.normal(size=(q, k + 1)), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(q, t, 24, 40)) * 3, jnp.float32)
    kwargs = dict(
        num_predictions=q,
        num_classes=k,
        image_size=(96, 160),
        output_size=(192, 320),
        use_nms=True,
        nms_thresh=0.75,
        compute_dtype=jnp.float32,
    )
    packed = finalize_predictions(
        postprocess_video(logits, masks, pack_bits=True, **kwargs)
    )
    plain = finalize_predictions(
        postprocess_video(logits, masks, pack_bits=False, **kwargs)
    )
    record(
        "postprocess_chain",
        np.array_equal(packed["masks"], plain["masks"])
        and np.array_equal(packed["scores"], plain["scores"])
        and np.array_equal(packed["labels"], plain["labels"]),
    )

    print(
        json.dumps(
            {"ok": ok, "backend": jax.default_backend(), "checks": checks}
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
