"""CutLER (Cascade Mask R-CNN) train-step + inference timing on TPU.

The reference trains CutLER on ImageNet at 8xGPU to produce the round-0
weights; this measures our TPU step at a representative shape to catch
any gather-cliff surprises (ROIAlign and RPN proposal selection are the
suspects)."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--instances", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from s2d_tpu.models.cutler import CutlerConfig, CutlerRCNN
    from s2d_tpu.train.cutler_trainer import (
        CutlerTrainerConfig,
        build_cutler_optimizer,
        make_cutler_train_step,
    )

    s, n = args.size, args.instances
    cfg = CutlerTrainerConfig(
        image_size=s, min_size_train=s, max_instances=n
    )
    model = CutlerRCNN(cfg=cfg.rcnn)
    rng = jax.random.PRNGKey(0)
    image = jax.random.uniform(rng, (1, s, s, 3)) * 255.0
    boxes = jnp.tile(
        jnp.asarray([[10.0, 10.0, 100.0, 100.0]]), (n, 1)
    ) + jax.random.uniform(jax.random.PRNGKey(1), (n, 4)) * 50
    labels = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)
    masks = jax.random.uniform(jax.random.PRNGKey(2), (n, s, s)) > 0.7

    params = jax.jit(model.init)(rng, image)
    tx = build_cutler_optimizer(params, cfg)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_cutler_train_step(model, cfg, tx))

    out = step_fn(params, opt_state, image, boxes, labels, valid, masks)
    _ = float(out[2]["total_loss"])
    start = time.perf_counter()
    for _ in range(args.iters):
        out = step_fn(params, opt_state, image, boxes, labels, valid, masks)
    _ = float(out[2]["total_loss"])
    dt = (time.perf_counter() - start) / args.iters
    print(f"cutler train step ({s}px, {n} inst): {dt*1e3:.0f} ms", flush=True)

    apply_jit = jax.jit(model.apply)
    out = apply_jit(params, image)
    _ = float(out["final_boxes"].ravel()[0])
    start = time.perf_counter()
    for _ in range(args.iters):
        out = apply_jit(params, image)
    _ = float(out["final_boxes"].ravel()[0])
    dt = (time.perf_counter() - start) / args.iters
    print(f"cutler forward ({s}px): {dt*1e3:.0f} ms = {1/dt:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
