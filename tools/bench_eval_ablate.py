"""Eval-path component ablation timings (v5e measurement recipe).

Times the flagship inference path (bench.py protocol: R50, T=8 @ 360x640,
720x1280 output) in pieces: full pipeline, forward only, and forward with
the deformable encoder truncated — attributing milliseconds to the MSDA
encoder, the rest of the model, and postprocess. One forced device->host
scalar read per timed block is the completion barrier (axon transport).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, barrier, iters=10):
    fn()  # warmup/compile
    barrier()
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    barrier(out)
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from s2d_tpu.utils import jax_setup

    jax_setup.setup_runtime()

    import dataclasses

    from s2d_tpu.config import Config
    from s2d_tpu.evaluation.inference import postprocess_video
    from s2d_tpu.models import build_model, preprocess_clip

    cfg = Config()
    rng = jax.random.PRNGKey(0)
    frames = jax.random.uniform(rng, (args.t, 360, 640, 3), jnp.float32) * 255.0
    images, (h, w) = preprocess_clip(
        frames, cfg.model.pixel_mean, cfg.model.pixel_std
    )
    tcfg = cfg.model.mask_former.test

    # production eval path: the pallas separable-MXU MSDA kernel with
    # auto orientation (bench.py's default on TPU); S2D_MSDA_IMPL
    # overrides for A/B, S2D_MSDA_IMPL=xla measures the oracle path
    msda = os.environ.get("S2D_MSDA_IMPL") or (
        "pallas_auto" if jax.default_backend() == "tpu" else None
    )
    if msda == "xla":
        msda = None
    print(f"msda_impl: {msda}", flush=True)

    def build(enc_layers=None, dec_layers=None):
        c = cfg
        if enc_layers is not None:
            c = dataclasses.replace(
                c,
                model=dataclasses.replace(
                    c.model,
                    sem_seg_head=dataclasses.replace(
                        c.model.sem_seg_head,
                        transformer_enc_layers=enc_layers,
                    ),
                ),
            )
        if dec_layers is not None:
            c = dataclasses.replace(
                c,
                model=dataclasses.replace(
                    c.model,
                    mask_former=dataclasses.replace(
                        c.model.mask_former, dec_layers=dec_layers
                    ),
                ),
            )
        model = build_model(c, msda_impl=msda)
        variables = jax.jit(model.init)(rng, images[:, :1])
        return model, variables

    model, variables = build()

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images)
        return out["pred_logits"][0], out["pred_masks"][0]

    def full():
        logits, masks = forward(variables, images)
        return postprocess_video(
            logits, masks,
            num_predictions=tcfg.num_predictions,
            num_classes=cfg.model.sem_seg_head.num_classes,
            image_size=(h, w), output_size=(720, 1280),
            use_nms=tcfg.use_nms, nms_thresh=tcfg.nms_thresh,
        )

    def fwd_only():
        return forward(variables, images)

    def bar_full(out=None):
        out = out if out is not None else full()
        return float(out["scores"][0])

    def bar_fwd(out=None):
        out = out if out is not None else fwd_only()
        return float(out[0][0, 0])

    t_full = timed(full, bar_full, args.iters)
    t_fwd = timed(fwd_only, bar_fwd, args.iters)
    print(f"full: {t_full*1e3:.1f} ms  fwd: {t_fwd*1e3:.1f} ms  "
          f"postprocess: {(t_full-t_fwd)*1e3:.1f} ms", flush=True)

    def time_variant(label, **kw):
        m2, v2 = build(**kw)

        @jax.jit
        def fwd2(variables, images, m2=m2):
            out = m2.apply(variables, images)
            return out["pred_logits"][0], out["pred_masks"][0]

        def f2():
            return fwd2(v2, images)

        def bar2(out=None):
            out = out if out is not None else f2()
            return float(out[0][0, 0])

        t2 = timed(f2, bar2, args.iters)
        print(f"fwd {label}: {t2*1e3:.1f} ms", flush=True)
        return t2

    for enc in (0, 3):
        time_variant(f"enc_layers={enc}", enc_layers=enc)

    # decoder-min: dec_layers=1 keeps only the initial prediction head
    # (zero masked-attn rounds) -> default minus this attributes the
    # 9-round video transformer decoder
    time_variant("dec_layers=1", dec_layers=1)
    time_variant("enc=0,dec=1 (backbone+proj+FPN+mask head)",
                 enc_layers=0, dec_layers=1)

    # backbone alone, same frames/dtype as the model's internal call
    from s2d_tpu.models.resnet import ResNet

    compute_dtype = (
        jnp.bfloat16 if cfg.solver.amp.enabled else jnp.float32
    )
    frames_flat = images.reshape(-1, *images.shape[2:]).astype(compute_dtype)
    bb = ResNet(depth=cfg.model.resnets.depth,
                out_features=("res2", "res3", "res4", "res5"))
    bb_vars = jax.jit(bb.init)(rng, frames_flat[:1])

    @jax.jit
    def bb_fwd(v, x):
        return bb.apply(v, x)

    def fbb():
        return bb_fwd(bb_vars, frames_flat)

    def bar_bb(out=None):
        out = out if out is not None else fbb()
        return float(out["res5"][0, 0, 0, 0])

    t_bb = timed(fbb, bar_bb, args.iters)
    print(f"backbone only: {t_bb*1e3:.1f} ms", flush=True)

    fps = args.t / t_full
    print(f"frames/s: {fps:.1f}", flush=True)


if __name__ == "__main__":
    main()
