#!/usr/bin/env python
"""Export the whole-clip video inference step as a serialized StableHLO
artifact for serving.

The serving unit is ONE pure function — uint8 frames in, packed
predictions out — covering preprocess (normalize + pad), the full
VideoMaskFormer forward, and the device postprocess (top-k, NMS,
full-resolution bit-packed masks), i.e. everything `evaluate_dataset`
runs per clip (s2d_tpu/evaluation/evaluator.py:197-219). The artifact is
self-contained: `jax.export.deserialize(blob).call(params, frames)`
reproduces the eval pipeline bit-for-bit on the export platform with no
Python model code on the serving side.

The reference has no export/serving story (its demo loads the full
detectron2 stack per process); this is TPU-native deployment surface:
the exported module is the same XLA program the evaluator jits, so
serving == eval by construction.

Layout written to --output:
  module.bin        serialized jax.export artifact (StableHLO + vjp-less)
  params/           orbax checkpoint of the model variables
  manifest.json     shapes/dtypes/protocol settings for the caller

Serving-side consumer (no s2d_tpu imports needed):

    rt = jax.export.deserialize(open("module.bin", "rb").read())
    params = orbax.checkpoint.StandardCheckpointer().restore(
        "<output>/params/0/default")
    out = rt.call(params, frames_uint8)   # shapes per manifest.json
    # out["masks"][i] is prediction i's track, uint8 bit-packed along H:
    # np.unpackbits(out["masks"], axis=-2)[..., :H_out, :] with H_out from
    # manifest output_size; out["keep"] selects the NMS survivors

Notes:
  * exports the portable XLA MSDA formulation (msda_impl="xla"); the
    pallas kernels are runtime-JIT specializations and stay on the
    interactive path.
  * --platform cpu|tpu picks the lowering target; cross-platform
    lowering (export for TPU from a CPU host) is supported by
    jax.export for XLA-only programs like this one.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_serve_fn(cfg, model):
    """frames (T, H, W, 3) uint8 -> device prediction dict (fixed shapes)."""
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import postprocess_video
    from s2d_tpu.models.meta_arch import preprocess_clip

    tcfg = cfg.model.mask_former.test

    def serve(variables, frames):
        t, h, w, _ = frames.shape
        images, _ = preprocess_clip(
            frames, cfg.model.pixel_mean, cfg.model.pixel_std
        )
        out = model.apply(variables, images)
        dev = postprocess_video(
            out["pred_logits"][0],
            out["pred_masks"][0],
            num_predictions=tcfg.num_predictions,
            num_classes=cfg.model.sem_seg_head.num_classes,
            image_size=(h, w),
            output_size=(2 * h, 2 * w),
            use_nms=tcfg.use_nms,
            nms_thresh=tcfg.nms_thresh,
            pack_bits=True,  # env-independent: serving always ships packed
        )
        # serving contract: row i of every output refers to prediction i
        # (score-sorted). The interactive eval path ships masks kept-first
        # with the permutation to cut the device->host slice; that layout
        # is an implementation detail external consumers must not need —
        # restore prediction order on device and drop the transport extras.
        masks = dev["masks"]
        if "order" in dev:
            masks = masks[jnp.argsort(dev["order"])]
        return {
            "scores": dev["scores"],
            "labels": dev["labels"],
            "keep": dev["keep"],
            "masks": masks,
        }

    return serve


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-file", default=None)
    parser.add_argument("--weights", default=None,
                        help="torch .pth/.pkl or orbax dir (default: random init)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--frames", type=int, default=8,
                        help="clip length T baked into the artifact")
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"),
                        help="lowering target (default: current backend)")
    parser.add_argument("--verify", action="store_true",
                        help="deserialize and check against the direct call")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args(argv)

    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from s2d_tpu.checkpoint.orbax_io import save_checkpoint
    from s2d_tpu.checkpoint.torch_import import load_reference_model
    from s2d_tpu.config.loader import load_config
    from s2d_tpu.models import build_model

    cfg = load_config(args.config_file, opts=list(args.opts))
    model = build_model(cfg, msda_impl="xla")

    t, h, w = args.frames, args.height, args.width
    frames_spec = jax.ShapeDtypeStruct((t, h, w, 3), jnp.uint8)
    rng = jax.random.PRNGKey(0)
    init_frames = jnp.zeros((t, h, w, 3), jnp.uint8)

    from s2d_tpu.models.meta_arch import preprocess_clip
    init_images, _ = preprocess_clip(
        init_frames, cfg.model.pixel_mean, cfg.model.pixel_std
    )
    variables = model.init(rng, init_images)
    if args.weights:
        which = (
            "student" if cfg.model.mask_former.test.eval_student else "teacher"
        )
        variables = load_reference_model(args.weights, which=which)
        print(f"loaded {which} weights from {args.weights}")

    serve = build_serve_fn(cfg, model)
    platforms = (args.platform,) if args.platform else None
    print(f"lowering serve fn (T={t}, {h}x{w}, "
          f"platform={args.platform or jax.default_backend()}) ...")
    exported = jexport.export(jax.jit(serve), platforms=platforms)(
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
        ),
        frames_spec,
    )
    blob = exported.serialize()

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "module.bin"), "wb") as f:
        f.write(blob)
    save_checkpoint(os.path.join(args.output, "params"), 0, variables)
    out_tree = jax.eval_shape(serve, variables, frames_spec)
    manifest = {
        "input": {"frames": [t, h, w, 3], "dtype": "uint8"},
        "outputs": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in out_tree.items()
        },
        "output_size": [2 * h, 2 * w],
        "masks_packed_along_h": True,
        "platforms": list(exported.platforms),
        "num_predictions": cfg.model.mask_former.test.num_predictions,
    }
    with open(os.path.join(args.output, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {args.output}: module.bin ({len(blob)/1e6:.1f} MB), "
          f"params/, manifest.json")

    if args.verify:
        rt = jexport.deserialize(blob)
        probe = jax.random.randint(
            jax.random.PRNGKey(1), (t, h, w, 3), 0, 255, jnp.uint8
        )
        got = rt.call(variables, probe)
        want = jax.jit(serve)(variables, probe)
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k
            )
        print("verify: deserialized module matches the direct call")
    return 0


if __name__ == "__main__":
    sys.exit(main())
