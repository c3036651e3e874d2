#!/usr/bin/env python
"""Video inference demo — CLI surface of the reference's
`demo_video/demo.py` (`/root/reference/model_training/demo_video/demo.py`):

  python tools/demo_video.py --config-file cfg.yaml --input 'frames/*.jpg' \
      --output out/ [--confidence-threshold 0.8] [--save-masks] [opts ...]

Whole clip in ONE jit forward (as the reference, demo.py:162-163), top-k +
NMS post-processing, per-frame overlay PNGs with stable per-instance colors
and optional palette mask export (demo.py:119-127).

Multi-video fan-out (the reference AsyncPredictor's one-model-per-GPU
queue, `demo_video/predictor.py:130-218`): when --input's glob matches
DIRECTORIES, each directory is one video (its jpgs sorted), clips are
round-robined over the local devices (`--num-devices` caps how many), the
forwards run concurrently (jax dispatch is async; computation follows the
input's device placement), and overlays finalize in submission order
under `--output/<video-name>/`.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# stable instance palette (RGB), as the reference's TrackVisualizer intent
PALETTE = [
    (220, 20, 60), (0, 82, 0), (119, 11, 32), (0, 0, 142), (0, 0, 230),
    (106, 0, 228), (0, 60, 100), (0, 80, 100), (0, 0, 70), (250, 170, 30),
    (100, 170, 30), (220, 220, 0), (175, 116, 175), (250, 0, 30),
    (165, 42, 42), (255, 77, 255), (0, 226, 252), (182, 182, 255),
]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="s2d_tpu video demo")
    parser.add_argument("--config-file", default="")
    parser.add_argument("--input", default="",
                        help="glob of frame JPEGs (sorted) for one video")
    parser.add_argument("--video-input", default="",
                        help="mp4/video file (alternative to --input)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--confidence-threshold", type=float, default=0.8)
    parser.add_argument("--weights", default="")
    parser.add_argument("--save-frames", action="store_true")
    parser.add_argument("--save-masks", action="store_true")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="cap the local devices used for multi-video "
                             "round-robin (0 = all local devices)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import cv2
    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()  # S2D_PLATFORM=cpu forces XLA:CPU for local drives
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.config import load_config
    from s2d_tpu.checkpoint import load_reference_model
    from s2d_tpu.data.augment import resize_shortest_edge
    from s2d_tpu.evaluation.inference import finalize_predictions, postprocess_video
    from s2d_tpu.models import build_model, preprocess_clip

    cfg = load_config(args.config_file or None, args.opts)
    os.makedirs(args.output, exist_ok=True)

    def load_files(files):
        return [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in files]

    # (name or None, loader thunk) per video — frames decode LAZILY in
    # submit(), so at most len(devices)+1 videos' raw frames are resident
    # (the reference AsyncPredictor streams one clip per worker the same
    # way). name=None -> single-video mode, overlays land at the output
    # root (the original CLI contract).
    videos = []
    if args.video_input:
        def load_video_file(path=args.video_input):
            cap = cv2.VideoCapture(path)
            raw = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                raw.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            cap.release()
            assert raw, f"no frames decoded from {path!r}"
            return raw

        videos.append((None, load_video_file))
    else:
        assert args.input, "provide --input or --video-input"
        matches = sorted(glob.glob(args.input))
        assert matches, f"no frames match {args.input!r}"
        if all(os.path.isdir(m) for m in matches):
            # AsyncPredictor-style fan-out: one video per directory
            for d in matches:
                files = sorted(glob.glob(os.path.join(d, "*.jpg")))
                files += sorted(glob.glob(os.path.join(d, "*.png")))
                assert files, f"no frames under {d!r}"
                videos.append((
                    os.path.basename(d.rstrip("/")),
                    lambda fs=files: load_files(fs),
                ))
            first_frame_path = sorted(
                glob.glob(os.path.join(matches[0], "*.jpg"))
                + glob.glob(os.path.join(matches[0], "*.png"))
            )[0]
        else:
            videos.append((None, lambda fs=matches: load_files(fs)))
            first_frame_path = matches[0]

    def prep(raw):
        oh, ow = raw[0].shape[:2]
        nh, nw = resize_shortest_edge(
            oh, ow, cfg.input.min_size_test, cfg.input.max_size_test
        )
        # stay uint8: preprocess_clip transfers the caller's dtype and
        # casts on device (4x less upload than a host f32 cast)
        frames = np.stack([
            cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
            for f in raw
        ])
        return frames, (nh, nw), (oh, ow)

    # init shape from ONE frame (no full-video decode/resize)
    if args.video_input:
        cap = cv2.VideoCapture(args.video_input)
        ok, f0 = cap.read()
        cap.release()
        assert ok, f"no frames decoded from {args.video_input!r}"
        oh0, ow0 = f0.shape[:2]
    else:
        f0 = cv2.imread(first_frame_path)
        oh0, ow0 = f0.shape[:2]
    nh, nw = resize_shortest_edge(
        oh0, ow0, cfg.input.min_size_test, cfg.input.max_size_test
    )

    on_tpu = jax.default_backend() == "tpu"
    model = build_model(
        cfg,
        msda_impl="pallas_auto" if on_tpu else None,
        flash_cross_attention=on_tpu,
    )
    weights = args.weights or cfg.model.weights
    if weights and os.path.exists(weights):
        variables = load_reference_model(
            weights,
            which="student" if cfg.model.mask_former.test.eval_student else "teacher",
        )
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, nh, nw, 3)))
        if weights:
            print(f"WARNING: weights {weights!r} not found; random init")

    tcfg = cfg.model.mask_former.test

    # normalize/pad trace inside the jit: one uint8 upload + one dispatch
    # per clip instead of an eager per-op chain over the device transport
    # (same fusion as evaluate_dataset; reference demo.py:162-163 runs the
    # whole clip in one forward too)
    def fwd(variables, frames_u8):
        images, _ = preprocess_clip(
            frames_u8, cfg.model.pixel_mean, cfg.model.pixel_std,
            cfg.model.mask_former.size_divisibility,
        )
        return model.apply(variables, images)

    fwd_jit = jax.jit(fwd)

    # round-robin clip placement over the local devices: computation
    # follows the input's device, so video i's forward runs on
    # devices[i % n] while video i+1's frames upload to the next device —
    # the reference AsyncPredictor's one-model-per-GPU queue
    # (predictor.py:130-218) as data placement instead of worker processes
    devices = jax.local_devices()
    if args.num_devices > 0:
        devices = devices[: args.num_devices]
    vars_on = {d: jax.device_put(variables, d) for d in devices} \
        if len(devices) > 1 and len(videos) > 1 else {devices[0]: variables}

    def submit(i, load):
        raw = load()
        frames_i, (ih, iw), (voh, vow) = prep(raw)
        dev = devices[i % len(devices)] if len(vars_on) > 1 else devices[0]
        frames_dev = jax.device_put(frames_i, dev)
        out = fwd_jit(vars_on[dev], frames_dev)
        device_out = postprocess_video(
            out["pred_logits"], out["pred_masks"],
            num_predictions=tcfg.num_predictions,
            num_classes=cfg.model.sem_seg_head.num_classes,
            image_size=(ih, iw), output_size=(voh, vow),
            use_nms=tcfg.use_nms, nms_thresh=tcfg.nms_thresh,
        )
        return device_out, dev, raw

    def write_outputs(name, raw, preds):
        out_dir = (
            args.output if name is None else os.path.join(args.output, name)
        )
        os.makedirs(out_dir, exist_ok=True)
        keep = preds["scores"] >= args.confidence_threshold
        scores, masks = preds["scores"][keep], preds["masks"][keep]
        for ti, frame in enumerate(raw):
            overlay = frame.astype(np.float32)
            for ni in range(len(scores)):
                color = np.asarray(PALETTE[ni % len(PALETTE)], np.float32)
                m = masks[ni, ti]
                overlay[m] = 0.5 * overlay[m] + 0.5 * color
            out_path = os.path.join(out_dir, f"frame_{ti:05d}.png")
            cv2.imwrite(out_path,
                        cv2.cvtColor(overlay.astype(np.uint8), cv2.COLOR_RGB2BGR))
            if args.save_masks:
                idmap = np.zeros(frame.shape[:2], np.uint8)
                for ni in range(len(scores) - 1, -1, -1):
                    idmap[masks[ni, ti]] = ni + 1
                palette_img = np.zeros((*frame.shape[:2], 3), np.uint8)
                for ni in range(len(scores)):
                    palette_img[idmap == ni + 1] = PALETTE[ni % len(PALETTE)]
                cv2.imwrite(
                    os.path.join(out_dir, f"mask_{ti:05d}.png"),
                    cv2.cvtColor(palette_img, cv2.COLOR_RGB2BGR),
                )
        return len(scores)

    start = time.perf_counter()
    # submit up to one clip per device before finalizing in order (jax
    # dispatch is async — the in-flight window keeps every device busy)
    pending = []
    for i, (name, load) in enumerate(videos):
        dev_out_i, dev_i, raw = submit(i, load)
        pending.append((name, raw, dev_out_i, dev_i))
        if len(pending) >= max(len(devices), 1):
            name0, raw0, dev_out0, d0 = pending.pop(0)
            n_inst = write_outputs(name0, raw0, finalize_predictions(dev_out0))
            print(f"[{name0 or 'video'} @ {d0}] {n_inst} instances per frame")
    for name0, raw0, dev_out0, d0 in pending:
        n_inst = write_outputs(name0, raw0, finalize_predictions(dev_out0))
        print(f"[{name0 or 'video'} @ {d0}] {n_inst} instances per frame")
    elapsed = time.perf_counter() - start
    print(f"processed {len(videos)} video(s) on {len(vars_on)} device(s) "
          f"in {elapsed:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
