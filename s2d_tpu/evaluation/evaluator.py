"""End-to-end YTVIS evaluator: model -> results.json -> AP table.

Rebuild of the reference `YTVISEvaluator` (`/root/reference/model_training/
mask2former_video/data_video/ytvis_eval.py`): per video, run the whole-clip
forward + post-processing, convert surviving tracks to per-frame COCO RLEs
(`instances_to_coco_json_video:324-361`), dump `results.json`, and score
with the spatio-temporal AP in ytvos_eval.py (class-agnostic by default, as
S2D evaluates with useCats=0).

Multi-host: each host evaluates its shard of videos; merging is a plain
list concat of per-host results (the reference's comm.gather becomes a
file/host-level merge — no collective needed for eval).
"""
from __future__ import annotations

import json
import os
import queue
import time
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from ..config import Config
from ..data import rle as rle_codec
from ..data.mapper import ClipMapper, MapperConfig
from ..data.ytvis import get_dataset
from ..models.meta_arch import preprocess_clip
from .inference import postprocess_video


def predictions_to_results(
    video_id: int, preds: Dict[str, np.ndarray], category_offset: int = 1
) -> List[dict]:
    """Binarized track masks -> results.json entries (per-frame RLE).

    `preds["masks"]` is either a full (n, T, H, W) bool array or the
    paste-free `WindowMasks` from the crop transport — the latter encodes
    straight from each crop (rle.encode_window), identical RLEs at
    O(crop) instead of O(canvas) per frame."""
    from .inference import WindowMasks

    masks = preds["masks"]
    results = []
    if isinstance(masks, WindowMasks):
        for i, (score, label) in enumerate(zip(preds["scores"], preds["labels"])):
            y0, x0 = int(masks.y0[i]), int(masks.x0[i])
            h_i = min(masks.crops.shape[2], masks.height - y0)
            segs = [
                rle_codec.encode_window(
                    frame[:h_i], y0, x0, masks.height, masks.width
                )
                for frame in masks.crops[i]
            ]
            results.append({
                "video_id": int(video_id),
                "score": float(score),
                "category_id": int(label) + category_offset,
                "segmentations": segs,
            })
        return results
    for score, label, track in zip(preds["scores"], preds["labels"], masks):
        segs = [rle_codec.encode(frame) for frame in track]
        results.append(
            {
                "video_id": int(video_id),
                "score": float(score),
                "category_id": int(label) + category_offset,
                "segmentations": segs,
            }
        )
    return results


def collect_gt(dicts: List[dict]) -> List[dict]:
    """Ground-truth track entries for ytvos_eval (category ids 1-based)."""
    gt = []
    for record in dicts:
        for o in record["annotations"]:
            gt.append(
                {
                    "video_id": record["video_id"],
                    "category_id": o["category_id"] + 1,
                    "segmentations": o["segmentations"],
                }
            )
    return gt


def merge_shard_results(output_dir: str, num_shards: int) -> List[dict]:
    """Concatenate per-host shard result files (the reference's comm.gather
    of predictions, `ytvis_eval.py` evaluate(), becomes a file merge)."""
    results: List[dict] = []
    for i in range(num_shards):
        with open(os.path.join(output_dir, f"results_shard{i}.json")) as f:
            results.extend(json.load(f))
    return results


def score_results(
    dataset_name: str, results: List[dict], max_videos: Optional[int] = None
) -> Dict[str, float]:
    """Score an assembled results list (e.g. merged shards) against the
    registered dataset's ground truth."""
    from ..evaluation.ytvos_eval import evaluate_vis

    dicts, _ = get_dataset(dataset_name)
    if max_videos:
        dicts = dicts[:max_videos]
    return evaluate_vis(collect_gt(dicts), results, use_cats=False)


def evaluate_dataset(
    cfg: Config,
    model,
    variables,
    dataset_name: str,
    output_dir: Optional[str] = None,
    max_videos: Optional[int] = None,
    model_short=None,
    num_shards: int = 1,
    shard_index: int = 0,
    time_mesh=None,
) -> Dict[str, float]:
    """--eval-only path: run inference over a registered dataset and score.

    `time_mesh`: a jax Mesh — shard each clip's FRAME axis over the mesh's
    `data` axis so ONE video's forward uses every local chip (sequence
    parallelism; XLA GSPMD inserts the decoder-side gathers). The T-bucket
    padding (multiple of 8) keeps the axis divisible. This is a latency
    layout the reference cannot express (its AsyncPredictor is
    one-GPU-per-video); throughput-oriented runs should instead shard
    VIDEOS across hosts via num_shards.

    `model_short` optionally provides a variant used for clips in the
    T <= 64 buckets: the flash masked cross-attention kernel that bounds
    memory on long videos runs slightly slower than the XLA decoder
    attention wherever the (H, Q, T*sum HW) logits fit comfortably
    (measured: 90.1 vs 79.7 frames/s at T=8, 83.5 vs 78.3 at T=36), so
    the TPU CLI passes a no-flash variant for the short buckets and keeps
    flash for the long tail (MOSE/SA-V whole videos)."""
    from ..evaluation.ytvos_eval import evaluate_vis

    dicts, metadata = get_dataset(dataset_name)
    if max_videos:
        dicts = dicts[:max_videos]
    if num_shards > 1:
        # per-host video shard (reference: d2 InferenceSampler splits the
        # dataset across ranks); metrics returned here cover THIS shard
        # only — merge shard files with merge_shard_results + score_results
        dicts = dicts[shard_index::num_shards]
    mapper = ClipMapper(MapperConfig.from_config(cfg, is_train=False), is_train=False)
    tcfg = cfg.model.mask_former.test

    results: List[dict] = []
    gt_annotations: List[dict] = []

    # jit is essential: un-jitted apply dispatches per-op over the device
    # transport (recompiles per unique (T, H, W) — the compile cache
    # amortizes across the few shape buckets a dataset has). The uint8
    # normalize/pad preprocess is FUSED into the same jit so each video
    # costs ONE host->device upload (uint8 frames) + ONE dispatch instead
    # of ~6 eager-op dispatches (round-4 e2e attribution: the eager
    # preprocess chain dominated the main thread on the TPU tunnel).
    def _make_fwd(m):
        def f(variables, frames_u8, frame_valid):
            images, _ = preprocess_clip(
                frames_u8, cfg.model.pixel_mean, cfg.model.pixel_std,
                cfg.model.mask_former.size_divisibility,
            )
            return m.apply(variables, images, frame_valid=frame_valid)
        return jax.jit(f)

    apply_jit = _make_fwd(model)
    apply_jit_short = (
        _make_fwd(model_short) if model_short is not None else apply_jit
    )
    if time_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(
            variables, NamedSharding(time_mesh, P())
        )

    # Overlap host work with device compute (the reference gets this from
    # d2's worker-process DataLoader + AsyncPredictor):
    #  * frame loading/resizing for video i+1 runs on a prefetch thread
    #    while the device processes video i;
    #  * the device->host readback + RLE encoding of video i's predictions
    #    runs on a finalize thread while video i+1's forward is enqueued
    #    (jax dispatch is async; the bounded queue caps retained HBM).
    from ..data.loader import FinalizeThread, _prefetch
    from .inference import (
        finish_kept_masks_read,
        read_small_bundle,
        start_kept_masks_read,
    )

    # Per-stage wall attribution (VERDICT r3 #2): seconds spent in each
    # stage, keyed by which thread pays them. Stages on different threads
    # overlap, so the stage sums exceed the wall; the PIPELINE bottleneck
    # is whichever single thread's total approaches the wall, and
    # `put_wait` (main thread blocked on the finalize queue) measures how
    # much the readback/encode leg is the critical path.
    stage: Dict[str, float] = {
        "decode_map": 0.0,        # prefetch thread: JPEG read + resize +
        #                           the host->device frame upload (issued
        #                           on the prefetch thread since round 4)
        "preprocess_dispatch": 0.0,  # main: fwd/postprocess enqueue
        "dispatch_fwd": 0.0,      # main: forward-jit call (within above)
        "dispatch_post": 0.0,     # main: postprocess-jit call (within above)
        "put_wait": 0.0,          # main: backpressure from finalize thread
        "readback_small": 0.0,    # finalize: keep/scores/labels transfer —
        #                           the FIRST host read, so the device-
        #                           completion wait rides here
        "readback_masks": 0.0,    # finalize: packed-mask transfer
        "unpack": 0.0,            # finalize: host unpackbits
        "rle_encode": 0.0,        # finalize: counts + COCO string encode
        "score": 0.0,             # main, after the loop: evaluate_vis
    }

    def timed_map():
        for r in dicts:
            t0 = time.perf_counter()
            s = mapper(r)
            frames = np.asarray(s["image"])  # (T, H, W, 3) uint8 at eval
            t, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
            # T-bucketing: zero-pad the clip to a multiple of 8 frames and
            # mask the pad keys out of the decoder — one compile per
            # (bucket, H, W) instead of one per distinct video length
            # (server-side compiles cost tens of minutes on this
            # transport). Host-side uint8 memcpy; normalize/HW-pad happen
            # inside the fwd jit.
            pad_t = -t % 8
            if pad_t:
                frames = np.pad(frames, ((0, pad_t), (0, 0), (0, 0), (0, 0)))
            frame_valid = np.arange(t + pad_t) < t
            # start the host->device upload HERE, on the prefetch thread:
            # device_put is async, so video i+1's frames ride the tunnel
            # while the main thread dispatches video i and the device
            # computes (round-4 e2e attribution: the upload leg was the
            # biggest main-thread term after the fused-preprocess change)
            if time_mesh is not None and (t + pad_t) % time_mesh.shape["data"] == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                frames_dev = jax.device_put(
                    frames, NamedSharding(time_mesh, P("data"))
                )
                valid_dev = jax.device_put(
                    frame_valid, NamedSharding(time_mesh, P("data"))
                )
            else:
                frames_dev = jax.device_put(frames)
                valid_dev = jax.device_put(frame_valid)
            stage["decode_map"] += time.perf_counter() - t0
            yield r, (frames_dev, valid_dev, t, h, w)

    mapped = _prefetch(timed_map(), depth=2)

    # Finalize is TWO pipelined threads, one per device->host round-trip:
    # thread A blocks on the small bundle (the completion barrier, ~fixed
    # tunnel latency), slices the device mask buffer to the survivors and
    # fires its async copy; thread B blocks on that mask transfer, unpacks
    # and RLE-encodes. Serially the two RPCs cost ~2x the fixed latency
    # per video; pipelined, video i's mask read rides the tunnel while
    # video i+1's barrier read does.
    def finalize_masks(video_id, scores, labels, keep, handle):
        preds = {
            "scores": scores[keep],
            "labels": labels[keep],
            # as_window: crop-transport masks stay as crops + offsets and
            # RLE-encode directly (no canvas paste, no O(H*W) scan)
            "masks": finish_kept_masks_read(
                handle, keep, timers=stage, as_window=True
            ),
        }
        t3 = time.perf_counter()
        results.extend(predictions_to_results(video_id, preds))
        stage["rle_encode"] += time.perf_counter() - t3

    fin_masks = FinalizeThread(finalize_masks, depth=2)

    def finalize(video_id, device_out):
        t0 = time.perf_counter()
        scores, labels, keep, boxes = read_small_bundle(device_out)
        stage["readback_small"] += time.perf_counter() - t0
        # boxes upgrade the mask leg to per-survivor bbox crops
        handle = start_kept_masks_read(device_out, keep, boxes=boxes)
        fin_masks.put(video_id, scores, labels, keep, handle)

    fin = FinalizeThread(finalize, depth=2)

    start = time.perf_counter()
    for record, (frames, frame_valid, t, h, w) in mapped:
        t_disp = time.perf_counter()
        fwd = apply_jit_short if frames.shape[0] <= 64 else apply_jit
        out = fwd(variables, frames, frame_valid)
        t_fwd = time.perf_counter()
        stage["dispatch_fwd"] += t_fwd - t_disp
        device_out = postprocess_video(
            out["pred_logits"],
            out["pred_masks"],
            num_frames=t,
            num_predictions=tcfg.num_predictions,
            num_classes=cfg.model.sem_seg_head.num_classes,
            image_size=(h, w),
            output_size=(record["height"], record["width"]),
            use_nms=tcfg.use_nms,
            nms_thresh=tcfg.nms_thresh,
        )
        # start the small-bundle D2H copy NOW (fire-and-forget): the
        # transfer rides the tunnel while the main thread maps/dispatches
        # the next video, so the finalize thread's blocking read (the
        # device-completion barrier) finds the bytes already in flight
        stage["dispatch_post"] += time.perf_counter() - t_fwd
        small = device_out.get("small")
        if small is not None and hasattr(small, "copy_to_host_async"):
            small.copy_to_host_async()
        t_put = time.perf_counter()
        stage["preprocess_dispatch"] += t_put - t_disp
        fin.put(record["video_id"], device_out)
        stage["put_wait"] += time.perf_counter() - t_put
        gt_annotations.extend(collect_gt([record]))
    t_close = time.perf_counter()
    try:
        fin.close()
    finally:
        # flush thread B even when A's flush re-raises (B's close re-raises
        # the same root error if B was the one that failed)
        fin_masks.close()
    stage["put_wait"] += time.perf_counter() - t_close
    elapsed = time.perf_counter() - start

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        name = (
            "results.json" if num_shards == 1
            else f"results_shard{shard_index}.json"
        )
        with open(os.path.join(output_dir, name), "w") as f:
            json.dump(results, f)

    t_score = time.perf_counter()
    metrics = evaluate_vis(gt_annotations, results, use_cats=False)
    stage["score"] = time.perf_counter() - t_score

    metrics["eval_seconds"] = elapsed
    total_frames = sum(d["length"] for d in dicts)
    metrics["frames_per_second"] = total_frames / elapsed if elapsed else 0.0
    # flat float keys so the CLI "{k}: {v:.4f}" printers and float()-ing
    # metric writers keep working
    for k, v in stage.items():
        metrics[f"stage_s/{k}"] = round(v, 3)
    return metrics
