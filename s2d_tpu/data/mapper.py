"""Clip dataset mapper: video dict -> fixed-shape training/eval sample.

Rebuild of the reference `YTVISDatasetMapper` (`/root/reference/
model_training/mask2former_video/data_video/dataset_mapper.py`):

  * training: dense_frame_selection (random window of SAMPLING_FRAME_NUM
    *consecutive* frames in which some instance is annotated throughout,
    lines 223-255), falling back to sparse sampling around a random ref
    frame (256-291); clip-consistent augmentation; per-frame instance
    masks with stable instance ids (absent frame -> empty mask, which the
    criterion's DropLoss then skips — the fixed-shape analog of gt_ids=-1)
  * eval: ALL frames (line 457), resize shortest edge to MIN_SIZE_TEST

Output targets are PADDED to `max_instances` with a validity mask —
everything downstream is fixed-shape.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..config import Config
from . import rle as rle_codec
from .augment import ClipAugConfig, augment_clip


@dataclasses.dataclass
class MapperConfig:
    sampling_frame_num: int = 3
    sampling_frame_range: int = 20
    sampling_frame_shuffle: bool = False
    dense_selection: bool = True
    max_instances: int = 40
    disentangle: bool = False  # second differently-augmented clip for KD
    aug: ClipAugConfig = dataclasses.field(default_factory=ClipAugConfig)

    @classmethod
    def from_config(cls, cfg: Config, is_train: bool = True) -> "MapperConfig":
        inp = cfg.input
        if is_train:
            aug = ClipAugConfig(
                min_sizes=inp.min_size_train,
                max_size=inp.max_size_train,
                crop_enabled=inp.crop.enabled,
                crop_range=tuple(inp.crop.size),
                brightness="brightness" in inp.augmentations,
                contrast="contrast" in inp.augmentations,
                saturation="saturation" in inp.augmentations,
                rotation="rotation" in inp.augmentations,
            )
        else:
            aug = ClipAugConfig(min_sizes=(inp.min_size_test,), max_size=inp.max_size_test)
        return cls(
            sampling_frame_num=inp.sampling_frame_num,
            sampling_frame_range=inp.sampling_frame_range,
            sampling_frame_shuffle=inp.sampling_frame_shuffle,
            dense_selection=inp.dense_annotation_selection,
            disentangle=is_train and inp.disentangle_distillation_loader,
            # targets must fit in the query set (matcher needs N <= Q)
            max_instances=min(40, cfg.model.mask_former.num_object_queries),
            aug=aug,
        )


def dense_frame_selection(
    rng: np.random.RandomState,
    anno_frames: Dict[int, List[int]],  # instance id -> frames with a mask
    video_length: int,
    num_frames: int,
    frame_range: int,
) -> List[int]:
    windows = []
    for frames in anno_frames.values():
        frames = sorted(frames)
        for i in range(len(frames) - num_frames + 1):
            if frames[i + num_frames - 1] - frames[i] == num_frames - 1:
                windows.append(list(range(frames[i], frames[i] + num_frames)))
    if windows:
        return windows[rng.randint(len(windows))]
    return sparse_frame_selection(rng, video_length, num_frames, frame_range)


def sparse_frame_selection(
    rng: np.random.RandomState, video_length: int, num_frames: int, frame_range: int
) -> List[int]:
    ref = rng.randint(video_length)
    lo = max(0, ref - frame_range)
    hi = min(video_length, ref + frame_range + 1)
    candidates = [i for i in range(lo, hi) if i != ref]
    k = min(num_frames - 1, len(candidates))
    picked = list(rng.choice(np.asarray(candidates), k, replace=False)) if k else []
    selected = sorted(picked + [ref])
    while len(selected) < num_frames:  # degenerate short videos: repeat ref
        selected.append(ref)
    return sorted(selected)


def _decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    if seg is None:
        return np.zeros((h, w), bool)
    if isinstance(seg, dict):
        return rle_codec.decode(seg)
    return rle_codec.polygons_to_mask(seg, h, w)


def load_image_robust(path: str, retries: int = 3, backoff: float = 0.5) -> np.ndarray:
    """Read an RGB image with retry + exponential backoff (network
    filesystems flake; reference `load_image_robust`, crw_utils.py:310-347,
    retries with backoff and a PIL fallback)."""
    import time

    last_err: Exception | None = None
    for attempt in range(retries):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        try:
            from PIL import Image

            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"))
        except Exception as err:  # noqa: BLE001
            last_err = err
        time.sleep(backoff * (2 ** attempt))
    raise FileNotFoundError(f"could not read {path!r}: {last_err}")


def load_frames(file_names: List[str]) -> List[np.ndarray]:
    return [load_image_robust(fn) for fn in file_names]


class ClipMapper:
    """Maps a ytvis dataset dict to one fixed-shape sample."""

    def __init__(self, cfg: MapperConfig, is_train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.is_train = is_train
        self.rng = np.random.RandomState(seed)

    def __call__(self, record: dict) -> Optional[dict]:
        cfg = self.cfg
        length = record["length"]
        h, w = record["height"], record["width"]
        annos = record.get("annotations", [])

        if self.is_train:
            anno_frames = {
                o["id"]: [i for i, s in enumerate(o["segmentations"]) if s is not None]
                for o in annos
            }
            anno_frames = {k: v for k, v in anno_frames.items() if v}
            if cfg.dense_selection and anno_frames:
                selected = dense_frame_selection(
                    self.rng, anno_frames, length,
                    cfg.sampling_frame_num, cfg.sampling_frame_range,
                )
            else:
                selected = sparse_frame_selection(
                    self.rng, length, cfg.sampling_frame_num, cfg.sampling_frame_range
                )
        else:
            selected = list(range(length))

        frames = load_frames([record["file_names"][i] for i in selected])

        # instances with any annotation in the selected frames keep a slot
        kept = []
        for o in annos:
            if any(o["segmentations"][i] is not None for i in selected):
                kept.append(o)
        kept = kept[: cfg.max_instances]

        masks = np.zeros((len(kept), len(selected), h, w), bool)
        labels = np.zeros((len(kept),), np.int64)
        for n, o in enumerate(kept):
            labels[n] = o["category_id"]
            for ti, fi in enumerate(selected):
                seg = o["segmentations"][fi]
                if seg is not None:
                    masks[n, ti] = _decode_segmentation(seg, h, w)

        raw_frames = frames
        if self.is_train and cfg.disentangle:
            frames, masks, affines = augment_clip(
                self.rng, frames, masks, cfg.aug, True, return_affines=True
            )
            # second, independently augmented view of the same clip
            # (reference disentangle_distillation_loader,
            #  dataset_mapper.py:461-473); the relative per-frame affine
            #  maps PRIMARY pixel coords -> DISTILL pixel coords
            distill_frames, _, distill_affines = augment_clip(
                self.rng, raw_frames, None, cfg.aug, True, return_affines=True
            )
            rel = np.stack(
                [
                    da @ np.linalg.inv(pa)
                    for da, pa in zip(distill_affines, affines)
                ]
            ).astype(np.float32)
        else:
            frames, masks = augment_clip(self.rng, frames, masks, cfg.aug, self.is_train)
            distill_frames, rel = None, None
        t = len(frames)
        nh, nw = frames[0].shape[:2]

        n_pad = cfg.max_instances
        masks_padded = np.zeros((n_pad, t, nh, nw), bool)
        valid = np.zeros((n_pad,), bool)
        labels_padded = np.zeros((n_pad,), np.int64)
        if masks is not None and masks.shape[0]:
            k = masks.shape[0]
            masks_padded[:k] = masks
            valid[:k] = True
            labels_padded[:k] = labels[:k]

        sample = {
            "video_id": record["video_id"],
            # eval keeps the augment chain's uint8 (resize-only) so the
            # device upload is 1 byte/px; preprocess_clip casts on device.
            # Train casts to f32 for the host-side collate normalize.
            "image": (
                np.stack(frames).astype(np.float32)
                if self.is_train
                else np.stack(frames)
            ),  # (T, H, W, 3)
            "masks": masks_padded,
            "valid": valid,
            "labels": labels_padded,
            "height": record["height"],
            "width": record["width"],
            "selected_idx": selected,
        }
        if distill_frames is not None:
            sample["distill_image"] = np.stack(distill_frames).astype(np.float32)
            sample["distill_affine"] = rel  # (T, 3, 3) primary -> distill px
        return sample
