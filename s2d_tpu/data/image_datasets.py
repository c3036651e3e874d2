"""Image datasets as clip sources: COCO-instance pseudo-clips and
semantic-segmentation (ADE20K / Mapillary Vistas style) sets.

Rebuilds of the reference's image-side data plumbing:
  * `CocoClipDatasetMapper` (`/root/reference/model_training/
    mask2former_video/data_video/dataset_mapper.py:593`) replicates a still
    image into a fake clip so image datasets can train the video model.
    Here that is a record-level adapter (`coco_to_clip_record`) feeding the
    ordinary `ClipMapper` — one mapper, one collate path.
  * MaskFormer semantic mappers + `register_*_sem_seg` registrations
    (`mask2former/data/dataset_mappers/mask_former_semantic_dataset_mapper.py`,
    `data/datasets/register_ade20k_full.py`, `register_mapillary_vistas.py`):
    a label-PNG is converted to per-present-class binary masks — the
    mask-classification target format — replicated across the fake clip.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .coco import get_coco_dataset
from .mapper import ClipMapper, MapperConfig, load_image_robust
from .rle import polygons_to_mask
from .ytvis import datasets_root

SEM_SEG_REGISTRY: Dict[str, dict] = {}

_PREDEFINED_SEM_SEG = {
    # name: (image_root, gt_root, image_ext, gt_ext, num_classes)
    "ade20k_sem_seg_train": ("ADEChallengeData2016/images/training",
                             "ADEChallengeData2016/annotations_detectron2/training",
                             ".jpg", ".png", 150),
    "ade20k_sem_seg_val": ("ADEChallengeData2016/images/validation",
                           "ADEChallengeData2016/annotations_detectron2/validation",
                           ".jpg", ".png", 150),
    "mapillary_vistas_sem_seg_train": ("mapillary_vistas/training/images",
                                       "mapillary_vistas/training/labels",
                                       ".jpg", ".png", 65),
    "mapillary_vistas_sem_seg_val": ("mapillary_vistas/validation/images",
                                     "mapillary_vistas/validation/labels",
                                     ".jpg", ".png", 65),
}


def coco_to_clip_record(record: dict, clip_len: int) -> dict:
    """COCO image record (data/coco.py) -> YTVIS-style clip record whose
    frames are the same image repeated clip_len times; every annotation's
    mask is replicated per frame (reference CocoClipDatasetMapper)."""
    h, w = record["height"], record["width"]
    objs = []
    for i, ann in enumerate(record.get("annotations", [])):
        seg = ann.get("segmentation")
        x0, y0, x1, y1 = ann["bbox"]
        objs.append({
            "id": i + 1,
            "category_id": ann["category_id"],
            "segmentations": [seg] * clip_len,
            "bboxes": [[x0, y0, x1 - x0, y1 - y0]] * clip_len,
            "areas": [None] * clip_len,
        })
    return {
        "video_id": record.get("image_id", 0),
        "file_names": [record["file_name"]] * clip_len,
        "height": h,
        "width": w,
        "length": clip_len,
        "annotations": objs,
    }


class CocoClipMapper(ClipMapper):
    """ClipMapper over COCO image records (still image -> pseudo-clip)."""

    def __call__(self, record: dict) -> Optional[dict]:
        return super().__call__(
            coco_to_clip_record(record, self.cfg.sampling_frame_num)
        )


# -------------------------------------------------------------- semantic

def register_sem_seg(
    name: str,
    image_root: str,
    gt_root: str,
    image_ext: str = ".jpg",
    gt_ext: str = ".png",
    num_classes: int = 150,
    ignore_label: int = 255,
) -> None:
    SEM_SEG_REGISTRY[name] = {
        "image_root": image_root, "gt_root": gt_root,
        "image_ext": image_ext, "gt_ext": gt_ext,
        "num_classes": num_classes, "ignore_label": ignore_label,
    }


def register_builtin_sem_seg(root: Optional[str] = None) -> None:
    root = root or datasets_root()
    for name, (ir, gr, ie, ge, nc) in _PREDEFINED_SEM_SEG.items():
        register_sem_seg(name, os.path.join(root, ir), os.path.join(root, gr),
                         ie, ge, nc)


def load_sem_seg(
    image_root: str,
    gt_root: str,
    image_ext: str = ".jpg",
    gt_ext: str = ".png",
) -> List[dict]:
    """Pair image files with same-stem label PNGs (d2 load_sem_seg)."""
    stems = sorted(
        f[: -len(gt_ext)] for f in os.listdir(gt_root) if f.endswith(gt_ext)
    )
    return [
        {
            "file_name": os.path.join(image_root, s + image_ext),
            "sem_seg_file_name": os.path.join(gt_root, s + gt_ext),
        }
        for s in stems
    ]


def get_sem_seg_dataset(name: str) -> Tuple[List[dict], dict]:
    if name not in SEM_SEG_REGISTRY:
        register_builtin_sem_seg()
    if name not in SEM_SEG_REGISTRY:
        raise KeyError(
            f"Unknown dataset {name!r}; registered: {sorted(SEM_SEG_REGISTRY)}"
        )
    info = SEM_SEG_REGISTRY[name]
    dicts = load_sem_seg(info["image_root"], info["gt_root"],
                         info["image_ext"], info["gt_ext"])
    meta = {"num_classes": info["num_classes"],
            "ignore_label": info["ignore_label"],
            "evaluator_type": "sem_seg"}
    return dicts, meta


class SemSegClipMapper:
    """Semantic record -> mask-classification clip sample.

    The label map is decomposed into one binary mask per class present
    (ignore_label dropped) — the MaskFormer semantic target format — and
    the still image is replicated into a pseudo-clip, so the sample is
    collate-compatible with ClipMapper's output."""

    def __init__(self, cfg: MapperConfig, ignore_label: int = 255,
                 is_train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.ignore_label = ignore_label
        self.is_train = is_train
        self._clip = ClipMapper(cfg, is_train=is_train, seed=seed)

    def __call__(self, record: dict) -> Optional[dict]:
        import cv2

        try:
            label = cv2.imread(record["sem_seg_file_name"], cv2.IMREAD_GRAYSCALE)
        except Exception:
            return None
        if label is None:
            return None
        h, w = label.shape
        t = self.cfg.sampling_frame_num if self.is_train else 1
        classes = [c for c in np.unique(label) if c != self.ignore_label]
        objs = []
        for i, c in enumerate(classes[: self.cfg.max_instances]):
            from .rle import encode

            objs.append({
                "id": i + 1,
                "category_id": int(c),
                "segmentations": [encode(label == c)] * t,
                "bboxes": [None] * t,
                "areas": [None] * t,
            })
        clip_record = {
            "video_id": record.get("image_id", 0),
            "file_names": [record["file_name"]] * t,
            "height": h,
            "width": w,
            "length": t,
            "annotations": objs,
        }
        return self._clip(clip_record)


# -------------------------------------------------------------- panoptic

PANOPTIC_REGISTRY: Dict[str, dict] = {}

_PREDEFINED_PANOPTIC = {
    # name: (image_root, panoptic_root, panoptic_json)
    "coco_2017_train_panoptic": (
        "coco/train2017", "coco/panoptic_train2017",
        "coco/annotations/panoptic_train2017.json"),
    "coco_2017_val_panoptic": (
        "coco/val2017", "coco/panoptic_val2017",
        "coco/annotations/panoptic_val2017.json"),
    "ade20k_panoptic_train": (
        "ADEChallengeData2016/images/training",
        "ADEChallengeData2016/ade20k_panoptic_train",
        "ADEChallengeData2016/ade20k_panoptic_train.json"),
    "ade20k_panoptic_val": (
        "ADEChallengeData2016/images/validation",
        "ADEChallengeData2016/ade20k_panoptic_val",
        "ADEChallengeData2016/ade20k_panoptic_val.json"),
}


def rgb2id(color: np.ndarray) -> np.ndarray:
    """Panoptic-PNG RGB -> segment id (public panopticapi convention:
    id = R + G*256 + B*256^2)."""
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def register_panoptic(
    name: str, image_root: str, panoptic_root: str, panoptic_json: str
) -> None:
    PANOPTIC_REGISTRY[name] = {
        "image_root": image_root,
        "panoptic_root": panoptic_root,
        "panoptic_json": panoptic_json,
    }


def register_builtin_panoptic(root: Optional[str] = None) -> None:
    root = root or datasets_root()
    for name, (ir, pr, pj) in _PREDEFINED_PANOPTIC.items():
        register_panoptic(name, os.path.join(root, ir),
                          os.path.join(root, pr), os.path.join(root, pj))


def get_panoptic_dataset(name: str) -> Tuple[List[dict], dict]:
    """Panoptic records (d2 load_coco_panoptic_json shape):
    {file_name, image_id, pan_seg_file_name, segments_info}."""
    import json

    if name not in PANOPTIC_REGISTRY:
        register_builtin_panoptic()
    if name not in PANOPTIC_REGISTRY:
        raise KeyError(
            f"Unknown dataset {name!r}; registered: {sorted(PANOPTIC_REGISTRY)}"
        )
    info = PANOPTIC_REGISTRY[name]
    with open(info["panoptic_json"]) as f:
        pj = json.load(f)
    image_of = {im["id"]: im for im in pj.get("images", [])}
    dicts = []
    for ann in pj["annotations"]:
        im = image_of.get(ann["image_id"], {})
        dicts.append({
            "image_id": ann["image_id"],
            "file_name": os.path.join(
                info["image_root"],
                im.get("file_name", os.path.splitext(ann["file_name"])[0] + ".jpg"),
            ),
            "pan_seg_file_name": os.path.join(info["panoptic_root"], ann["file_name"]),
            "segments_info": ann["segments_info"],
        })
    meta = {"evaluator_type": "panoptic"}
    return dicts, meta


class PanopticClipMapper:
    """Panoptic record -> mask-classification clip sample.

    Rebuild of the reference's MaskFormerPanopticDatasetMapper
    (`mask2former/data/dataset_mappers/mask_former_panoptic_dataset_mapper.py:83-128`):
    the panoptic PNG decodes to segment ids (rgb2id), each non-crowd
    segment becomes one binary mask labeled with its category_id, and the
    still image is replicated into a pseudo-clip (collate-compatible with
    ClipMapper output)."""

    def __init__(self, cfg: MapperConfig, is_train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.is_train = is_train
        self._clip = ClipMapper(cfg, is_train=is_train, seed=seed)

    def __call__(self, record: dict) -> Optional[dict]:
        import cv2

        bgr = cv2.imread(record["pan_seg_file_name"], cv2.IMREAD_COLOR)
        if bgr is None:
            return None
        seg_ids = rgb2id(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        h, w = seg_ids.shape
        t = self.cfg.sampling_frame_num if self.is_train else 1
        from .rle import encode

        objs = []
        for si in record.get("segments_info", [])[: self.cfg.max_instances]:
            if si.get("iscrowd", 0):
                continue
            m = seg_ids == si["id"]
            if not m.any():
                continue
            objs.append({
                "id": si["id"],
                "category_id": int(si["category_id"]),
                "segmentations": [encode(m)] * t,
                "bboxes": [None] * t,
                "areas": [None] * t,
            })
        clip_record = {
            "video_id": record.get("image_id", 0),
            "file_names": [record["file_name"]] * t,
            "height": h,
            "width": w,
            "length": t,
            "annotations": objs,
        }
        return self._clip(clip_record)
