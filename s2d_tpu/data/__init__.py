from . import rle
from .augment import ClipAugConfig, augment_clip, resize_shortest_edge
from .loader import collate_clips, test_loader, train_loader
from .mapper import ClipMapper, MapperConfig, dense_frame_selection
from .ytvis import (
    DATASET_REGISTRY,
    get_dataset,
    load_ytvis_json,
    register_builtin,
    register_ytvis,
)

__all__ = [
    "rle",
    "ClipAugConfig",
    "augment_clip",
    "resize_shortest_edge",
    "collate_clips",
    "test_loader",
    "train_loader",
    "ClipMapper",
    "MapperConfig",
    "dense_frame_selection",
    "DATASET_REGISTRY",
    "get_dataset",
    "load_ytvis_json",
    "register_builtin",
    "register_ytvis",
]
