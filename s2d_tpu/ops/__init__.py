from .sampling import grid_sample, point_sample
from .resize import interpolate_bilinear
from .ms_deform_attn import ms_deform_attn
from .nms import mask_iou_matrix, greedy_mask_nms

__all__ = [
    "grid_sample",
    "point_sample",
    "interpolate_bilinear",
    "ms_deform_attn",
    "mask_iou_matrix",
    "greedy_mask_nms",
]
