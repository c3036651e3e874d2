from .inference import finalize_predictions, postprocess_video, unpack_masks
from .ytvos_eval import evaluate_vis, iou_seq
from .evaluator import evaluate_dataset, predictions_to_results

__all__ = [
    "finalize_predictions",
    "postprocess_video",
    "unpack_masks",
    "evaluate_vis",
    "iou_seq",
    "evaluate_dataset",
    "predictions_to_results",
]
