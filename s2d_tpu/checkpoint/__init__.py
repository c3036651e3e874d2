from .torch_import import (
    convert_reference_network,
    detect_layout,
    extract_network,
    load_reference_model,
    load_torch_checkpoint,
)
from .orbax_io import (
    duplicate_to_student_teacher,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    CheckpointWriter,
)

__all__ = [
    "convert_reference_network",
    "detect_layout",
    "extract_network",
    "load_reference_model",
    "load_torch_checkpoint",
    "duplicate_to_student_teacher",
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "CheckpointWriter",
]
