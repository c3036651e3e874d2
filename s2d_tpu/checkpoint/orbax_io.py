"""Native checkpointing (Orbax) + resume logic.

Replaces the reference's forked fvcore Checkpointer (`/root/reference/
model_training/mask2former_video/engine/checkpoint.py`): TrainState
(student params, teacher params, optimizer state, step) is saved as one
Orbax pytree checkpoint; `last_checkpoint` semantics (resume from the most
recent step) come from Orbax's step tracking. The student/teacher key
surgery the reference performs at load time (plain VM2F <-> KD layouts,
checkpoint.py:193-286) is torch-import territory — see torch_import.py's
`extract_network(which=...)`; a KD state is assembled from any plain
network by duplication, and either network can be exported alone.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(directory: str, step: int, state: Any) -> None:
    assert _HAS_ORBAX, "orbax unavailable"
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(directory) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


class CheckpointWriter:
    """Persistent async checkpointer for the train loop.

    `save_checkpoint` opens a fresh CheckpointManager per call and blocks
    until the write completes — fine for one-off exports, but inside the
    loop the device->host gather + disk write stalls training (the
    reference's PeriodicCheckpointer blocks the same way). This writer
    keeps ONE manager with Orbax async checkpointing: `save()` snapshots
    the (immutable) jax arrays and returns; the write happens on Orbax's
    background thread. `wait()`/`close()` at loop end; `max_to_keep`
    bounds disk use.
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        assert _HAS_ORBAX, "orbax unavailable"
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True,
                max_to_keep=max_to_keep,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def latest_step(directory: str) -> Optional[int]:
    if not _HAS_ORBAX or not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(os.path.abspath(directory)) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, state: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `state` (an abstract or concrete
    TrainState). Returns the restored pytree."""
    assert _HAS_ORBAX, "orbax unavailable"
    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def duplicate_to_student_teacher(variables: Any) -> tuple:
    """Plain network variables -> (student, teacher) copies — the analog of
    the reference's modify_checkpoint_keys_for_student_teacher."""
    copy = jax.tree_util.tree_map(np.copy, variables)
    return variables, copy
