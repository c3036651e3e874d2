"""Device mesh + sharding helpers.

The reference's distributed layer is detectron2 `launch` + torch DDP with
NCCL allreduce (`/root/reference/model_training/train_net_video.py:437-444`,
`mask2former_video/engine/defaults.py:66-85`). TPU-native replacement: one
`jax.sharding.Mesh` with a data axis; the train step is written over the
global batch, parameters are replicated, and XLA inserts the gradient
psums over ICI/DCN — no process-group plumbing, no is_main_process gating
(single-controller semantics).

The mesh also reserves a `model` axis for tensor-parallel extensions; the
reference has no TP/PP/SP (SURVEY.md §2.6) so data=all-devices is the
default layout.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the batch axis over `data`.

    Single-process: `x` is the global batch, device_put scatters it over
    the local data axis. Multi-HOST (jax.process_count() > 1): `x` is this
    process's LOCAL shard of the global batch (the loader already shards
    by process, tools/train_net_video.py), and
    `make_array_from_process_local_data` assembles the global array —
    process shards concatenate in process order along the data axis, so
    the global batch equals the single-process batch when every process
    feeds its `shard_index::num_shards` slice of a shared permutation.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    """Replicate a host tree over every mesh device. Multi-host: every
    process holds the identical full value (same-seed init or the same
    checkpoint), so each leaf is its own process-local copy."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
