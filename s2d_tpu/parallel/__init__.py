from .mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .tp import param_shardings, shard_params, shard_train_state

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "param_shardings",
    "shard_params",
    "shard_train_state",
]
