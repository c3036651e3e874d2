"""Tensor-parallel parameter shardings over the mesh's `model` axis.

The reference scales with torch DDP only (SURVEY.md §2.6) — every rank
holds the full model. TPU-native scaling wants the option of sharding the
wide layers over ICI instead: this module maps parameter paths to
`PartitionSpec`s in the Megatron MLP pattern

  linear1 (d, ff):  column-parallel  -> P(None, "model"),  bias P("model")
  linear2 (ff, d):  row-parallel     -> P("model", None),  bias replicated

so the FFN pair (the widest matmuls in both the deformable-encoder layers,
d -> 8d, and the decoder FFNs) runs with NO collective between the two
matmuls and one reduce at the end — which XLA's GSPMD partitioner derives
automatically from the input/output shardings; we only annotate the
parameters. Attention projections, convolutions, norms, and embeddings
stay replicated (their per-chip cost is small at s2d scale, and the packed
q/k/v layout would need compute-side reshapes to split soundly).

Use:
    mesh = create_mesh(n_data=4, n_model=2)
    state = shard_train_state(mesh, state)   # params+teacher+Adam moments
    batch = shard_batch(mesh, batch)
    step_fn(state, *batch)                   # jit as usual

DP composes: the batch axis shards over `data` while these specs shard
weights over `model`; gradients psum over `data` exactly as before.
"""
from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-regex -> spec; first match wins, default replicated
_TP_RULES = (
    (re.compile(r"linear1/kernel$"), P(None, "model")),
    (re.compile(r"linear1/bias$"), P("model")),
    (re.compile(r"linear2/kernel$"), P("model", None)),
)


def _path_str(path) -> str:
    return "/".join(str(k.key) for k in path if hasattr(k, "key"))


def tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one parameter. Falls back to replicated whenever
    the sharded dim does not divide evenly (tiny test models)."""
    if n_model <= 1:
        return P()
    s = _path_str(path)
    for rule, spec in _TP_RULES:
        if rule.search(s):
            dims = tuple(spec)
            ok = all(
                leaf.shape[i] % n_model == 0
                for i, ax in enumerate(dims) if ax == "model"
            )
            return spec if ok else P()
    return P()


def param_shardings(mesh: Mesh, params):
    """Tree of NamedShardings matching `params` (TP over `model`)."""
    n_model = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf, n_model)),
        params,
    )


def shard_params(mesh: Mesh, params):
    specs = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, specs)


def shard_train_state(mesh: Mesh, state):
    """Device-put a TrainState: every subtree structurally identical to
    `state.params` (params, teacher_params, Adam mu/nu inside opt_state)
    gets the TP specs; every other leaf is replicated."""
    specs = param_shardings(mesh, state.params)
    pdef = jax.tree_util.tree_structure(state.params)
    rep = NamedSharding(mesh, P())

    def is_param_block(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    def put(x):
        if is_param_block(x):
            return jax.tree_util.tree_map(jax.device_put, x, specs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, state, is_leaf=is_param_block)
