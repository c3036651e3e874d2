"""Optimizer construction: AdamW with d2-style parameter groups.

Reproduces the reference's `build_optimizer` rules (`/root/reference/
model_training/train_net_video.py:134-218` + mask2former defaults):

  * base LR, x backbone_multiplier for backbone parameters
  * weight decay on conv/linear kernels AND biases (torch AdamW default),
    0 on norm parameters (WEIGHT_DECAY_NORM=0) and on embeddings
    (WEIGHT_DECAY_EMBED=0: query_feat / query_embed / level_embed)
  * frozen-BN affines excluded entirely (buffers in d2, never optimized)
  * full-model gradient clipping by global norm BEFORE the step
    (clip_value 0.01, train_net_video.py:188-203)
  * gradient accumulation via optax.MultiSteps (SOLVER.ACCUM_ITER)

Transform order matters for parity with torch AdamW per-group LR: the
per-parameter multiplier is applied AFTER decoupled weight decay so the
backbone multiplier scales both the adam update and the decay term, exactly
like a torch param group with lr = base_lr * multiplier.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from .schedules import warmup_multistep_lr

NORM_SUFFIXES = ("_gn", "_norm", "norm", "norm0", "norm1", "norm2", "norm3")
EMBED_LEAVES = (
    "query_feat", "query_embed", "level_embed",
    # swin: reference no-decay set (d2 swin configs' WEIGHT_DECAY_EMBED
    # names: relative_position_bias_table, absolute_pos_embed)
    "relative_position_bias_table", "absolute_pos_embed",
)


def _path_names(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def label_params(params, frozen_backbone_norms: bool = True) -> Any:
    """Label every leaf: 'frozen' | '<group>_decay' | '<group>_nodecay'
    with group in {backbone, head}.

    `frozen_backbone_norms=True` is the R50-FrozenBN case: backbone norm
    affines are d2 BUFFERS (never optimized). Swin backbones pass False —
    their LayerNorms TRAIN in the reference (build_optimizer excludes only
    FrozenBN; norms get WEIGHT_DECAY_NORM=0), so they label
    backbone_nodecay instead of frozen."""

    def label(path, leaf):
        names = _path_names(path)
        in_backbone = "backbone" in names
        leaf_name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        is_norm_param = parent.endswith(NORM_SUFFIXES) or parent == "norm"
        if in_backbone and is_norm_param and frozen_backbone_norms:
            return "frozen"  # FrozenBN affine = d2 buffer
        if leaf_name in EMBED_LEAVES or is_norm_param:
            return ("backbone_nodecay" if in_backbone else "head_nodecay")
        return "backbone_decay" if in_backbone else "head_decay"

    return jax.tree_util.tree_map_with_path(label, params)


def _tree_multiplier(labels, table: Dict[str, float]):
    return jax.tree_util.tree_map(lambda l: table[l], labels)


def scale_by_tree(multipliers) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        scaled = jax.tree_util.tree_map(
            lambda u, m: u * m, updates, multipliers
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    solver = cfg.solver
    labels = label_params(
        params,
        frozen_backbone_norms="swin" not in cfg.model.backbone.name.lower(),
    )

    lr_mult = _tree_multiplier(
        labels,
        {
            "frozen": 0.0,
            "backbone_decay": solver.backbone_multiplier,
            "backbone_nodecay": solver.backbone_multiplier,
            "head_decay": 1.0,
            "head_nodecay": 1.0,
        },
    )
    decay_mask = jax.tree_util.tree_map(lambda l: l.endswith("_decay"), labels)

    schedule = warmup_multistep_lr(
        solver.base_lr,
        solver.steps,
        solver.gamma,
        solver.warmup_iters,
        solver.warmup_factor,
    )

    chain = [
        optax.clip_by_global_norm(solver.clip_gradients.clip_value)
        if solver.clip_gradients.enabled
        else optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(solver.weight_decay, mask=decay_mask),
        scale_by_tree(lr_mult),
        optax.scale_by_learning_rate(schedule),  # includes the -1 sign
    ]
    tx = optax.chain(*chain)
    if solver.accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=solver.accum_iter)
    return tx
