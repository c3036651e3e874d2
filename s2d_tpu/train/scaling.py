"""Config auto-scaling rules from the reference trainer.

  * `auto_scale_workers` (reference `engine/defaults.py:733-802`, the d2
    "ImageNet in 1h" rule): when REFERENCE_WORLD_SIZE != current chips,
    scale total batch proportionally (keeping per-chip batch constant),
    LR proportionally, iters/warmup/milestones inverse-proportionally.
  * gradient-accumulation LR scale (reference `defaults.py:403-417`):
    BASE_LR *= effective_batch / 2 when ACCUM_ITER > 1 (the reference's
    KD LRs are tuned for an effective batch of 2).
"""
from __future__ import annotations

import dataclasses

from ..config import Config


def auto_scale_workers(cfg: Config, num_workers: int) -> Config:
    old = cfg.solver.reference_world_size
    if old == 0 or old == num_workers:
        return cfg
    assert cfg.solver.ims_per_batch % old == 0, (
        f"IMS_PER_BATCH {cfg.solver.ims_per_batch} not divisible by "
        f"REFERENCE_WORLD_SIZE {old}"
    )
    scale = num_workers / old
    per_chip = cfg.solver.ims_per_batch // old
    solver = dataclasses.replace(
        cfg.solver,
        ims_per_batch=per_chip * num_workers,
        base_lr=cfg.solver.base_lr * scale,
        max_iter=int(round(cfg.solver.max_iter / scale)),
        warmup_iters=int(round(cfg.solver.warmup_iters / scale)),
        steps=tuple(int(round(s / scale)) for s in cfg.solver.steps),
        reference_world_size=num_workers,
    )
    return dataclasses.replace(cfg, solver=solver)


def apply_accum_lr_scale(cfg: Config) -> Config:
    if cfg.solver.accum_iter <= 1:
        return cfg
    effective = cfg.solver.ims_per_batch * cfg.solver.accum_iter
    solver = dataclasses.replace(
        cfg.solver, base_lr=cfg.solver.base_lr * effective / 2.0
    )
    return dataclasses.replace(cfg, solver=solver)
