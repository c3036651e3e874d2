"""Training schedules: LR, KD/supervised loss-weight, EMA momentum.

Reproduces the reference's schedule semantics as pure functions of the step
(the reference mutates `criterion.weight_dict` and `self.m` imperatively —
`/root/reference/model_training/mask2former_video/engine/train_loop.py:
159-229,754-813`; here every schedule is a jnp-traceable function so the
whole train step stays one jit):

  * WarmupMultiStepLR (d2 default): lr * gamma^(#milestones passed), linear
    warmup over warmup_iters scaled from warmup_factor
  * loss-weight schedulers "linear"/"cosine": supervised weights decay
    weight -> min_weight over [start, end]; kd weights ramp min -> weight
  * one-shot supervised decay at loss_weight_decay_step
  * cosine EMA momentum: m(t) = m_end - (m_end - m_start) *
    (cos(pi * t / t_end) + 1) / 2
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from ..config import Config


def warmup_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 10,
    warmup_factor: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    milestones = jnp.asarray(sorted(steps), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = gamma ** jnp.sum(step >= milestones)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        # d2 WarmupParamScheduler: no damping once step >= warmup_iters
        # (covers warmup_iters == 0, where alpha alone would damp step 0)
        warmup = jnp.where(
            step >= warmup_iters, 1.0, warmup_factor * (1.0 - alpha) + alpha
        )
        return base_lr * decay * warmup

    return schedule


def _schedule_q(step, start, end):
    q = (jnp.asarray(step, jnp.float32) - start) / jnp.maximum(end - start, 1.0)
    return jnp.clip(q, 0.0, 1.0)


def loss_weight_factors(cfg: Config, max_iter: int):
    """Returns fn(step) -> (sup_factor, kd_factor) in [min_frac, 1]."""
    mf = cfg.model.mask_former
    start = float(mf.kd_weight_decay_start)
    end = float(mf.kd_weight_decay_end)
    if end < 0:
        end = float(max_iter)
    sup_min = mf.supervised_min_weight
    kd_min = mf.kd_min_weight
    scheduler = mf.kd_weight_scheduler
    decay_step = float(mf.loss_weight_decay_step)

    def factors(step):
        step_f = jnp.asarray(step, jnp.float32)
        if scheduler == "linear":
            q = _schedule_q(step_f, start, end)
        elif scheduler == "cosine":
            q = (1.0 - jnp.cos(jnp.pi * _schedule_q(step_f, start, end))) / 2.0
        else:
            q = jnp.asarray(0.0)

        if scheduler in ("linear", "cosine"):
            sup = sup_min + (1.0 - sup_min) * (1.0 - q)
            kd = kd_min + (1.0 - kd_min) * q
            if mf.decay_only_supervised_loss:
                kd = jnp.asarray(1.0)
            if mf.decay_only_kd_loss:
                sup = jnp.asarray(1.0)
        else:
            sup = jnp.asarray(1.0)
            kd = jnp.asarray(1.0)

        # one-shot supervised decay (applies from decay_step onward)
        if decay_step > 0:
            sup = jnp.where(step_f >= decay_step, sup * sup_min, sup)
        return sup, kd

    return factors


def ema_momentum_schedule(cfg: Config):
    mf = cfg.model.mask_former
    m_start = mf.ema_momentum
    if not mf.ema_momentum_schedule:
        return lambda step: jnp.asarray(m_start, jnp.float32)
    m_end = mf.ema_momentum_end
    t_end = max(mf.ema_momentum_until_step, 1)

    def schedule(step):
        t = jnp.minimum(jnp.asarray(step, jnp.float32), t_end)
        return m_end - (m_end - m_start) * (jnp.cos(jnp.pi * t / t_end) + 1.0) / 2.0

    return schedule
