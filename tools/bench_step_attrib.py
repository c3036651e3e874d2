#!/usr/bin/env python
"""Per-term attribution of the KD train step at CLI defaults (VERDICT r4
weak #1 / r5 #5): split the step into student-fwd / teacher-fwd /
distillation-targets / criterion-pair / backward / optimizer+EMA, each
timed as its own warm jit at the production shapes, so every term of the
~1.05 s step carries a measured number and a floor-or-lever verdict
(PERFORMANCE.md "KD step attribution" table).

Levers measured here:
  --no-remat            grad_checkpoint off (remat trades recompute for
                        memory; batch 1 @ T=3 may not need the memory)
  --bf16-dist-upsample  distillation-target upsample in bf16 (the
                        reference runs this interpolation under fp16
                        autocast, kd_video_maskformer_model.py:441-470,
                        so bf16 is the same noise class — f32 is the
                        rebuild being STRICTER than the reference)

  python tools/bench_step_attrib.py [--steps 3] [--no-remat] [...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()


def timed(fn, *args, iters=3):
    out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])  # warm barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])  # completion
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--t", type=int, default=3)
    ap.add_argument("--hw", default="368x640")
    ap.add_argument("--n-targets", type=int, default=25)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--bf16-dist-upsample", action="store_true")
    args = ap.parse_args()

    from s2d_tpu.config import load_config
    from s2d_tpu.losses.criterion import CriterionConfig, set_criterion_pair
    from s2d_tpu.models.meta_arch import build_model
    from s2d_tpu.train import build_optimizer, make_train_step
    from s2d_tpu.train.trainer import (
        TrainState,
        prepare_distillation_targets,
    )
    from s2d_tpu.train.trainer_defaults import production_msda_impl

    if args.bf16_dist_upsample:
        os.environ["S2D_DIST_UPSAMPLE_BF16"] = "1"

    cfg = load_config(
        "configs/ytvis2021_kd_video_mask2former_R50_cls_agnostic.yaml"
    )
    h, w = (int(x) for x in args.hw.split("x"))
    t, n = args.t, args.n_targets
    mf = cfg.model.mask_former

    student_impl = production_msda_impl(cfg)
    model = build_model(cfg, msda_impl=student_impl,
                        grad_checkpoint=not args.no_remat)
    teacher_model = (
        build_model(cfg, msda_impl=student_impl) if student_impl else model
    )
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).rand(1, t, h, w, 3),
                         jnp.float32)
    tgt_masks = jnp.asarray(np.random.RandomState(1).rand(1, n, t, h, w) > 0.7)
    tgt_valid = jnp.asarray(np.ones((1, n), bool))

    params = jax.jit(model.init)(rng, images[:, :1])
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    float(jax.tree_util.tree_leaves(params)[0].sum())
    print("init done", flush=True)
    pad_hw = (h, w)

    report = {}

    # ---- 1. full production step ----
    step_fn = jax.jit(make_train_step(model, cfg, tx,
                                      teacher_model=teacher_model))
    report["full_step"] = timed(
        lambda: step_fn(state, images, tgt_masks, tgt_valid, rng)[1][
            "total_loss"
        ],
        iters=args.steps,
    )
    print(f"full_step {report['full_step']:.3f}s", flush=True)

    # ---- 2. student forward (train mode, no grad) ----
    k = jax.random.PRNGKey(3)
    stu_fwd = jax.jit(lambda p, x: model.apply(
        p, x, deterministic=False, rngs={"dropout": k}
    )["pred_masks"])
    report["student_fwd"] = timed(stu_fwd, params, images)
    print(f"student_fwd {report['student_fwd']:.3f}s", flush=True)

    # ---- 3. teacher forward + distillation targets ----
    def dist_fn(p, x):
        out = teacher_model.apply(p, x)
        m, v = prepare_distillation_targets(
            out, mf.score_threshold_distillation, pad_hw
        )
        return m.sum() + v.sum()

    report["teacher_fwd_targets"] = timed(jax.jit(dist_fn), params, images)
    teach_fwd = jax.jit(
        lambda p, x: teacher_model.apply(p, x)["pred_masks"]
    )
    report["teacher_fwd"] = timed(teach_fwd, params, images)
    print(f"teacher_fwd {report['teacher_fwd']:.3f}s "
          f"(+targets {report['teacher_fwd_targets']:.3f}s)", flush=True)

    # ---- 4. loss value only (both fwds + criterion pair) ----
    crit_cfg = CriterionConfig(
        num_classes=cfg.model.sem_seg_head.num_classes,
        eos_coef=mf.no_object_weight, cost_class=mf.class_weight,
        cost_mask=mf.mask_weight, cost_dice=mf.dice_weight,
        num_points=mf.train_num_points,
        matcher_num_points=mf.matcher_num_points,
        oversample_ratio=mf.oversample_ratio,
        importance_sample_ratio=mf.importance_sample_ratio,
        masks_only=mf.loss_strategy == "masks-only",
        gather_dtype=jnp.bfloat16 if cfg.solver.amp.enabled else jnp.float32,
        point_sampling=mf.point_sampling,
    )
    import dataclasses

    kd_cfg = dataclasses.replace(
        crit_cfg, masks_only=mf.distillation_loss_strategy == "masks-only"
    )

    def loss_value(p, x, tm, tv):
        out = model.apply(p, x, deterministic=False, rngs={"dropout": k})
        tout = jax.lax.stop_gradient(teacher_model.apply(p, x))
        km, kv = prepare_distillation_targets(
            tout, mf.score_threshold_distillation, pad_hw
        )
        sup, kd = set_criterion_pair(
            jax.random.PRNGKey(5), out, tm, tv, crit_cfg,
            jax.random.PRNGKey(6), out, km, kv, kd_cfg,
            compute_labels_loss=True,
        )
        total = sum(v.astype(jnp.float32) for v in sup.values())
        total = total + sum(v.astype(jnp.float32) for v in kd.values())
        return total

    report["fwd_loss"] = timed(
        jax.jit(loss_value), params, images, tgt_masks, tgt_valid
    )
    print(f"fwd_loss {report['fwd_loss']:.3f}s", flush=True)

    # ---- 5. value_and_grad (adds backward) ----
    vg = jax.jit(jax.value_and_grad(loss_value))
    report["fwd_bwd"] = timed(
        lambda: vg(params, images, tgt_masks, tgt_valid)[0],
        iters=args.steps,
    )
    print(f"fwd_bwd {report['fwd_bwd']:.3f}s", flush=True)

    # ---- 5b. model-only backward (surrogate loss = sum of outputs):
    # isolates the network fwd+bwd from the criterion's backward ----
    def model_only_loss(p, x):
        out = model.apply(p, x, deterministic=False, rngs={"dropout": k})
        return (
            out["pred_masks"].astype(jnp.float32).sum()
            + out["pred_logits"].astype(jnp.float32).sum()
        )

    vg_model = jax.jit(jax.value_and_grad(model_only_loss))
    report["model_fwd_bwd"] = timed(
        lambda: vg_model(params, images)[0], iters=args.steps
    )
    print(f"model_fwd_bwd {report['model_fwd_bwd']:.3f}s", flush=True)

    # ---- 6. optimizer + EMA on a grads-shaped tree ----
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def opt_fn(g, st):
        updates, opt_state = tx.update(g, st.opt_state, st.params)
        import optax

        new_p = optax.apply_updates(st.params, updates)
        teacher = jax.tree_util.tree_map(
            lambda tp, sp: 0.999 * tp + 0.001 * sp.astype(tp.dtype),
            st.teacher_params, new_p,
        )
        return jax.tree_util.tree_leaves(teacher)[0].sum()

    report["opt_ema"] = timed(jax.jit(opt_fn), grads, state)
    print(f"opt_ema {report['opt_ema']:.3f}s", flush=True)

    # derived terms
    report["derived"] = {
        "backward": round(report["fwd_bwd"] - report["fwd_loss"], 3),
        "model_bwd_only": round(
            report["model_fwd_bwd"] - report["student_fwd"], 3
        ),
        "criterion_bwd": round(
            (report["fwd_bwd"] - report["fwd_loss"])
            - (report["model_fwd_bwd"] - report["student_fwd"]), 3
        ),
        "criterion_pair": round(
            report["fwd_loss"] - report["student_fwd"]
            - report["teacher_fwd_targets"], 3
        ),
        "dist_target_prep": round(
            report["teacher_fwd_targets"] - report["teacher_fwd"], 3
        ),
        "step_minus_parts": round(
            report["full_step"] - report["fwd_bwd"] - report["opt_ema"], 3
        ),
    }
    report["config"] = {
        "remat": not args.no_remat,
        "bf16_dist_upsample": args.bf16_dist_upsample,
        "backend": jax.default_backend(),
        "shapes": f"t={t} {h}x{w} n={n}",
    }
    print(json.dumps({k: v for k, v in report.items()}, default=float))


if __name__ == "__main__":
    main()
