"""Full-scale KD train-step timing harness (v5e measurement recipe).

Reproduces the PERFORMANCE.md "Training-path memory + speed" numbers:
R50 KD step, T=3 @ 368x640, batch 1, 100 queries, TRAIN_NUM_POINTS=160000.

Transport caveat (NOTES_ROUND2.md): block_until_ready on axon is
enqueue-ack only — a device->host scalar read is the completion barrier.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--matcher-points", type=int, default=None,
                    help="MODEL.MASK_FORMER.MATCHER_NUM_POINTS override "
                    "(matcher-side cost points; 0/None = num-points)")
    ap.add_argument("--t", type=int, default=3)
    ap.add_argument("--hw", type=str, default="368x640")
    ap.add_argument("--n-targets", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--msda-orient", default=None, choices=["y", "auto"],
                    help="pallas axis orientation (auto = swapped layout). "
                    "Requires --student-pallas or --teacher-pallas: without "
                    "a pallas flag the model runs xla_gather and the orient "
                    "flag would silently be a no-op (round-2 footgun)")
    ap.add_argument("--teacher-pallas", action="store_true",
                    help="pallas MSDA for the no-grad teacher forward")
    ap.add_argument("--student-pallas", action="store_true",
                    help="pallas MSDA (custom-VJP bwd) for the student too")
    ap.add_argument("--point-sampling", choices=["iid", "lattice"],
                    default=None, help="criterion point-pool construction "
                    "(lattice = gather-free dense sampling, ops/lattice.py)")
    ap.add_argument("--importance-ratio", type=float, default=None,
                    help="override IMPORTANCE_SAMPLE_RATIO (0 ablates the "
                    "per-chunk kth-value sorts)")
    ap.add_argument("--fixed-assign", action="store_true",
                    help="ablate the auction: identity assignment")
    ap.add_argument(
        "--bwd-precision",
        choices=["amp", "highest"],
        default="amp",
        help="amp = trainer default (fast matmul backward under AMP); "
        "highest = force exact-f32 criterion gather backward",
    )
    ap.add_argument("--cli-defaults", action="store_true",
                    help="build the model EXACTLY as tools/train_net_video.py "
                    "does on this backend (overrides the pallas/orient/"
                    "point-sampling flags) so the measured step is the "
                    "production default, not a harness config")
    args = ap.parse_args()
    if args.msda_orient is not None and not (
        args.student_pallas or args.teacher_pallas or args.cli_defaults
    ):
        ap.error("--msda-orient has no effect without --student-pallas/"
                 "--teacher-pallas (the model would run xla_gather)")
    if args.msda_orient is None:
        args.msda_orient = "y"

    from s2d_tpu.utils import jax_setup

    jax_setup.setup_runtime()

    from s2d_tpu.config import load_config
    from s2d_tpu.models.meta_arch import build_model
    from s2d_tpu.train import build_optimizer, make_train_step
    from s2d_tpu.train.trainer import TrainState

    if args.bwd_precision == "highest":
        # force exact-f32 backward regardless of AMP (A/B knob)
        import s2d_tpu.train.trainer as _tr
        from s2d_tpu.losses.criterion import CriterionConfig as _CC

        _tr.CriterionConfig = lambda **k: _CC(
            **{**k, "bwd_einsum_precision": jax.lax.Precision.HIGHEST}
        )

    cfg = load_config(
        "configs/ytvis2021_kd_video_mask2former_R50_cls_agnostic.yaml"
    )
    if args.num_points is not None:
        object.__setattr__(cfg.model.mask_former, "train_num_points", args.num_points)
    if args.matcher_points is not None:
        object.__setattr__(
            cfg.model.mask_former, "matcher_num_points", args.matcher_points
        )
    if args.point_sampling is not None:
        object.__setattr__(
            cfg.model.mask_former, "point_sampling", args.point_sampling
        )
    if args.importance_ratio is not None:
        object.__setattr__(
            cfg.model.mask_former, "importance_sample_ratio",
            args.importance_ratio,
        )
    h, w = (int(x) for x in args.hw.split("x"))
    t, n = args.t, args.n_targets

    if args.fixed_assign:
        import s2d_tpu.losses.criterion as _cr

        _cr.hungarian_assign = lambda cost, valid=None: jnp.tile(
            jnp.arange(cost.shape[2], dtype=jnp.int32), (cost.shape[0], 1)
        )

    if args.cli_defaults:
        # mirror tools/train_net_video.py's training build on this backend
        # (student_impl gate + teacher model), so the measured number is
        # the production default path
        from s2d_tpu.train.trainer_defaults import production_msda_impl

        student_impl = production_msda_impl(cfg)
        args.student_pallas = student_impl is not None
        args.teacher_pallas = student_impl is not None
        args.msda_orient = "auto" if student_impl == "pallas_auto" else "y"
        print(f"cli-defaults: msda_impl={student_impl!r} "
              f"point_sampling={cfg.model.mask_former.point_sampling}",
              flush=True)
        model = build_model(cfg, msda_impl=student_impl, grad_checkpoint=True)
    else:
        model = build_model(
            cfg,
            msda_impl=("pallas_auto" if args.msda_orient == "auto" else "pallas")
            if args.student_pallas else "xla_gather",
            grad_checkpoint=True,
        )
    rng = jax.random.PRNGKey(0)
    bb = args.batch
    images = jnp.asarray(
        np.random.RandomState(0).rand(bb, t, h, w, 3), jnp.float32
    )
    tgt_masks = jnp.asarray(
        np.random.RandomState(1).rand(bb, n, t, h, w) > 0.7
    )
    tgt_valid = jnp.asarray(np.ones((bb, n), bool))

    print("init...", flush=True)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(rng, images[:, :1])
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=opt_state,
    )
    # barrier: force a scalar read
    float(jax.tree_util.tree_leaves(params)[0].sum())
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    teacher_model = None
    if args.teacher_pallas:
        from s2d_tpu.models.meta_arch import build_model as _bm

        teacher_model = _bm(
            cfg,
            msda_impl="pallas_auto" if args.msda_orient == "auto" else "pallas",
        )
    step_fn = jax.jit(
        make_train_step(model, cfg, tx, teacher_model=teacher_model)
    )
    t0 = time.perf_counter()
    state, metrics = step_fn(state, images, tgt_masks, tgt_valid, rng)
    tot = float(metrics["total_loss"])
    print(
        f"compile+first step {time.perf_counter() - t0:.1f}s  loss={tot:.4f}",
        flush=True,
    )

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, images, tgt_masks, tgt_valid, rng)
    tot = float(metrics["total_loss"])  # completion barrier for all steps
    dt = (time.perf_counter() - t0) / args.steps
    print(f"steady state: {dt:.2f} s/step  loss={tot:.4f}", flush=True)

    # MFU (VERDICT r3 weak #6): XLA cost analysis of the whole train step
    # (student fwd + teacher fwd + criterion pair + bwd + optimizer) over
    # the v5e bf16 peak (shared constant/helpers in utils.profiling). The
    # AOT lower/compile reuses the persistent compilation cache, so this
    # adds seconds, not a recompile. MFU only prints on TPU — dividing a
    # CPU step time by the TPU peak would be a meaningless figure.
    from s2d_tpu.utils.profiling import compiled_flops, mfu_vs_v5e

    flops = compiled_flops(step_fn, state, images, tgt_masks, tgt_valid, rng)
    if flops > 0:
        line = f"step flops: {flops / 1e12:.2f} TFLOP"
        if jax.default_backend() == "tpu":
            line += f"  mfu_vs_v5e_peak: {mfu_vs_v5e(flops, 1, dt):.4f}"
        print(line, flush=True)
    else:
        print("mfu: cost analysis unavailable", flush=True)


if __name__ == "__main__":
    main()
