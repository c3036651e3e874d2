#!/usr/bin/env python
"""Main trainer/evaluator entry — CLI surface of the reference's
`train_net_video.py` (`/root/reference/model_training/train_net_video.py`):

  python tools/train_net_video.py --config-file cfg.yaml [--eval-only]
      [--resume] [--num-chips N] [opts KEY VALUE ...]

Differences from the reference, by design: no process spawning
(`--num-gpus` -> jax sees all local chips through one process; multi-host
runs use jax.distributed and the same script on every host), AMP -> bf16
compute dtype, DDP -> data-axis mesh sharding.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="s2d_tpu video trainer")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-videos", type=int, default=None,
                        help="cap eval videos (debug)")
    parser.add_argument("--weights", default="", help=".pth/.pkl to convert-load")
    parser.add_argument(
        "--profile-dir", default="",
        help="capture a jax.profiler device trace of steps "
             "[10, 10+--profile-steps) into this dir (Perfetto/XProf)",
    )
    parser.add_argument("--profile-steps", type=int, default=3)
    parser.add_argument(
        "--time-parallel", action="store_true",
        help="eval-only: shard each clip's frame axis over the local "
             "devices (sequence-parallel whole-video inference)",
    )
    parser.add_argument(
        "--model-parallel", type=int, default=1,
        help="tensor-parallel degree: shard the FFN pairs over a `model` "
             "mesh axis (parallel/tp.py); devices = data x model",
    )
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER, default=[],
        help="config overrides: KEY VALUE pairs",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()  # S2D_PLATFORM=cpu forces XLA:CPU for local drives
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.config import load_config
    from s2d_tpu.checkpoint import CheckpointWriter, load_reference_model
    from s2d_tpu.data import ClipMapper, MapperConfig, get_dataset, train_loader
    from s2d_tpu.evaluation.evaluator import evaluate_dataset
    from s2d_tpu.models import build_model
    from s2d_tpu.parallel import create_mesh, replicate, shard_batch
    from s2d_tpu.train import TrainState, build_optimizer, make_train_step
    from s2d_tpu.utils.events import MetricLogger

    cfg = load_config(args.config_file or None, args.opts)
    from s2d_tpu.train.scaling import apply_accum_lr_scale, auto_scale_workers

    cfg = auto_scale_workers(cfg, len(jax.devices()))
    cfg = apply_accum_lr_scale(cfg)
    os.makedirs(cfg.output_dir, exist_ok=True)

    # student MSDA on TPU under AMP: the pallas separable-MXU kernel with
    # its transposed-kernel custom VJP (AMP-class grads, ~15% faster full
    # KD step); exact XLA path otherwise. Shared with
    # bench_train_step.py --cli-defaults so the measured default path and
    # the production path cannot diverge.
    from s2d_tpu.train.trainer_defaults import production_msda_impl

    student_impl = production_msda_impl(cfg)
    model = build_model(
        cfg,
        msda_impl=student_impl,
        grad_checkpoint=not args.eval_only and cfg.solver.grad_checkpoint,
    )
    rng = jax.random.PRNGKey(max(cfg.seed, 0))

    weights = args.weights or cfg.model.weights
    if cfg.model.weight_list and all(os.path.exists(p) for p in cfg.model.weight_list):
        # MODEL.WEIGHT_LIST: merge separate student/teacher checkpoints
        # (reference combine_weights_to_student_teacher, defaults.py:465-501)
        student_path = cfg.model.weight_list[0]
        teacher_path = cfg.model.weight_list[-1]
        student = load_reference_model(student_path, which="student")
        teacher = load_reference_model(teacher_path, which="teacher")
        print(f"Merged checkpoints student={student_path} teacher={teacher_path}")
    elif weights and os.path.exists(weights):
        from s2d_tpu.checkpoint.torch_import import (
            is_backbone_only,
            load_backbone_weights,
            load_torch_checkpoint,
        )

        _ckpt_state = load_torch_checkpoint(weights)
        if is_backbone_only(_ckpt_state):
            # ImageNet-pretrained backbone prep pkl (tools/
            # convert_pretrained_weights.py / the reference's convert-
            # torchvision-to-d2.py): graft the backbone into a fresh
            # init — d2's matching-heuristics load of MODEL.WEIGHTS
            sample = jnp.zeros((1, cfg.input.sampling_frame_num, 64, 64, 3))
            student = load_backbone_weights(
                _ckpt_state, jax.jit(model.init)(rng, sample)
            )
            teacher = jax.tree_util.tree_map(np.copy, student)
            print(f"Grafted pretrained backbone {weights}")
        else:
            student = load_reference_model(weights, which="student")
            teacher = load_reference_model(weights, which="teacher")
            print(f"Loaded reference checkpoint {weights}")
    else:
        sample = jnp.zeros((1, cfg.input.sampling_frame_num, 64, 64, 3))
        student = jax.jit(model.init)(rng, sample)
        teacher = jax.tree_util.tree_map(np.copy, student)
        if weights:
            print(f"WARNING: weights {weights!r} not found; random init")

    if args.eval_only:
        # flash masked cross-attention bounds decoder memory on long videos,
        # and the separable-MXU pallas MSDA kernel runs the deformable
        # encoder ~2x faster (Pallas TPU kernels; XLA paths stay for CPU).
        # Buckets up to 64 frames skip flash — the XLA decoder attention is
        # measurably faster wherever its logits fit comfortably; flash
        # covers the long whole-video tail.
        model_short = None
        if jax.default_backend() == "tpu":
            model = build_model(
                cfg, msda_impl="pallas_auto", flash_cross_attention=True
            )
            model_short = build_model(cfg, msda_impl="pallas_auto")
        eval_vars = student if cfg.model.mask_former.test.eval_student else teacher
        nshards, shard = jax.process_count(), jax.process_index()
        time_mesh = None
        if args.time_parallel and len(jax.devices()) > 1:
            time_mesh = create_mesh(n_data=len(jax.devices()))
        for dataset_name in cfg.datasets.test:
            metrics = evaluate_dataset(
                cfg, model, eval_vars, dataset_name,
                output_dir=cfg.output_dir, max_videos=args.max_videos,
                model_short=model_short,
                num_shards=nshards, shard_index=shard,
                time_mesh=time_mesh,
            )
            if nshards > 1:
                # per-host shards land on the shared FS; host 0 merges and
                # scores the full set after a cross-host barrier (the
                # reference's comm.gather of predictions). Coordination-
                # service barrier, NOT a collective: shards finish at
                # different times and the gloo smoke backend's first
                # collective has a hard 30 s context-init window
                from s2d_tpu.utils.jax_setup import multihost_barrier

                multihost_barrier(f"eval:{dataset_name}")
                if shard == 0:
                    from s2d_tpu.evaluation.evaluator import (
                        merge_shard_results,
                        score_results,
                    )

                    results = merge_shard_results(cfg.output_dir, nshards)
                    metrics = score_results(
                        dataset_name, results, max_videos=args.max_videos
                    )
                # second barrier: the NEXT dataset reuses the same
                # results_shard{i}.json names, so other hosts must not
                # start writing them until host 0 has read these
                multihost_barrier(f"eval-merged:{dataset_name}")
                if shard != 0:
                    continue
            print(f"[{dataset_name}] " + "  ".join(
                f"{k}: {v:.4f}" for k, v in metrics.items()
            ))
            if cfg.test.expected_results:
                from s2d_tpu.evaluation.verify import verify_results

                verify_results(cfg.test.expected_results, metrics)
        return 0

    # ---- training ----
    # the data axis must divide the global batch; surplus devices idle
    # (the reference requires batch % world_size == 0 the same way).
    # --model-parallel N carves a `model` axis first (TP FFN shards).
    n_model = max(args.model_parallel, 1)
    assert len(jax.devices()) % n_model == 0, (
        f"{len(jax.devices())} devices not divisible by "
        f"--model-parallel {n_model}"
    )
    n_data = len(jax.devices()) // n_model
    while cfg.solver.ims_per_batch % n_data:
        n_data -= 1
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    if n_proc > 1:
        # multi-HOST job (S2D_MULTIHOST=1): every device must sit in the
        # mesh — an idle device on some process would leave that process
        # with no shard to feed make_array_from_process_local_data
        assert n_data * n_model == len(jax.devices()), (
            f"multi-host mesh {n_data}x{n_model} must cover all "
            f"{len(jax.devices())} devices (pick SOLVER.IMS_PER_BATCH "
            "divisible by the data-axis size)"
        )
        assert cfg.solver.ims_per_batch % n_proc == 0, (
            f"SOLVER.IMS_PER_BATCH {cfg.solver.ims_per_batch} not "
            f"divisible by {n_proc} processes"
        )
    mesh = create_mesh(
        n_data=n_data, n_model=n_model, devices=jax.devices()[: n_data * n_model]
    )
    tx = build_optimizer(cfg, student)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=student,
        teacher_params=teacher,
        opt_state=tx.init(student),
    )
    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    if args.resume:
        from s2d_tpu.checkpoint import latest_step, restore_checkpoint

        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_checkpoint(ckpt_dir, state, step)
            print(f"Resumed from checkpoint step {step}")
    # the no-grad teacher forward uses the pallas kernel under the same
    # AMP gate (the reference's teacher also runs under autocast)
    teacher_model = (
        build_model(cfg, msda_impl=student_impl) if student_impl else None
    )
    step_fn = jax.jit(make_train_step(model, cfg, tx, teacher_model=teacher_model))

    dicts = []
    for name in cfg.datasets.train:
        try:
            d, _ = get_dataset(name)
        except KeyError:
            # COCO-registered image sets train the video model as
            # pseudo-clips (reference CocoClipDatasetMapper via the
            # multi-dataset concat, train_net_video.py:103-116)
            from s2d_tpu.data.coco import get_coco_dataset
            from s2d_tpu.data.image_datasets import coco_to_clip_record

            imgs, _ = get_coco_dataset(name)
            d = [
                coco_to_clip_record(r, cfg.input.sampling_frame_num)
                for r in imgs
            ]
        dicts.extend(d)
    mapper = ClipMapper(MapperConfig.from_config(cfg, is_train=True),
                        is_train=True, seed=max(cfg.seed, 0))
    batch_transform = None
    if cfg.dataloader.copy_paste:
        # reference applies clip copy-paste on every uncollated batch when
        # DATALOADER.COPY_PASTE is on (train_loop.py:703); densify-sparse
        # swaps pasting for forward-filling (train_loop.py:433-439)
        from s2d_tpu.data.copy_paste import apply_clip_copy_paste

        cp_rng = np.random.RandomState(max(cfg.seed, 0) + 7)
        dl = cfg.dataloader
        batch_transform = lambda samples: apply_clip_copy_paste(
            samples, cp_rng, rate=dl.copy_paste_rate,
            random_num=dl.copy_paste_random_num,
            min_ratio=dl.copy_paste_min_ratio,
            max_ratio=dl.copy_paste_max_ratio,
            densify_sparse=dl.copy_paste_densify_sparse,
        )
    # each process loads its 1/n_proc slice of the global batch; the shared
    # seed means every process walks the SAME permutation, taking
    # interleaved items, so the assembled global batch (process shards
    # concatenated in process order by make_array_from_process_local_data)
    # equals the single-process batch — reference semantics: DDP sampler
    # rank sharding with batch % world_size == 0
    loader = train_loader(
        dicts, mapper, cfg.solver.ims_per_batch // n_proc,
        cfg.model.pixel_mean, cfg.model.pixel_std,
        seed=max(cfg.seed, 0),
        num_shards=n_proc, shard_index=jax.process_index(),
        batch_transform=batch_transform,
    )

    def run_eval(eval_state, step):
        """EvalHook body (reference engine/defaults.py:519-565): score every
        test dataset with the current params and return prefixed metrics."""
        eval_vars = (
            eval_state.params
            if cfg.model.mask_former.test.eval_student
            else eval_state.teacher_params
        )
        eval_vars = jax.device_get(eval_vars)
        out = {}
        for dataset_name in cfg.datasets.test:
            m = evaluate_dataset(
                cfg, model, eval_vars, dataset_name,
                output_dir=os.path.join(cfg.output_dir, f"inference_{step}"),
                max_videos=args.max_videos,
            )
            print(f"[eval @{step}] [{dataset_name}] " + "  ".join(
                f"{k}: {v:.4f}" for k, v in m.items()
            ))
            out.update({f"{dataset_name}/{k}": v for k, v in m.items()})
        return out

    # writers are main-process-only in a multi-host job (the reference's
    # is_main_process gating): DP state is replicated, so process 0 holds
    # the full value for checkpoints; other processes still compute/print
    logger = MetricLogger(cfg.output_dir if is_main else None)
    train_rng = jax.random.PRNGKey(max(cfg.seed, 0) + 1)
    # resume continues from the stored iteration (reference
    # engine/defaults.py:450-473: start_iter = checkpointer iteration):
    # `state.step` counts executed train steps, so LR/EMA/weight schedules
    # and the loop bound stay consistent across restarts
    start_iter = int(jax.device_get(state.step))
    ckpt_period = max(cfg.solver.checkpoint_period, 1)
    eval_period = cfg.test.eval_period
    loader_iter = iter(loader)
    from s2d_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    # async writer: save() snapshots and returns; disk writes happen on
    # orbax's background thread so checkpoints never stall the step loop.
    # Multi-host: EVERY process constructs the manager and calls
    # save()/close() — orbax coordinates via cross-process barriers and
    # writes each array from its primary/owning host; gating this on
    # process 0 would leave the other processes out of those barriers and
    # desync the gloo cliques (observed: Gloo context init timeout)
    ckpt_writer = CheckpointWriter(ckpt_dir)
    with mesh:
        if n_model > 1:
            from s2d_tpu.parallel import shard_train_state

            state = shard_train_state(mesh, state)
        else:
            state = replicate(mesh, state)
        # metrics are read back ONE step late: float(metrics[N]) blocks on
        # step N, so reading it only after batch N+1 is fetched, uploaded,
        # and step N+1 dispatched lets the host feed (loader + device_put
        # over the remote transport) overlap step N's device compute
        # instead of serializing behind it
        pending = None  # (iteration, device metrics) awaiting readback

        def flush_pending():
            nonlocal pending
            if pending is None:
                return
            p_it, p_metrics = pending
            pending = None
            host = {k: float(v) for k, v in p_metrics.items()}
            timer.step_done()
            host.update(timer.metrics())
            logger.log(p_it, host)

        if n_proc > 1:
            # Multi-host first-step discipline: compile WITHOUT executing,
            # then align at the coordination-service barrier, so every
            # process creates the first gloo/ICI collective context within
            # milliseconds. Lazy jit would run compile (minutes) directly
            # into the first cross-process psum, and gloo's context init
            # has a hard 30 s key-exchange window — compile/scheduling
            # skew on busy hosts kills the job there. The AOT-compiled
            # step (same avals every iteration) serves the whole loop.
            import itertools

            from s2d_tpu.utils.jax_setup import multihost_barrier

            first = next(loader_iter)
            loader_iter = itertools.chain([first], loader_iter)
            w_img, w_masks, w_valid = shard_batch(
                mesh, (first["images"], first["masks"], first["valid"])
            )
            # ONE binary for the whole job: process 0 compiles the step,
            # serializes the executable, and ships the BYTES through the
            # coordination KV store; every other process deserializes and
            # loads those exact bytes. Letting each process compile its
            # own copy deadlocks: XLA's compile is not deterministic
            # across processes (observed: different HLO digests from
            # identical inputs, one binary's AllGather paired against the
            # other's all-reduce — symmetric gloo send timeouts). This is
            # also the torch-world invariant (one DDP binary everywhere),
            # recovered here at the executable level.
            if "distill_images" in first:
                w_di, w_da = shard_batch(
                    mesh, (first["distill_images"], first["distill_affine"])
                )
                lowered = step_fn.lower(
                    state, w_img, w_masks, w_valid, train_rng,
                    distill_images=w_di, distill_affine=w_da,
                )
            else:
                lowered = step_fn.lower(
                    state, w_img, w_masks, w_valid, train_rng
                )
            # SEQUENTIAL compile through the shared persistent cache:
            # process 0 compiles and writes the cache entry, the rest
            # compile after the barrier and load the identical bytes
            # (XLA compilation is NOT deterministic across processes —
            # observed: different HLO digests from identical inputs,
            # pairing one binary's AllGather against the other's
            # all-reduce; executable serialization cannot round-trip on
            # the XLA:CPU smoke backend, so the cache is the sharing
            # mechanism)
            if jax.process_index() != 0:
                multihost_barrier("train:compile0")
            compiled = lowered.compile()
            if jax.process_index() == 0:
                multihost_barrier("train:compile0")
            if os.environ.get("S2D_MH_DEBUG"):
                import hashlib

                hlo = compiled.as_text()
                print(
                    f"[mh-debug p{jax.process_index()}] warmup shapes "
                    f"img={first['images'].shape} masks={first['masks'].shape} "
                    f"valid={first['valid'].shape} "
                    f"hlo={hashlib.sha256(hlo.encode()).hexdigest()[:16]} "
                    f"len={len(hlo)}",
                    flush=True,
                )
            # The AOT executable is fixed to the first batch's canvas.
            # Multi-scale training pads each batch to a PER-BATCH bucket,
            # so later batches can arrive at other canvases — and worse,
            # each process buckets over its own 1/n_proc shard, so local
            # shard shapes can disagree WITHIN one global step. Multi-host
            # training therefore requires a deterministic canvas; warn
            # loudly up front, and fall back to the lazy jit (which
            # recompiles per shape — fine on TPU pods, see the
            # binary-identity note in NOTES_ROUND5.md) if a different
            # canvas does show up.
            if len(cfg.input.min_size_train) > 1:
                print(
                    "WARNING: multi-host training with multi-scale "
                    f"INPUT.MIN_SIZE_TRAIN {cfg.input.min_size_train} — "
                    "per-process batch canvases can diverge within a "
                    "global step; prefer a single train scale under "
                    "S2D_MULTIHOST=1",
                    flush=True,
                )
            warm_shapes = tuple(
                (a.shape, str(a.dtype))
                for a in jax.tree_util.tree_leaves(
                    (w_img, w_masks, w_valid)
                )
            )

            def step_exec(st, im, ma, va, rng, **kw):
                shapes = tuple(
                    (a.shape, str(a.dtype))
                    for a in jax.tree_util.tree_leaves((im, ma, va))
                )
                if shapes == warm_shapes:
                    return compiled(st, im, ma, va, rng, **kw)
                return step_fn(st, im, ma, va, rng, **kw)

            multihost_barrier("train:compiled")
        else:
            step_exec = step_fn
        tracing = False
        for it in range(start_iter, cfg.solver.max_iter):
            if args.profile_dir:
                # skip the compile step; bracket a few steady-state steps
                if it == start_iter + 10 and args.profile_steps > 0:
                    jax.profiler.start_trace(args.profile_dir)
                    tracing = True
                elif tracing and it == start_iter + 10 + args.profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
                    print(f"profiler trace written to {args.profile_dir}")
            batch = next(loader_iter)
            timer.data_done()
            images, masks, valid = shard_batch(
                mesh, (batch["images"], batch["masks"], batch["valid"])
            )
            if "distill_images" in batch:
                d_img, d_aff = shard_batch(
                    mesh, (batch["distill_images"], batch["distill_affine"])
                )
                state, metrics = step_exec(
                    state, images, masks, valid, train_rng,
                    distill_images=d_img, distill_affine=d_aff,
                )
            else:
                state, metrics = step_exec(state, images, masks, valid, train_rng)
            flush_pending()
            pending = (it, metrics)
            done = (it + 1) == cfg.solver.max_iter
            if (it + 1) % ckpt_period == 0 or done:
                flush_pending()  # keep metrics.json ordered before saves
                ckpt_writer.save(it + 1, state)
            if eval_period > 0 and ((it + 1) % eval_period == 0 or done):
                flush_pending()
                if is_main:
                    # mid-train eval is single-process work on the main
                    # process's local devices (no collectives inside)
                    logger.log(it, run_eval(state, it + 1))
                if n_proc > 1:
                    from s2d_tpu.utils.jax_setup import multihost_barrier

                    multihost_barrier(f"eval@{it}")
                timer = StepTimer()  # eval time must not count as data time
        flush_pending()
        if tracing:
            # the run ended inside the profiling window — close the trace
            # so it is actually written instead of dying with the process
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
    ckpt_writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
