"""Trainer tests: schedules, param labeling, one KD train step end-to-end
on a tiny model, EMA update, NaN-skip."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.config import Config, load_config
from s2d_tpu.models.meta_arch import VideoMaskFormer
from s2d_tpu.train import (
    TrainState,
    build_optimizer,
    ema_momentum_schedule,
    label_params,
    loss_weight_factors,
    make_train_step,
    warmup_multistep_lr,
)


def test_lr_schedule():
    sched = warmup_multistep_lr(1.0, steps=(100, 200), gamma=0.1, warmup_iters=10, warmup_factor=0.5)
    assert float(sched(0)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(150)) == pytest.approx(0.1)
    assert float(sched(250)) == pytest.approx(0.01)


def test_loss_weight_factors_linear():
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.KD_WEIGHT_SCHEDULER", "linear",
        "MODEL.MASK_FORMER.KD_WEIGHT_DECAY_START", "0.0",
        "MODEL.MASK_FORMER.KD_WEIGHT_DECAY_END", "100.0",
        "MODEL.MASK_FORMER.SUPERVISED_MIN_WEIGHT", "0.1",
        "MODEL.MASK_FORMER.KD_MIN_WEIGHT", "0.2",
    ])
    f = loss_weight_factors(cfg, max_iter=100)
    sup0, kd0 = f(0)
    assert float(sup0) == pytest.approx(1.0)
    assert float(kd0) == pytest.approx(0.2)
    sup1, kd1 = f(100)
    assert float(sup1) == pytest.approx(0.1)
    assert float(kd1) == pytest.approx(1.0)


def test_ema_momentum_schedule():
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.EMA_MOMENTUM_SCHEDULE", "True",
        "MODEL.MASK_FORMER.EMA_MOMENTUM", "0.99",
        "MODEL.MASK_FORMER.EMA_MOMENTUM_END", "0.999",
        "MODEL.MASK_FORMER.EMA_MOMENTUM_UNTIL_STEP", "1000",
    ])
    m = ema_momentum_schedule(cfg)
    assert float(m(0)) == pytest.approx(0.99)
    assert float(m(1000)) == pytest.approx(0.999)
    assert 0.99 < float(m(500)) < 0.999


def _tiny_cfg():
    return load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "64",
        "SOLVER.AMP.ENABLED", "False",
    ])


def _tiny_model(cfg):
    mf = cfg.model.mask_former
    return VideoMaskFormer(
        num_classes=1, hidden_dim=mf.hidden_dim, mask_dim=32,
        num_queries=mf.num_object_queries, nheads=mf.nheads,
        dim_feedforward=mf.dim_feedforward, dec_layers=mf.dec_layers,
        transformer_enc_layers=1, compute_dtype=jnp.float32,
    )


def test_label_params():
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    x = jnp.zeros((1, 2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    labels = label_params(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    by_label = {}
    for path, l in flat:
        by_label.setdefault(l, []).append("/".join(str(p) for p in path))
    assert "frozen" in by_label  # backbone FrozenBN
    assert any("query_feat" in p for p in by_label["head_nodecay"])
    assert any("stem_conv1" in p for p in by_label["backbone_decay"])
    # decoder LayerNorms are nodecay
    assert any("cross_norm" in p for p in by_label["head_nodecay"])


def test_kd_train_step_runs_and_updates():
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(rng, (b, t, h, w, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])

    step_fn = jax.jit(make_train_step(model, cfg, tx))
    new_state, metrics = step_fn(state, images, masks, valid, jax.random.PRNGKey(2))

    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_finite"]) == 1.0
    assert "kd_loss_mask" in metrics

    # student params changed; frozen BN did not
    old_kernel = params["params"]["predictor"]["class_embed"]["kernel"]
    new_kernel = new_state.params["params"]["predictor"]["class_embed"]["kernel"]
    # updates are tiny (clip 0.01, lr 1e-4): check exact change, not allclose
    assert not np.array_equal(np.asarray(old_kernel), np.asarray(new_kernel))
    old_bn = params["params"]["backbone"]["stem_norm1"]["scale"]
    new_bn = new_state.params["params"]["backbone"]["stem_norm1"]["scale"]
    np.testing.assert_array_equal(np.asarray(old_bn), np.asarray(new_bn))

    # teacher moved toward student by (1 - m)
    m = float(cfg.model.mask_former.ema_momentum)
    t_old = np.asarray(params["params"]["predictor"]["class_embed"]["kernel"])
    t_new = np.asarray(new_state.teacher_params["params"]["predictor"]["class_embed"]["kernel"])
    s_new = np.asarray(new_kernel)
    np.testing.assert_allclose(t_new, m * t_old + (1 - m) * s_new, rtol=1e-5, atol=1e-7)


def test_kd_train_step_with_distillation_nms_config_loader():
    """DISTILLATION_NMS=True via the full config-loader opts path (as the
    CLI sets it) compiles into the jit step and yields finite losses; the
    nms only shrinks kd_valid, so kd losses stay well-formed. The sibling
    test below exercises the same flag via direct dataclass mutation."""
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "64",
        "SOLVER.AMP.ENABLED", "False",
        "MODEL.MASK_FORMER.DISTILLATION_NMS", "True",
        # low score threshold so some teacher targets survive at random
        # init and the NMS actually has candidates to suppress
        "MODEL.MASK_FORMER.SCORE_THRESHOLD_DISTILLATION", "0.1",
    ])
    model = _tiny_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(rng, (b, t, h, w, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])

    step_fn = jax.jit(make_train_step(model, cfg, tx))
    new_state, metrics = step_fn(
        state, images, masks, valid, jax.random.PRNGKey(2)
    )
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_finite"]) == 1.0
    assert "kd_loss_mask" in metrics


def test_kd_train_step_teacher_model_override():
    """A distinct teacher module (different MSDA unit, same param tree)
    produces the same losses — the TPU trainer swaps in the pallas-kernel
    variant for the no-grad teacher forward this way."""
    import dataclasses as _dc

    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    teacher_model = _dc.replace(model, msda_impl="xla_gather")
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(rng, (b, t, h, w, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])

    base = jax.jit(make_train_step(model, cfg, tx))
    swapped = jax.jit(
        make_train_step(model, cfg, tx, teacher_model=teacher_model)
    )
    _, m0 = base(state, images, masks, valid, jax.random.PRNGKey(2))
    _, m1 = swapped(state, images, masks, valid, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(m0["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )


def test_auto_scale_workers():
    from s2d_tpu.train.scaling import auto_scale_workers

    cfg = load_config(None, opts=[
        "SOLVER.IMS_PER_BATCH", "16",
        "SOLVER.BASE_LR", "0.1",
        "SOLVER.REFERENCE_WORLD_SIZE", "8",
        "SOLVER.MAX_ITER", "5000",
        "SOLVER.STEPS", "(4000,)",
    ])
    out = auto_scale_workers(cfg, 16)
    # the d2 docstring example: 16 GPUs from a reference of 8
    assert out.solver.ims_per_batch == 32
    assert out.solver.base_lr == pytest.approx(0.2)
    assert out.solver.max_iter == 2500
    assert out.solver.steps == (2000,)
    assert out.solver.reference_world_size == 16
    # no-op cases
    assert auto_scale_workers(cfg, 8) is cfg


def test_accum_lr_scale():
    from s2d_tpu.train.scaling import apply_accum_lr_scale

    cfg = load_config(None, opts=[
        "SOLVER.IMS_PER_BATCH", "4",
        "SOLVER.BASE_LR", "0.000001",
        "SOLVER.ACCUM_ITER", "4",
    ])
    out = apply_accum_lr_scale(cfg)
    assert out.solver.base_lr == pytest.approx(1e-6 * 16 / 2)
    cfg1 = load_config(None, opts=["SOLVER.ACCUM_ITER", "1"])
    assert apply_accum_lr_scale(cfg1) is cfg1


def test_packed_target_masks_match_bool():
    """collate_clips(pack_masks=True) ships targets as packbits-uint8; the
    train step unpacks on device — metrics must be IDENTICAL to the bool
    feed (same rng, same state)."""
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(rng, (b, t, h, w, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)

    def fresh_state():
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            teacher_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
        )

    masks = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    )
    packed = np.packbits(masks, axis=-1)
    assert packed.shape == (b, n, t, h, w // 8) and packed.dtype == np.uint8
    valid = jnp.asarray([[True, True, False]])

    step_fn = jax.jit(make_train_step(model, cfg, tx))
    step_rng = jax.random.PRNGKey(2)
    _, m_bool = step_fn(fresh_state(), images, jnp.asarray(masks), valid, step_rng)
    _, m_packed = step_fn(
        fresh_state(), images, jnp.asarray(packed), valid, step_rng
    )
    for k in m_bool:
        np.testing.assert_array_equal(
            np.asarray(m_bool[k]), np.asarray(m_packed[k]), err_msg=k
        )

    # and the loader really produces the packed layout
    from s2d_tpu.data.loader import collate_clips

    samples = [{
        "image": np.zeros((t, 16, 24, 3), np.float32),
        "masks": masks[0, :, :, :16, :24],
        "valid": np.asarray(valid)[0],
    }]
    batch = collate_clips(
        samples, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), pack_masks=True
    )
    assert batch["masks"].dtype == np.uint8
    assert batch["masks"].shape[-1] * 8 == batch["images"].shape[3]


def _mk_state(model, cfg, images):
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    return tx, TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )


def test_ema_gated_on_accum_boundary():
    """Under gradient accumulation the EMA teacher blends only on
    optimizer-step boundaries (reference train_loop.py:760-763), not on
    every micro-step."""
    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "64",
        "SOLVER.AMP.ENABLED", "False",
        "SOLVER.ACCUM_ITER", "2",
    ])
    model = _tiny_model(cfg)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 3))
    tx, state = _mk_state(model, cfg, images)
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])
    step_fn = jax.jit(make_train_step(model, cfg, tx))

    leaf = lambda s: np.asarray(
        s.teacher_params["params"]["predictor"]["class_embed"]["kernel"])
    s1, _ = step_fn(state, images, masks, valid, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(leaf(s1), leaf(state))  # micro-step: hold
    s2, _ = step_fn(s1, images, masks, valid, jax.random.PRNGKey(3))
    assert not np.array_equal(leaf(s2), leaf(s1))  # boundary: blend


def test_nan_step_holds_params_and_teacher():
    """A non-finite loss is a full skip: params, optimizer state, and the
    EMA teacher all hold (zeroed grads alone would still move params via
    Adam moments + weight decay)."""
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 3))
    tx, state = _mk_state(model, cfg, images)
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])
    step_fn = jax.jit(make_train_step(model, cfg, tx))

    # one good step to put nonzero Adam moments in the optimizer state
    s1, _ = step_fn(state, images, masks, valid, jax.random.PRNGKey(2))
    bad = images.at[0, 0, 0, 0, 0].set(jnp.nan)
    s2, metrics = step_fn(s1, bad, masks, valid, jax.random.PRNGKey(3))
    assert float(metrics["grad_finite"]) == 0.0
    for old, new in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    for old, new in zip(jax.tree_util.tree_leaves(s1.teacher_params),
                        jax.tree_util.tree_leaves(s2.teacher_params)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    assert int(s2.step) == int(s1.step) + 1


def test_label_params_swin_norms_train():
    """Swin backbone LayerNorms are TRAINABLE no-decay params (the
    reference optimizer excludes only FrozenBN buffers; WEIGHT_DECAY_NORM
    applies to norms, WEIGHT_DECAY_EMBED to the relative position bias
    table) — they must not inherit the R50 FrozenBN 'frozen' label."""
    from s2d_tpu.models.swin import SwinTransformer

    model = SwinTransformer(
        embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"backbone": params["params"]}}
    labels = label_params(wrapped, frozen_backbone_norms=False)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    by_path = {"/".join(str(getattr(p, "key", p)) for p in path): l
               for path, l in flat}
    assert not any(l == "frozen" for l in by_path.values())
    norm_labels = {p: l for p, l in by_path.items()
                   if "norm" in p and p.endswith(("scale", "bias"))}
    assert norm_labels and all(
        l == "backbone_nodecay" for l in norm_labels.values()), norm_labels
    rpb = {p: l for p, l in by_path.items()
           if "relative_position_bias_table" in p}
    assert rpb and all(l == "backbone_nodecay" for l in rpb.values())


def test_kd_train_step_with_distillation_nms():
    """MODEL.MASK_FORMER.DISTILLATION_NMS=True compiles and runs inside the
    jitted KD step (reference kd_video_maskformer_model.py:485-519; the
    NotImplementedError guard was removed in round 3). Semantics vs the
    torch loop are pinned in test_distillation_nms.py; here: the step runs,
    the loss is finite, and differs from the NMS-off step (NMS shrinks the
    distillation target set)."""
    cfg = _tiny_cfg()
    object.__setattr__(cfg.model.mask_former, "distillation_nms", True)
    # a loose threshold so suppression actually fires at random init
    object.__setattr__(cfg.model.mask_former.test, "nms_thresh", 0.05)
    object.__setattr__(
        cfg.model.mask_former, "score_threshold_distillation", 0.0
    )
    model = _tiny_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 3
    images = jax.random.normal(rng, (b, t, h, w, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.asarray([[True, True, False]])

    step_fn = jax.jit(make_train_step(model, cfg, tx))
    _, metrics = step_fn(state, images, masks, valid, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))

    cfg_off = _tiny_cfg()
    object.__setattr__(
        cfg_off.model.mask_former, "score_threshold_distillation", 0.0
    )
    step_off = jax.jit(make_train_step(_tiny_model(cfg_off), cfg_off, tx))
    _, metrics_off = step_off(
        state, images, masks, valid, jax.random.PRNGKey(2)
    )
    assert float(metrics["kd_loss_mask"]) != float(metrics_off["kd_loss_mask"])
