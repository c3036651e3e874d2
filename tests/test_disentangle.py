"""Disentangled distillation: affine tracking, mask warp replay, trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.data.augment import ClipAugConfig, augment_clip
from s2d_tpu.ops.warp import warp_masks_affine


def test_affine_tracks_resize_and_flip():
    rng = np.random.RandomState(0)
    frames = [np.zeros((40, 60, 3), np.uint8) for _ in range(2)]
    masks = np.zeros((1, 2, 40, 60), bool)
    masks[0, :, 10:20, 12:30] = True
    cfg = ClipAugConfig(min_sizes=(20,), max_size=100, flip_prob=1.0)
    out_frames, out_masks, affines = augment_clip(
        rng, frames, masks, cfg, True, return_affines=True
    )
    nh, nw = out_frames[0].shape[:2]
    # map a point known to be inside the original mask
    pt = np.array([20.0, 15.0, 1.0])  # (x, y, 1)
    mapped = affines[0] @ pt
    x, y = int(round(mapped[0])), int(round(mapped[1]))
    assert 0 <= x < nw and 0 <= y < nh
    assert out_masks[0, 0, y, x]


def test_warp_masks_affine_identity_and_shift():
    masks = np.zeros((1, 1, 1, 16, 16), bool)
    masks[0, 0, 0, 4:8, 4:8] = True
    identity = np.eye(3, dtype=np.float32)[None, None]
    out = np.asarray(warp_masks_affine(jnp.asarray(masks), jnp.asarray(identity)))
    np.testing.assert_array_equal(out, masks)

    shift = np.eye(3, dtype=np.float32)
    shift[0, 2] = 4.0  # +4 px in x
    out = np.asarray(
        warp_masks_affine(jnp.asarray(masks), jnp.asarray(shift[None, None]))
    )
    assert out[0, 0, 0, 4:8, 8:12].all()
    assert not out[0, 0, 0, 4:8, 4:8].any()


def test_trainer_disentangled_step():
    from s2d_tpu.config import load_config
    from s2d_tpu.models.meta_arch import VideoMaskFormer
    from s2d_tpu.train import TrainState, build_optimizer, make_train_step

    cfg = load_config(None, opts=[
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "2",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "64",
        "INPUT.DISENTANGLE_DISTILLATION_LOADER", "True",
    ])
    model = VideoMaskFormer(
        num_classes=1, hidden_dim=32, mask_dim=32, num_queries=8, nheads=4,
        dim_feedforward=64, dec_layers=2, transformer_enc_layers=1,
        compute_dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    b, t, h, w, n = 1, 2, 32, 32, 2
    images = jax.random.normal(rng, (b, t, h, w, 3))
    distill = jax.random.normal(jax.random.PRNGKey(5), (b, t, h, w, 3))
    affine = jnp.broadcast_to(jnp.eye(3), (b, t, 3, 3))
    params = model.init(rng, images)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    masks = jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)) > 0.7
    valid = jnp.ones((b, n), bool)
    step_fn = jax.jit(make_train_step(model, cfg, tx))
    new_state, metrics = step_fn(
        state, images, masks, valid, jax.random.PRNGKey(2),
        distill_images=distill, distill_affine=affine,
    )
    assert np.isfinite(float(metrics["total_loss"]))
    assert "kd_loss_mask" in metrics
