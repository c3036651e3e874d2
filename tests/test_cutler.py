"""CutLER detector: box ops golden values, ROIAlign sanity, DropLoss
semantics, end-to-end tiny forward + losses."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.ops.boxes import (
    box_nms,
    decode_deltas,
    encode_deltas,
    pairwise_iou,
)
from s2d_tpu.ops.roi_align import roi_align
from s2d_tpu.models.cutler import (
    CutlerConfig,
    CutlerRCNN,
    generate_anchors,
    roi_losses,
    rpn_losses,
)


def test_pairwise_iou_golden():
    a = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
    b = jnp.asarray([[0.0, 0, 10, 10], [10, 10, 20, 20]])
    iou = np.asarray(pairwise_iou(a, b))
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(0.0)
    assert iou[1, 1] == pytest.approx(25.0 / 175.0)


def test_deltas_roundtrip():
    rng = np.random.RandomState(0)
    src = rng.rand(6, 4) * 50
    src[:, 2:] = src[:, :2] + 10 + rng.rand(6, 2) * 40
    tgt = rng.rand(6, 4) * 50
    tgt[:, 2:] = tgt[:, :2] + 10 + rng.rand(6, 2) * 40
    deltas = encode_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = np.asarray(decode_deltas(jnp.asarray(src), deltas))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)


def test_box_nms():
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(box_nms(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_roi_align_constant_region():
    feats = jnp.zeros((16, 16, 3)).at[4:12, 4:12, :].set(2.0)
    boxes = jnp.asarray([[5.0, 5, 11, 11]])
    out = np.asarray(roi_align(feats, boxes, output_size=4))
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_generate_anchors_shapes():
    anchors = generate_anchors([(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
    assert anchors[0].shape == (8 * 8 * 3, 4)
    # aspect-1 anchor at the first cell of p2 is 32x32 centred on (2, 2)
    a1 = anchors[0][1]
    assert a1[2] - a1[0] == pytest.approx(32.0)
    assert (a1[0] + a1[2]) / 2 == pytest.approx(2.0)


@pytest.fixture(scope="module")
def tiny_rcnn():
    cfg = CutlerConfig(num_proposals=16, pre_nms_topk=64)
    model = CutlerRCNN(cfg=cfg)
    image = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), image)
    return cfg, model, params, image


def test_rcnn_forward_shapes(tiny_rcnn):
    cfg, model, params, image = tiny_rcnn
    out = model.apply(params, image)
    assert out["proposals"].shape == (16, 4)
    assert len(out["stages"]) == 3
    assert out["stages"][0]["scores"].shape == (16, 2)
    assert out["mask_logits"].shape == (16, 28, 28)


def test_mask_loss(tiny_rcnn):
    from s2d_tpu.models.cutler import mask_loss

    cfg, model, params, image = tiny_rcnn
    out = model.apply(params, image)
    gt_masks = jnp.zeros((2, 64, 64), bool).at[0, 10:40, 10:40].set(True)
    gt_boxes = jnp.asarray([[10.0, 10, 40, 40], [0.0, 0, 1, 1]])
    gt_valid = jnp.asarray([True, False])
    losses = mask_loss(out, gt_masks, gt_boxes, gt_valid, cfg)
    assert np.isfinite(float(losses["loss_mask"]))


def test_rcnn_losses_and_droploss(tiny_rcnn):
    cfg, model, params, image = tiny_rcnn
    out = model.apply(params, image)
    gt_boxes = jnp.asarray([[8.0, 8, 40, 40], [0.0, 0, 1, 1]])
    gt_labels = jnp.asarray([0, 0])
    gt_valid = jnp.asarray([True, False])

    rl = rpn_losses(out, gt_boxes, gt_valid)
    assert np.isfinite(float(rl["loss_rpn_cls"]))
    assert np.isfinite(float(rl["loss_rpn_loc"]))

    losses = roi_losses(out, gt_boxes, gt_labels, gt_valid, cfg)
    assert np.isfinite(float(losses["loss_cls_stage0"]))

    # DropLoss semantics: with threshold above every proposal's IoU the
    # classification loss is exactly zero (all proposals dropped)
    cfg_all_drop = CutlerConfig(
        num_proposals=16, pre_nms_topk=64, droploss_iou_thresh=1.1
    )
    dropped = roi_losses(out, gt_boxes, gt_labels, gt_valid, cfg_all_drop)
    assert float(dropped["loss_cls_stage0"]) == 0.0
    # box loss unaffected by DropLoss (reference drops only cls for bg-like)
    np.testing.assert_allclose(
        float(dropped["loss_box_stage0"]), float(losses["loss_box_stage0"]), rtol=1e-6
    )
