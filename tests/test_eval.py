"""Spatio-temporal AP evaluation tests (synthetic tracks)."""
import numpy as np
import pytest

from s2d_tpu.data import rle
from s2d_tpu.evaluation.ytvos_eval import evaluate_vis, iou_seq


def _track(h, w, t, y0, x0, size):
    segs = []
    for _ in range(t):
        m = np.zeros((h, w), bool)
        m[y0 : y0 + size, x0 : x0 + size] = True
        segs.append(rle.encode(m))
    return segs


def test_iou_seq():
    a = _track(32, 32, 2, 4, 4, 8)
    b = _track(32, 32, 2, 4, 4, 8)
    assert iou_seq(a, b) == pytest.approx(1.0)
    c = _track(32, 32, 2, 4, 8, 8)  # half-overlap in x
    assert iou_seq(a, c) == pytest.approx(1.0 / 3.0)
    # None frames count as empty
    a_gap = [a[0], None]
    assert iou_seq(a_gap, b) == pytest.approx(0.5)


def test_perfect_predictions_ap1():
    gts, dts = [], []
    for vid in (1, 2):
        for inst in range(2):
            segs = _track(64, 64, 3, 8 + inst * 24, 8, 12)
            gts.append({"video_id": vid, "category_id": 1, "segmentations": segs})
            dts.append(
                {"video_id": vid, "category_id": 1, "score": 0.9, "segmentations": segs}
            )
    metrics = evaluate_vis(gts, dts)
    assert metrics["AP"] == pytest.approx(1.0)
    assert metrics["AP50"] == pytest.approx(1.0)
    assert metrics["AR100"] == pytest.approx(1.0)


def test_missed_instance_lowers_ap():
    gts, dts = [], []
    for inst in range(2):
        segs = _track(64, 64, 3, 8 + inst * 24, 8, 12)
        gts.append({"video_id": 1, "category_id": 1, "segmentations": segs})
        if inst == 0:
            dts.append(
                {"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": segs}
            )
    metrics = evaluate_vis(gts, dts)
    assert 0.4 < metrics["AP"] < 0.6


def test_false_positive_lowers_precision():
    segs = _track(64, 64, 3, 8, 8, 12)
    far = _track(64, 64, 3, 40, 40, 12)
    gts = [{"video_id": 1, "category_id": 1, "segmentations": segs}]
    dts = [
        {"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": segs},
        {"video_id": 1, "category_id": 1, "score": 0.95, "segmentations": far},
    ]
    metrics = evaluate_vis(gts, dts)
    # higher-scored FP ranked first: precision at recall 1 is 0.5
    assert metrics["AP"] < 1.0
    assert metrics["AR100"] == pytest.approx(1.0)


def test_localization_quality_graded():
    """A prediction with IoU ~0.6 counts at low thresholds only."""
    gt = _track(64, 64, 2, 10, 10, 20)
    # shifted by 5 px: IoU = (15*20)/(2*20*20-15*20) = 0.6
    shifted = _track(64, 64, 2, 15, 10, 20)
    gts = [{"video_id": 1, "category_id": 1, "segmentations": gt}]
    dts = [{"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": shifted}]
    metrics = evaluate_vis(gts, dts)
    assert metrics["AP50"] == pytest.approx(1.0)
    assert metrics["AP75"] == pytest.approx(0.0)
    assert 0.0 < metrics["AP"] < 0.5


def test_box_detection_ap():
    from s2d_tpu.evaluation.ytvos_eval import evaluate_detections_boxes

    gts, dts = [], []
    for img in (1, 2):
        gts.append({"image_id": img, "category_id": 1, "bbox": [10, 10, 50, 50]})
        dts.append({"image_id": img, "category_id": 1, "bbox": [10, 10, 50, 50],
                    "score": 0.9})
    metrics = evaluate_detections_boxes(gts, dts)
    assert metrics["AP"] == pytest.approx(1.0)
    # shifted detection only counts at low thresholds
    dts_off = [dict(d, bbox=[20, 10, 60, 50]) for d in dts]
    m2 = evaluate_detections_boxes(gts, dts_off)
    assert m2["AP50"] == pytest.approx(1.0)
    assert m2["AP75"] == pytest.approx(0.0)


def test_verify_results():
    from s2d_tpu.evaluation.verify import verify_results

    metrics = {"AP": 0.42, "AP50": 0.7}
    assert verify_results([("segm", "AP", 0.42, 0.02)], metrics)
    assert verify_results([], metrics)
    with pytest.raises(AssertionError):
        verify_results([("segm", "AP", 0.8, 0.02)], metrics)
    with pytest.raises(AssertionError):
        verify_results([("segm", "MISSING_METRIC", 0.5, 0.1)], metrics)


def test_postprocess_masks_bitpacked_roundtrip():
    """postprocess_video ships masks bit-packed along H (8x smaller
    readback; H not W — lane-axis packing lowers to a cross-lane shuffle
    on TPU); finalize/unpack must restore them exactly — incl. a height
    that is NOT a multiple of 8 (the pad byte's tail bits are cropped)."""
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import (
        finalize_predictions,
        postprocess_video,
        unpack_masks,
    )

    rng = np.random.default_rng(7)
    q, k, t, h4, w4 = 6, 1, 2, 8, 13  # output 30x52: 52 % 8 != 0
    out_size = (30, 52)
    logits = jnp.asarray(rng.normal(size=(q, k + 1)), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(q, t, h4, w4)) * 3, jnp.float32)
    dev = postprocess_video(
        logits,
        masks,
        num_predictions=q,
        num_classes=k,
        image_size=(h4 * 4, w4 * 4),
        output_size=out_size,
        use_nms=True,
        nms_thresh=0.75,
        compute_dtype=jnp.float32,
    )
    assert np.asarray(dev["masks"]).dtype == np.uint8
    assert dev["masks"].shape[-2] == (out_size[0] + 7) // 8  # 30 % 8 != 0
    assert dev["masks"].shape[-1] == out_size[1]
    got = unpack_masks(dev)
    assert got.shape == (q, t, *out_size) and got.dtype == bool

    # content: the packed bits are exactly the binarized resized logits —
    # recompute the expected masks through the same f32 chain, unpacked
    import jax

    from s2d_tpu.ops.resize import interpolate_bilinear

    sc = np.asarray(jax.nn.softmax(logits, axis=-1))[:, :-1].reshape(-1)
    order = np.argsort(-sc)  # k=1 so flat index == query index
    sel = jnp.asarray(np.asarray(masks)[order], jnp.float32)
    up = interpolate_bilinear(sel, (h4 * 4, w4 * 4), precision="default")
    expected = np.asarray(
        interpolate_bilinear(up, out_size, precision="default") > 0.0
    )
    np.testing.assert_array_equal(got, expected)

    fin = finalize_predictions(dev)
    keep = np.asarray(dev["keep"])
    np.testing.assert_array_equal(fin["masks"], got[keep])

    # plain-bool dicts (hand-built) pass through unchanged
    plain = {"masks": got, "keep": keep,
             "scores": np.asarray(dev["scores"]),
             "labels": np.asarray(dev["labels"])}
    np.testing.assert_array_equal(unpack_masks(plain), got)


def test_pack_masks_env_flip_takes_effect(monkeypatch):
    """S2D_PACK_MASKS is resolved per CALL in the un-jitted wrapper — a
    mid-process flip must change the output layout (not be baked into the
    first trace's jit cache)."""
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import postprocess_video

    rng = np.random.default_rng(3)
    q, k, t, h4, w4 = 4, 1, 1, 4, 6
    logits = jnp.asarray(rng.normal(size=(q, k + 1)), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(q, t, h4, w4)), jnp.float32)
    kwargs = dict(
        num_predictions=q, num_classes=k,
        image_size=(h4 * 4, w4 * 4), output_size=(16, 24),
        use_nms=False, nms_thresh=0.75, compute_dtype=jnp.float32,
    )
    monkeypatch.setenv("S2D_PACK_MASKS", "1")
    packed = postprocess_video(logits, masks, **kwargs)
    assert np.asarray(packed["masks"]).dtype == np.uint8
    monkeypatch.setenv("S2D_PACK_MASKS", "0")
    plain = postprocess_video(logits, masks, **kwargs)
    assert np.asarray(plain["masks"]).dtype == np.bool_


def test_bbox_crop_transport_bit_exact():
    """VERDICT r4 #1: the bbox-crop mask transport (device crops +
    host paste) reproduces the full-canvas masks BIT-EXACTLY, survivors
    only, at a canvas where cropping actually engages (crop window well
    under the 0.7 fallback ratio) — preserving
    instances_to_coco_json_video semantics (reference
    ytvis_eval.py:324-361)."""
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import (
        finalize_predictions,
        postprocess_video,
        read_kept_masks,
        read_small_bundle,
        start_kept_masks_read,
    )

    rng = np.random.default_rng(23)
    q, k, t, h4, w4 = 8, 1, 3, 16, 24
    out_h, out_w = 512, 768  # big canvas, small objects -> real cropping
    logits = jnp.asarray(rng.normal(size=(q, k + 1)), jnp.float32)
    # localized blobs: strong positive logit in one small region per query
    m = np.full((q, t, h4, w4), -5.0, np.float32)
    for i in range(q):
        y, x = rng.integers(0, h4 - 3), rng.integers(0, w4 - 4)
        m[i, :, y: y + 3, x: x + 4] = 5.0 + rng.normal(size=(t, 3, 4))
    masks = jnp.asarray(m)
    kwargs = dict(
        num_predictions=q, num_classes=k,
        image_size=(h4 * 4, w4 * 4), output_size=(out_h, out_w),
        use_nms=True, nms_thresh=0.5, compute_dtype=jnp.float32,
    )
    dev = postprocess_video(logits, masks, pack_bits=True, **kwargs)
    plain = postprocess_video(logits, masks, pack_bits=False, **kwargs)
    scores, labels, keep, boxes = read_small_bundle(dev)
    n = int(keep.sum())
    assert n > 0
    # the crop path engages (not the fallback): assert via the handle kind
    handle = start_kept_masks_read(dev, keep, boxes=boxes)
    assert handle[0] == "crops", handle[0]
    want = np.asarray(plain["masks"])[keep]
    got = read_kept_masks(dev, keep, boxes=boxes)
    np.testing.assert_array_equal(got, want)
    # finalize_predictions routes through the same crop path
    fin = finalize_predictions(dev)
    np.testing.assert_array_equal(fin["masks"], want)
    # the crop transfer really is smaller than the full packed buffer
    crops = np.asarray(handle[1])
    full_packed = np.asarray(dev["masks"])
    assert crops.size < 0.7 * full_packed.size

    # paste-free WindowMasks -> results.json equals the full-canvas path
    from s2d_tpu.evaluation.evaluator import predictions_to_results
    from s2d_tpu.evaluation.inference import (
        WindowMasks,
        finish_kept_masks_read,
    )

    handle2 = start_kept_masks_read(dev, keep, boxes=boxes)
    win = finish_kept_masks_read(handle2, keep, as_window=True)
    assert isinstance(win, WindowMasks)
    np.testing.assert_array_equal(win.paste(), want)
    preds_scores = scores[keep]
    preds_labels = labels[keep]
    r_win = predictions_to_results(
        7, {"scores": preds_scores, "labels": preds_labels, "masks": win}
    )
    r_full = predictions_to_results(
        7, {"scores": preds_scores, "labels": preds_labels, "masks": want}
    )
    assert r_win == r_full


def test_keep_compaction_roundtrips():
    """Kept-first packed layout: the sliced-transfer path, the full-buffer
    inverse-permutation path, and the small bundle must all reproduce the
    plain path — including the no-survivors edge (keep all-False)."""
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import (
        finalize_predictions,
        read_kept_masks,
        read_small_bundle,
        unpack_masks,
    )

    rng = np.random.default_rng(11)
    q, k, t, h4, w4 = 6, 2, 2, 4, 6
    logits = jnp.asarray(rng.normal(size=(q, k + 1)), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(q * k, t, h4, w4))[:q], jnp.float32)
    kwargs = dict(
        num_predictions=q, num_classes=k,
        image_size=(h4 * 4, w4 * 4), output_size=(16, 24),
        use_nms=True, nms_thresh=0.3, compute_dtype=jnp.float32,
    )
    from s2d_tpu.evaluation.inference import postprocess_video

    dev = postprocess_video(logits, masks, pack_bits=True, **kwargs)
    plain = postprocess_video(logits, masks, pack_bits=False, **kwargs)
    keep = np.asarray(dev["keep"])
    assert 0 < keep.sum() < q  # NMS at 0.3 drops some but not all

    # small bundle == individual reads (+ kept-first crop boxes)
    scores, labels, kb, boxes = read_small_bundle(dev)
    np.testing.assert_array_equal(scores, np.asarray(dev["scores"]))
    np.testing.assert_array_equal(labels, np.asarray(dev["labels"]))
    np.testing.assert_array_equal(kb, keep)
    np.testing.assert_array_equal(boxes, np.asarray(dev["boxes"]))

    # sliced transfer == plain masks filtered
    want = np.asarray(plain["masks"])[keep]
    np.testing.assert_array_equal(read_kept_masks(dev, keep), want)
    # full-buffer unpack inverts the kept-first permutation
    np.testing.assert_array_equal(unpack_masks(dev), np.asarray(plain["masks"]))
    fin = finalize_predictions(dev)
    np.testing.assert_array_equal(fin["masks"], want)

    # no survivors: finalize yields empty arrays, not a crash
    none = dict(dev)
    none["keep"] = jnp.zeros((q,), bool)
    p = np.asarray(none["small"]).size // 8
    small = np.asarray(none["small"]).copy()
    small[2 * p: 3 * p] = 0.0
    none["small"] = jnp.asarray(small)
    fin0 = finalize_predictions(none)
    assert fin0["masks"].shape[0] == 0 and fin0["scores"].size == 0
