"""Copy-paste clip augmentation tests."""
import numpy as np

from s2d_tpu.data.copy_paste import copy_paste_clip


def _sample(seed, n_valid=1, t=2, h=32, w=32):
    rng = np.random.RandomState(seed)
    image = rng.rand(t, h, w, 3).astype(np.float32) * 255
    masks = np.zeros((4, t, h, w), bool)
    valid = np.zeros(4, bool)
    for n in range(n_valid):
        masks[n, :, 4 + 8 * n : 10 + 8 * n, 4:10] = True
        valid[n] = True
    return {"image": image, "masks": masks, "valid": valid}


def test_paste_adds_instance():
    rng = np.random.RandomState(0)
    dst = _sample(0, n_valid=1)
    src = _sample(1, n_valid=2)
    out = copy_paste_clip(rng, dst, src, rate=1.0)
    assert out["valid"].sum() >= dst["valid"].sum()
    # pasted pixels overwrite the image
    new_ids = np.flatnonzero(out["valid"] & ~dst["valid"])
    for nid in new_ids:
        pm = out["masks"][nid]
        assert pm.any()
        assert not np.allclose(out["image"][pm], dst["image"][pm])


def test_rate_zero_is_identity():
    rng = np.random.RandomState(0)
    dst = _sample(2)
    src = _sample(3, n_valid=2)
    out = copy_paste_clip(rng, dst, src, rate=0.0)
    np.testing.assert_array_equal(out["image"], dst["image"])
    np.testing.assert_array_equal(out["valid"], dst["valid"])


def test_existing_masks_carved():
    rng = np.random.RandomState(1)
    dst = _sample(4, n_valid=1)
    src = _sample(5, n_valid=2)
    out = copy_paste_clip(rng, dst, src, rate=1.0, min_ratio=1.0, max_ratio=1.0)
    new_ids = np.flatnonzero(out["valid"] & ~dst["valid"])
    if len(new_ids):
        pasted = out["masks"][new_ids].any(axis=0)
        # no original instance overlaps the pasted region anymore
        originals = out["masks"][np.flatnonzero(dst["valid"])]
        assert not (originals & pasted).any()


# ---------------------------------------------------------------------------
# propagate_sparse_masks (reference train_loop.py:30-156)

def test_propagate_fills_missing_frames():
    from s2d_tpu.data.copy_paste import propagate_sparse_masks

    rng = np.random.RandomState(0)
    masks = np.zeros((2, 4, 32, 32), bool)
    valid = np.array([True, False])
    masks[0, 0, 10:20, 10:20] = True  # present frame 0, missing 1-3
    out = propagate_sparse_masks(masks, valid, rng, max_shift=2)
    for fi in range(1, 4):
        assert out[0, fi].any(), f"frame {fi} not filled"
        # filled mask is the previous frame's mask within a +-2px shift
        ys, xs = np.nonzero(out[0, fi])
        pys, pxs = np.nonzero(out[0, fi - 1])
        assert abs(ys.min() - pys.min()) <= 2 and abs(xs.min() - pxs.min()) <= 2
    # invalid track untouched
    assert not out[1].any()
    # input not mutated
    assert not masks[0, 1].any()


def test_propagate_no_backfill():
    """Ids are only filled from PRECEDING frames (forward fill)."""
    from s2d_tpu.data.copy_paste import propagate_sparse_masks

    rng = np.random.RandomState(0)
    masks = np.zeros((1, 3, 16, 16), bool)
    masks[0, 2, 4:8, 4:8] = True  # appears only in the last frame
    out = propagate_sparse_masks(masks, np.array([True]), rng)
    assert not out[0, 0].any() and not out[0, 1].any()


# ---------------------------------------------------------------------------
# batch-level wiring (reference train_loop.py:703 reversed-batch pairing)

def test_apply_clip_copy_paste_changes_batch():
    from s2d_tpu.data.copy_paste import apply_clip_copy_paste

    rng = np.random.RandomState(0)
    samples = [_sample(0, n_valid=1), _sample(1, n_valid=2)]
    out = apply_clip_copy_paste(samples, rng, rate=1.0)
    assert len(out) == 2
    changed = any(
        not np.array_equal(o["image"], s["image"]) for o, s in zip(out, samples)
    )
    assert changed, "copy-paste ON must change training batches"
    for o, s in zip(out, samples):
        assert o["image"].shape == s["image"].shape


def test_apply_clip_copy_paste_rate_zero_identity():
    from s2d_tpu.data.copy_paste import apply_clip_copy_paste

    rng = np.random.RandomState(0)
    samples = [_sample(2), _sample(3)]
    out = apply_clip_copy_paste(samples, rng, rate=0.0)
    for o, s in zip(out, samples):
        np.testing.assert_array_equal(o["image"], s["image"])
        np.testing.assert_array_equal(o["masks"], s["masks"])


def test_apply_clip_copy_paste_densify_sparse():
    """densify_sparse swaps pasting for forward-filling (train_loop.py:433)."""
    from s2d_tpu.data.copy_paste import apply_clip_copy_paste

    rng = np.random.RandomState(0)
    a = _sample(0, n_valid=1, t=3)
    a["masks"][0, 1] = False  # sparse: frame 1 missing
    a["masks"][0, 2] = False
    b = _sample(1, n_valid=1, t=3)
    out = apply_clip_copy_paste([a, b], rng, rate=1.0, densify_sparse=True)
    # densified, not pasted: image unchanged, no new instances
    np.testing.assert_array_equal(out[0]["image"], a["image"])
    assert out[0]["valid"].sum() == a["valid"].sum()
    assert out[0]["masks"][0, 1].any() and out[0]["masks"][0, 2].any()


# ---------------------------------------------------------------------------
# image copy-paste (reference cutler/engine/train_loop.py:90-230)

def _image_sample(seed, n_valid=1, s=64):
    rng = np.random.RandomState(seed)
    image = rng.rand(s, s, 3).astype(np.float32)
    masks = np.zeros((4, s, s), bool)
    boxes = np.zeros((4, 4), np.float32)
    labels = np.zeros((4,), np.int32)
    valid = np.zeros(4, bool)
    for n in range(n_valid):
        y0 = 8 + 12 * n
        masks[n, y0:y0 + 10, 8:20] = True
        boxes[n] = [8, y0, 20, y0 + 10]
        valid[n] = True
    return {"image": image, "masks": masks, "boxes": boxes,
            "labels": labels, "valid": valid}


def test_copy_paste_image_adds_and_carves():
    from s2d_tpu.data.copy_paste import copy_paste_image

    rng = np.random.RandomState(0)
    dst = _image_sample(0, n_valid=1)
    src = _image_sample(1, n_valid=3)
    out = copy_paste_image(rng, dst, src, rate=1.0, random_num=False)
    new_ids = np.flatnonzero(out["valid"] & ~dst["valid"])
    assert len(new_ids) > 0
    pasted = out["masks"][new_ids].any(axis=0)
    # pasted pixels overwrite the image
    assert not np.allclose(out["image"][pasted], dst["image"][pasted])
    # existing instances carved where pasted
    originals = out["masks"][np.flatnonzero(dst["valid"] & out["valid"])]
    assert not (originals & pasted).any()
    # boxes recomputed from masks
    for i in np.flatnonzero(out["valid"]):
        ys, xs = np.nonzero(out["masks"][i])
        np.testing.assert_allclose(
            out["boxes"][i], [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        )


def test_copy_paste_image_rate_zero_identity():
    from s2d_tpu.data.copy_paste import copy_paste_image

    rng = np.random.RandomState(0)
    dst = _image_sample(2)
    out = copy_paste_image(rng, dst, _image_sample(3, n_valid=2), rate=0.0)
    np.testing.assert_array_equal(out["image"], dst["image"])


def test_copy_paste_image_full_slots_no_orphan_pixels():
    """When the destination has no free annotation slots, copy-paste must
    be a no-op: compositing pasted pixels without assigning them a label
    would train on visible-but-unannotated objects (and carve the labeled
    ones under them)."""
    from s2d_tpu.data.copy_paste import copy_paste_image

    rng = np.random.RandomState(0)
    dst = _image_sample(0, n_valid=4)  # all 4 slots taken
    src = _image_sample(1, n_valid=3)
    out = copy_paste_image(rng, dst, src, rate=1.0, random_num=False)
    np.testing.assert_array_equal(out["image"], dst["image"])
    np.testing.assert_array_equal(out["masks"], dst["masks"])
    np.testing.assert_array_equal(out["valid"], dst["valid"])


def test_copy_paste_image_partial_slots_every_pixel_labeled():
    """With fewer free slots than paste candidates, every composited
    pasted pixel must belong to some labeled instance."""
    from s2d_tpu.data.copy_paste import copy_paste_image

    rng = np.random.RandomState(0)
    dst = _image_sample(0, n_valid=3)  # one free slot, 3 candidates
    src = _image_sample(1, n_valid=3)
    out = copy_paste_image(rng, dst, src, rate=1.0, random_num=False)
    changed = np.any(out["image"] != dst["image"], axis=-1)
    if changed.any():
        labeled = out["masks"][out["valid"]].any(axis=0)
        assert not (changed & ~labeled).any(), (
            "composited pixels outside every labeled instance"
        )
