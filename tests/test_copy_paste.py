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
