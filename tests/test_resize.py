"""Parity of interpolate_bilinear vs torch F.interpolate(align_corners=False)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2d_tpu.ops import interpolate_bilinear


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (28, 36)), ((16, 16), (5, 11)), ((45, 80), (180, 320)), ((6, 6), (6, 6))],
)
def test_resize_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    out = np.asarray(interpolate_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_resize_leading_dims():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 3, 8, 8).astype(np.float32)
    out = np.asarray(interpolate_bilinear(jnp.asarray(x), (16, 16)))
    assert out.shape == (2, 5, 3, 16, 16)
    ref = F.interpolate(
        torch.from_numpy(x.reshape(-1, 1, 8, 8)), size=(16, 16), mode="bilinear"
    ).numpy().reshape(2, 5, 3, 16, 16)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_composed_interp_matrix_matches_sequential():
    """composed_interp_matrix (upsample -> crop -> resize collapsed to one
    linear map, the TPU postprocess fast path) reproduces the sequential
    f32 pipeline to fp tolerance on both axes."""
    import numpy as np

    import jax.numpy as jnp

    from s2d_tpu.ops.resize import (
        composed_interp_matrix,
        interpolate_bilinear,
    )

    rng = np.random.RandomState(0)
    mh, mw = 12, 20  # stride-4 logits
    pad_h, pad_w = mh * 4, mw * 4
    img_h, img_w = 45, 78  # crop (unpadded image size)
    out_h, out_w = 90, 156
    x = jnp.asarray(rng.randn(3, mh, mw).astype(np.float32))

    seq = interpolate_bilinear(x, (pad_h, pad_w), precision="highest")
    seq = seq[:, :img_h, :img_w]
    seq = interpolate_bilinear(seq, (out_h, out_w), precision="highest")

    mat_h = jnp.asarray(composed_interp_matrix(mh, pad_h, img_h, out_h))
    mat_w = jnp.asarray(composed_interp_matrix(mw, pad_w, img_w, out_w))
    got = jnp.einsum("oh,bhw->bow", mat_h, x)
    got = jnp.einsum("ow,bhw->bho", mat_w, got)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(seq), rtol=1e-5, atol=1e-5
    )


def test_postprocess_composed_bf16_agrees_with_sequential_f32():
    """The bf16 composed postprocess path makes the same top-k/NMS
    decisions as the exact sequential f32 path, with only AMP-class
    boundary flips in the binarized masks."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from s2d_tpu.evaluation.inference import postprocess_video, unpack_masks

    rng = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(rng)
    q, t, mh, mw = 10, 2, 12, 20
    logits = jax.random.normal(k1, (q, 2), jnp.float32)
    masks = jax.random.normal(k2, (q, t, mh, mw), jnp.float32) * 2.0
    kw = dict(
        num_predictions=8, num_classes=1, image_size=(45, 78),
        output_size=(90, 156), use_nms=True, nms_thresh=0.75,
    )
    a = postprocess_video(logits, masks, compute_dtype=jnp.bfloat16, **kw)
    b = postprocess_video(logits, masks, compute_dtype=jnp.float32, **kw)
    np.testing.assert_array_equal(np.asarray(a["labels"]), np.asarray(b["labels"]))
    np.testing.assert_array_equal(np.asarray(a["keep"]), np.asarray(b["keep"]))
    flips = (unpack_masks(a) != unpack_masks(b)).mean()
    assert flips < 0.02, flips
