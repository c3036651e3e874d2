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
