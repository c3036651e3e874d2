"""Parity of grid_sample / point_sample vs torch (CPU) reference semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2d_tpu.ops import grid_sample, point_sample


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(2, 3, 8, 11), (1, 16, 5, 7)])
def test_grid_sample_matches_torch(seed, shape):
    rng = np.random.RandomState(seed)
    n, c, h, w = shape
    x = rng.randn(n, c, h, w).astype(np.float32)
    # include far out-of-bounds coords to exercise zero padding
    grid = rng.uniform(-1.7, 1.7, size=(n, 6, 9, 2)).astype(np.float32)

    ref = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).numpy()
    out = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_onehot_impl_matches_gather():
    """The TPU one-hot sparse-einsum path is value-identical to the gather
    path (both bilinear with zero padding)."""
    from s2d_tpu.ops.sampling import grid_sample_rows

    rng = np.random.RandomState(5)
    rows = jnp.asarray(rng.randn(3, 5 * 7, 4).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (3, 11, 2)).astype(np.float32))
    a = np.asarray(grid_sample_rows(rows, grid, 5, 7, impl="gather"))
    b = np.asarray(grid_sample_rows(rows, grid, 5, 7, impl="onehot"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_packed_impl_matches_gather():
    """2x2-packed single-fetch sampling is value-identical to the corner
    gathers, including border clamping and out-of-bounds zero padding."""
    from s2d_tpu.ops.sampling import grid_sample_packed, grid_sample_rows, pack_2x2

    rng = np.random.RandomState(6)
    for (h, w) in [(5, 7), (9, 4), (2, 2)]:
        rows = jnp.asarray(rng.randn(3, h * w, 4).astype(np.float32))
        grid = jnp.asarray(rng.uniform(-1.4, 1.4, (3, 23, 2)).astype(np.float32))
        ref = np.asarray(grid_sample_rows(rows, grid, h, w, impl="gather"))
        packed = pack_2x2(rows, h, w)
        for onehot in (True, False):
            got = np.asarray(grid_sample_packed(packed, grid, h, w, onehot=onehot))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_point_sample_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 10, 13).astype(np.float32)
    pts = rng.uniform(0, 1, size=(2, 37, 2)).astype(np.float32)

    tgrid = torch.from_numpy(2.0 * pts - 1.0).unsqueeze(2)  # (N, P, 1, 2)
    ref = (
        F.grid_sample(torch.from_numpy(x), tgrid, align_corners=False)
        .squeeze(3)
        .numpy()
    )
    out = np.asarray(point_sample(jnp.asarray(x), jnp.asarray(pts)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
