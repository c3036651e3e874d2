"""Random-phase lattice point sampling (ops/lattice.py): exact parity with
the gather-based bilinear sampler at the lattice coordinates, dense
gradients, lattice selection validity, and the criterion's lattice mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.ops.lattice import (
    choose_lattice,
    lattice_coords,
    lattice_sample,
    valid_axis_counts,
)
from s2d_tpu.ops.sampling import point_sample


def _gather_reference(maps, ly, lx, phase):
    """point_sample at the same coords (the torch-parity gather path)."""
    coords = lattice_coords(ly, lx, phase)
    r = maps.shape[0]
    out = point_sample(
        maps[:, None], jnp.broadcast_to(coords, (r, *coords.shape))
    )[:, 0]
    return out.reshape(r, ly, lx)


@pytest.mark.parametrize(
    "hw,lat",
    [
        ((8, 12), (16, 24)),  # pure upsample
        ((8, 12), (4, 6)),  # pure downsample
        ((8, 12), (24, 4)),  # mixed, non-square multipliers
        ((6, 10), (6, 10)),  # identity counts (phase still shifts)
    ],
)
def test_lattice_sample_matches_gather(hw, lat):
    rng = np.random.RandomState(0)
    maps = jnp.asarray(rng.randn(5, *hw).astype(np.float32))
    for seed in range(3):
        phase = jax.random.uniform(jax.random.PRNGKey(seed), (2,))
        got = lattice_sample(maps, *lat, phase)
        ref = _gather_reference(maps, *lat, phase)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_lattice_sample_gradients_match_gather():
    rng = np.random.RandomState(1)
    maps = jnp.asarray(rng.randn(3, 8, 12).astype(np.float32))
    phase = jnp.asarray([0.37, 0.81], jnp.float32)
    cot = jnp.asarray(rng.randn(3, 16, 6).astype(np.float32))

    g_lat = jax.grad(
        lambda m: (lattice_sample(m, 16, 6, phase) * cot).sum()
    )(maps)
    g_ref = jax.grad(
        lambda m: (_gather_reference(m, 16, 6, phase) * cot).sum()
    )(maps)
    np.testing.assert_allclose(
        np.asarray(g_lat), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_valid_axis_counts_divisibility():
    for L in valid_axis_counts([8, 32]):
        assert (L % 8 == 0 or 8 % L == 0) and (L % 32 == 0 or 32 % L == 0)


def test_choose_lattice_properties():
    # s2d full-scale shapes: pred 92x160, target 368x640, nominal 480000
    ly, lx = choose_lattice(480000, (92, 368), (160, 640))
    for n in (92, 368):
        assert ly % n == 0 or n % ly == 0
    for n in (160, 640):
        assert lx % n == 0 or n % lx == 0
    s = ly * lx
    assert 0.5 * 480000 <= s <= 2.0 * 480000  # count within 2x of nominal
    assert max(ly, lx) / min(ly, lx) < 16  # no degenerate aspect


def test_lattice_stratified_mc_is_unbiased():
    """Mean over random phases of the lattice-pool average converges to the
    SAME integral the iid pool estimates: the mean of the bilinearly
    interpolated field over the unit square (zeros outside the border, so
    this is NOT the pixel mean — both samplers share that boundary blend)."""
    rng = np.random.RandomState(2)
    maps = jnp.asarray(rng.rand(1, 8, 8).astype(np.float32))
    iid_pts = jax.random.uniform(jax.random.PRNGKey(99), (1, 200000, 2))
    exact = float(point_sample(maps[:, None], iid_pts).mean())
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    ests = [
        float(lattice_sample(maps, 16, 16, jax.random.uniform(k, (2,))).mean())
        for k in keys
    ]
    assert abs(np.mean(ests) - exact) < 5e-3


def test_criterion_lattice_mode():
    """set_criterion with point_sampling='lattice': finite losses, finite
    dense gradients, and agreement with iid mode at saturated point count
    (both are MC estimates of the same integrals; at point counts far above
    the mask resolution both sit near the exact value)."""
    import dataclasses

    from s2d_tpu.losses import CriterionConfig, set_criterion

    rng = np.random.RandomState(3)
    b, q, n, t, hp, wp = 1, 6, 3, 2, 8, 12
    h, w = hp * 4, wp * 4
    masks_np = rng.rand(b, n, t, h, w) > 0.6
    # make the optimal assignment unambiguous (query i ~ target i): with
    # random predictions near-tie matchings flip between point sets, and
    # loss_ce is discontinuous in the assignment
    pred = rng.randn(b, q, t, hp, wp).astype(np.float32) - 3.0
    down = masks_np[:, :, :, ::4, ::4].astype(np.float32)
    pred[:, :n] = 6.0 * down - 3.0
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, q, 2).astype(np.float32)),
        "pred_masks": jnp.asarray(pred),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
    }
    masks = jnp.asarray(masks_np)
    valid = jnp.asarray([[True, True, False]])

    cfg_lat = CriterionConfig(
        num_points=1536, oversample_ratio=3.0, point_sampling="lattice"
    )
    cfg_iid = dataclasses.replace(cfg_lat, point_sampling="iid")

    losses_lat = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid, cfg_lat
    )
    losses_iid = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid, cfg_iid
    )
    assert set(losses_lat) == set(losses_iid)
    for k in losses_lat:
        a, b_ = float(losses_lat[k]), float(losses_iid[k])
        assert np.isfinite(a)
        assert abs(a - b_) < 0.15 * max(1.0, abs(b_)), (k, a, b_)

    def total(pm):
        lo = dict(outputs, pred_masks=pm)
        ls = set_criterion(jax.random.PRNGKey(0), lo, masks, valid, cfg_lat)
        return ls["loss_mask"] + ls["loss_dice"]

    g = jax.grad(total)(outputs["pred_masks"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

    # AMP mode: the (R, S) loss chain runs in bf16 with f32 reductions —
    # values must stay within bf16-noise of the exact f32 path
    cfg_amp = dataclasses.replace(cfg_lat, gather_dtype=jnp.bfloat16)
    losses_amp = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid, cfg_amp
    )
    for k in ("loss_mask", "loss_dice"):
        a, b_ = float(losses_amp[k]), float(losses_lat[k])
        assert np.isfinite(a)
        assert abs(a - b_) < 0.03 * max(1.0, abs(b_)), (k, a, b_)
    g_amp = jax.grad(
        lambda pm: sum(
            v for kk, v in set_criterion(
                jax.random.PRNGKey(0), dict(outputs, pred_masks=pm), masks,
                valid, cfg_amp,
            ).items() if kk != "loss_ce"
        )
    )(outputs["pred_masks"])
    assert np.all(np.isfinite(np.asarray(g_amp)))
