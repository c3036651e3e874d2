"""Fused point-loss kernel (ops/point_loss_pallas.py) vs the XLA lattice
path: identical sums and src-gradients in f32 interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.ops.lattice import lattice_sample
from s2d_tpu.ops.point_loss_pallas import fused_point_sums


def _reference_sums(src, tgt, bern, thr, phase, ly, lx):
    r = src.shape[0]
    pv = lattice_sample(src, ly, lx, phase).reshape(r, -1)
    tv = lattice_sample(tgt, ly, lx, phase).reshape(r, -1)
    sel = (
        -jnp.abs(jax.lax.stop_gradient(pv)) >= thr.reshape(r, 1)
    ).astype(pv.dtype)
    w = bern.astype(pv.dtype) + sel
    ce = jnp.maximum(pv, 0.0) - pv * tv + jax.nn.softplus(-jnp.abs(pv))
    probs = jax.nn.sigmoid(pv)
    return (
        (ce * w).sum(axis=1),
        w.sum(axis=1),
        (probs * tv * w).sum(axis=1),
        (probs * w).sum(axis=1),
        (tv * w).sum(axis=1),
    )


@pytest.mark.parametrize("shapes", [
    ((4, 6, 8), (4, 12, 16), 24, 16),   # pred up x2, tgt up x2/y only
    ((3, 4, 10), (3, 8, 20), 8, 40),    # x upsample both
    ((2, 5, 24), (2, 10, 12), 10, 12),  # tgt x DOWNSAMPLE (24 -> 12)
])
def test_fused_point_sums_matches_xla(shapes):
    (sp, tp, ly, lx) = shapes
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(*sp).astype(np.float32))
    tgt = jnp.asarray((rng.rand(*tp) > 0.5).astype(np.float32))
    bern = jnp.asarray(rng.rand(sp[0], ly * lx) < 0.3)
    thr = jnp.asarray(rng.rand(sp[0]).astype(np.float32) * -0.5)
    phase = jnp.asarray([0.3, 0.7], jnp.float32)

    got = fused_point_sums(
        src, tgt, bern, thr, phase, ly, lx, jnp.float32, True
    )
    ref = _reference_sums(src, tgt, bern, thr, phase, ly, lx)
    for g, rf in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(rf), rtol=2e-5, atol=2e-5
        )


def test_fused_point_sums_grad_matches_xla():
    rng = np.random.RandomState(1)
    sp, tp, ly, lx = (4, 6, 8), (4, 12, 16), 24, 16
    src = jnp.asarray(rng.randn(*sp).astype(np.float32))
    tgt = jnp.asarray((rng.rand(*tp) > 0.5).astype(np.float32))
    bern = jnp.asarray(rng.rand(sp[0], ly * lx) < 0.3)
    thr = jnp.asarray(rng.rand(sp[0]).astype(np.float32) * -0.5)
    phase = jnp.asarray([0.3, 0.7], jnp.float32)
    cot = jnp.asarray(rng.randn(3, sp[0]).astype(np.float32))

    def fused_total(s):
        ce, cnt, num, ps, ts = fused_point_sums(
            s, tgt, bern, thr, phase, ly, lx, jnp.float32, True
        )
        # cnt/ts are weight/target sums (no src grad); combine the rest
        return (cot[0] * ce + cot[1] * num + cot[2] * ps).sum()

    def ref_total(s):
        ce, cnt, num, ps, ts = _reference_sums(
            s, tgt, bern, thr, phase, ly, lx
        )
        return (cot[0] * ce + cot[1] * num + cot[2] * ps).sum()

    g_fused = jax.grad(fused_total)(src)
    g_ref = jax.grad(ref_total)(src)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_criterion_fused_matches_unfused():
    """set_criterion with fused_point_loss=on (interpret on CPU) vs off:
    identical with selection disabled (same pools, same Bernoulli draw);
    close with selection on (the fused path estimates the uncertainty
    threshold from a sub-lattice instead of the strided-flat subsample)."""
    import dataclasses

    from s2d_tpu.losses import CriterionConfig, set_criterion

    rng = np.random.RandomState(5)
    b, q, n, t, hp, wp = 1, 6, 3, 2, 8, 12
    h, w = hp * 4, wp * 4
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, q, 2).astype(np.float32)),
        "pred_masks": jnp.asarray(
            rng.randn(b, q, t, hp, wp).astype(np.float32)
        ),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
    }
    masks = jnp.asarray(rng.rand(b, n, t, h, w) > 0.6)
    valid = jnp.asarray([[True, True, False]])

    base = CriterionConfig(
        num_points=1536, point_sampling="lattice",
        importance_sample_ratio=0.0,
    )
    l_off = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid,
        dataclasses.replace(base, fused_point_loss="off"),
    )
    l_on = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid,
        dataclasses.replace(base, fused_point_loss="on"),
    )
    for k in ("loss_mask", "loss_dice"):
        np.testing.assert_allclose(
            float(l_on[k]), float(l_off[k]), rtol=1e-4, atol=1e-5
        )

    # with selection: different (both unbiased) threshold subsamples
    sel = dataclasses.replace(base, importance_sample_ratio=0.75)
    l_off = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid,
        dataclasses.replace(sel, fused_point_loss="off"),
    )
    l_on = set_criterion(
        jax.random.PRNGKey(0), outputs, masks, valid,
        dataclasses.replace(sel, fused_point_loss="on"),
    )
    for k in ("loss_mask", "loss_dice"):
        a, b_ = float(l_on[k]), float(l_off[k])
        assert np.isfinite(a)
        assert abs(a - b_) < 0.1 * max(1.0, abs(b_)), (k, a, b_)

    def total(pm):
        lo = dict(outputs, pred_masks=pm)
        ls = set_criterion(
            jax.random.PRNGKey(0), lo, masks, valid,
            dataclasses.replace(sel, fused_point_loss="on"),
        )
        return ls["loss_mask"] + ls["loss_dice"]

    g = jax.grad(total)(outputs["pred_masks"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
