"""Criterion / matcher tests: cost parity vs torch formulas, matching
sanity, DropLoss semantics, fixed-shape invariance under padding."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2d_tpu.losses import (
    CriterionConfig,
    batch_dice_cost,
    batch_sigmoid_ce_cost,
    hungarian_assign,
    set_criterion,
)


def torch_batch_sigmoid_ce(inputs, targets):
    hw = inputs.shape[1]
    pos = F.binary_cross_entropy_with_logits(
        inputs, torch.ones_like(inputs), reduction="none"
    )
    neg = F.binary_cross_entropy_with_logits(
        inputs, torch.zeros_like(inputs), reduction="none"
    )
    return (
        torch.einsum("nc,mc->nm", pos, targets)
        + torch.einsum("nc,mc->nm", neg, (1 - targets))
    ) / hw


def torch_batch_dice(inputs, targets):
    inputs = inputs.sigmoid()
    numerator = 2 * torch.einsum("nc,mc->nm", inputs, targets)
    denominator = inputs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def test_cost_parity_with_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 50).astype(np.float32)
    targets = (rng.rand(4, 50) > 0.5).astype(np.float32)
    ce = np.asarray(batch_sigmoid_ce_cost(jnp.asarray(logits), jnp.asarray(targets)))
    dice = np.asarray(batch_dice_cost(jnp.asarray(logits), jnp.asarray(targets)))
    ce_ref = torch_batch_sigmoid_ce(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    dice_ref = torch_batch_dice(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    np.testing.assert_allclose(ce, ce_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dice, dice_ref, rtol=1e-5, atol=1e-5)


def test_hungarian_assign_matches_scipy():
    """Auction solve attains the scipy-optimal total cost (valid columns)."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(1)
    cost = rng.rand(2, 8, 3).astype(np.float32)
    assign = np.asarray(hungarian_assign(jnp.asarray(cost)))
    for b in range(2):
        rows, cols = linear_sum_assignment(cost[b])
        opt = cost[b][rows, cols].sum()
        got = cost[b][assign[b], np.arange(3)].sum()
        assert len(set(assign[b].tolist())) == 3  # injective
        assert got <= opt + 1e-3


def test_hungarian_assign_with_padding():
    """Invalid columns don't disturb valid columns' assignment."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(7)
    cost = rng.rand(1, 10, 6).astype(np.float32)
    valid = np.array([[True, True, True, False, False, False]])
    assign = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(valid)))
    rows, cols = linear_sum_assignment(cost[0][:, :3])
    opt = cost[0][:, :3][rows, cols].sum()
    got = cost[0][assign[0, :3], np.arange(3)].sum()
    assert got <= opt + 1e-3
    assert len(set(assign[0].tolist())) == 6


def _make_outputs_targets(rng, b=1, q=6, n=3, t=2, hp=8, wp=12):
    h, w = hp * 4, wp * 4
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, q, 2).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(b, q, t, hp, wp).astype(np.float32)),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
    }
    masks = rng.rand(b, n, t, h, w) > 0.6
    return outputs, jnp.asarray(masks), h, w


def test_criterion_basic():
    rng = np.random.RandomState(2)
    outputs, masks, h, w = _make_outputs_targets(rng)
    valid = jnp.asarray([[True, True, False]])
    cfg = CriterionConfig(num_points=64, world_size=1)
    losses = set_criterion(jax.random.PRNGKey(0), outputs, masks, valid, cfg)
    assert set(losses) == {"loss_ce", "loss_mask", "loss_dice"}
    for v in losses.values():
        assert np.isfinite(float(v))
    assert float(losses["loss_dice"]) > 0


def test_criterion_padding_invariance():
    """Adding invalid padded target slots must not change the losses."""
    rng = np.random.RandomState(3)
    outputs, masks, h, w = _make_outputs_targets(rng, n=2)
    cfg = CriterionConfig(num_points=64)
    valid2 = jnp.asarray([[True, True]])
    l1 = set_criterion(jax.random.PRNGKey(0), outputs, masks, valid2, cfg)

    # pad with 3 empty invalid slots
    pad = jnp.zeros((1, 3) + masks.shape[2:], masks.dtype)
    masks_padded = jnp.concatenate([masks, pad], axis=1)
    valid5 = jnp.asarray([[True, True, False, False, False]])
    l2 = set_criterion(jax.random.PRNGKey(0), outputs, masks_padded, valid5, cfg)

    # loss_ce identical; mask losses use per-row point RNG so just compare
    # they are close (same matched pairs, same num_masks; rng split count
    # is identical so values should match exactly)
    np.testing.assert_allclose(float(l1["loss_ce"]), float(l2["loss_ce"]), rtol=1e-6)
    assert abs(float(l1["loss_mask"]) - float(l2["loss_mask"])) < 0.15
    assert abs(float(l1["loss_dice"]) - float(l2["loss_dice"])) < 0.15


def test_droploss_zeroes_empty_frames():
    """A target empty in frame 0 but present in frame 1 contributes only
    its frame-1 row (masks-only strategy)."""
    rng = np.random.RandomState(4)
    outputs, masks, h, w = _make_outputs_targets(rng, n=1)
    masks = masks.at[:, :, 0].set(False)  # frame 0 empty
    valid = jnp.asarray([[True]])
    cfg_drop = CriterionConfig(num_points=64, masks_only=True)
    cfg_full = CriterionConfig(num_points=64, masks_only=False)
    ld = set_criterion(jax.random.PRNGKey(1), outputs, masks, valid, cfg_drop)
    lf = set_criterion(jax.random.PRNGKey(1), outputs, masks, valid, cfg_full)
    # dropping a row strictly reduces the summed loss
    assert float(ld["loss_mask"]) < float(lf["loss_mask"])


def test_criterion_all_empty_targets():
    """All targets empty in all frames -> mask losses are exactly 0
    (reference returns 0.0 when no rows survive DropLoss)."""
    rng = np.random.RandomState(5)
    outputs, masks, h, w = _make_outputs_targets(rng, n=2)
    masks = jnp.zeros_like(masks)
    valid = jnp.asarray([[True, True]])
    cfg = CriterionConfig(num_points=64)
    losses = set_criterion(jax.random.PRNGKey(0), outputs, masks, valid, cfg)
    assert float(losses["loss_mask"]) == 0.0
    assert float(losses["loss_dice"]) == 0.0


def test_criterion_jit_with_aux():
    rng = np.random.RandomState(6)
    outputs, masks, h, w = _make_outputs_targets(rng)
    outputs["aux_pred_logits"] = [outputs["pred_logits"]]
    outputs["aux_pred_masks"] = [outputs["pred_masks"]]
    valid = jnp.asarray([[True, False, False]])
    cfg = CriterionConfig(num_points=32)

    @jax.jit
    def run(key, o, m, v):
        return set_criterion(key, o, m, v, cfg)

    losses = run(jax.random.PRNGKey(0), outputs, masks, valid)
    assert "loss_mask_0" in losses and "loss_dice_0" in losses
    assert "loss_ce_0" not in losses  # labels skipped for aux layers


def test_set_criterion_pair_matches_two_calls():
    """The batched-auction pair produces the same losses as two separate
    set_criterion calls (solves are independent under vmap, so batching
    them changes nothing numerically). When both criteria score the SAME
    outputs dict they share rng_a's point pool (common random numbers —
    see _criterion_costs_multi), so criterion B matches a separate call
    keyed by rng_A; with distinct outputs objects each keeps its own
    rng."""
    import jax
    import jax.numpy as jnp

    from s2d_tpu.losses.criterion import (
        CriterionConfig, set_criterion, set_criterion_pair,
    )

    rng = jax.random.PRNGKey(0)
    b, q, t, h, w = 1, 6, 2, 16, 16
    na, nb = 3, 6
    cfg = CriterionConfig(num_points=32, oversample_ratio=2.0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    outputs = {
        "pred_logits": jax.random.normal(k1, (b, q, 2)),
        "pred_masks": jax.random.normal(k2, (b, q, t, h // 4, w // 4)),
        "aux_pred_logits": [jax.random.normal(k3, (b, q, 2))],
        "aux_pred_masks": [jax.random.normal(k4, (b, q, t, h // 4, w // 4))],
    }
    masks_a = jax.random.uniform(k1, (b, na, t, h, w)) > 0.6
    valid_a = jnp.asarray([[True, True, False]])
    masks_b = jax.random.uniform(k2, (b, nb, t, h, w)) > 0.6
    valid_b = jnp.ones((b, nb), bool)

    def check(ref, got):
        assert set(ref) == set(got)
        for key in ref:
            np.testing.assert_allclose(
                float(got[key]), float(ref[key]), rtol=1e-5, atol=1e-6,
                err_msg=key,
            )

    # shared outputs: one pool (rng_a's), one pred gather for both
    la = set_criterion(k3, outputs, masks_a, valid_a, cfg)
    lb_shared = set_criterion(k3, outputs, masks_b, valid_b, cfg)
    pa, pb = set_criterion_pair(
        k3, outputs, masks_a, valid_a, cfg,
        k4, outputs, masks_b, valid_b, cfg,
    )
    check(la, pa)
    check(lb_shared, pb)

    # distinct outputs objects: each criterion keeps its own rng stream
    outputs2 = dict(outputs)
    lb = set_criterion(k4, outputs2, masks_b, valid_b, cfg)
    pa, pb = set_criterion_pair(
        k3, outputs, masks_a, valid_a, cfg,
        k4, outputs2, masks_b, valid_b, cfg,
    )
    check(la, pa)
    check(lb, pb)


def test_matcher_num_points_preserves_assignment():
    """matcher_num_points < num_points changes ONLY the matcher's cost
    estimate. On an unambiguous problem (each target is a distinct
    rectangle and one query predicts exactly it) the assignment — and
    therefore every loss value, since the loss-side pool is untouched —
    is identical to the full-count reference behavior."""
    b, q, n, t, hp, wp = 1, 6, 3, 2, 16, 16
    h, w = hp * 4, wp * 4
    masks = np.zeros((b, n, t, h, w), bool)
    boxes = [(4, 4, 24, 24), (34, 8, 58, 30), (10, 38, 30, 60)]
    for ni, (y0, x0, y1, x1) in enumerate(boxes):
        masks[:, ni, :, y0:y1, x0:x1] = True
    # queries 0..n-1 predict targets n-1..0 with high confidence; the
    # rest predict nothing
    pred = np.full((b, q, t, hp, wp), -8.0, np.float32)
    for ni in range(n):
        y0, x0, y1, x1 = [v // 4 for v in boxes[ni]]
        pred[:, n - 1 - ni, :, y0:y1, x0:x1] = 8.0
    outputs = {
        "pred_logits": jnp.asarray(
            np.tile(np.array([[2.0, -2.0]], np.float32), (b, q, 1))
        ),
        "pred_masks": jnp.asarray(pred),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
    }
    valid = jnp.ones((b, n), bool)
    key = jax.random.PRNGKey(0)
    for sampling in ("iid", "lattice"):
        full = set_criterion(
            key, outputs, jnp.asarray(masks), valid,
            CriterionConfig(num_points=512, point_sampling=sampling),
        )
        small = set_criterion(
            key, outputs, jnp.asarray(masks), valid,
            CriterionConfig(
                num_points=512, matcher_num_points=64,
                point_sampling=sampling,
            ),
        )
        assert set(full) == set(small)
        for k in full:
            np.testing.assert_allclose(
                float(small[k]), float(full[k]), rtol=1e-6,
                err_msg=f"{sampling}:{k}",
            )


def test_uncertainty_threshold_selection():
    """Bisected subsample quantile: exact top_k fallback for small pools,
    near-exact selection (count within 1%, >=98% overlap with exact
    top-k) at reference pool scale."""
    import jax
    import jax.numpy as jnp

    from s2d_tpu.losses.criterion import _uncertainty_threshold

    # small pool -> exact kth value
    v2 = jax.random.normal(jax.random.PRNGKey(1), (3, 192))
    np.testing.assert_allclose(
        np.asarray(_uncertainty_threshold(v2, 48)),
        np.asarray(jax.lax.top_k(v2, 48)[0][:, -1:]),
    )

    # reference-default pool scale (num_points=12544 * oversample 3):
    # must take the sort-free bisect path (subsample capped at S) and
    # still select accurately
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 37632))
    k = 9408
    thr = _uncertainty_threshold(v, k)
    count = np.asarray((v >= thr).sum(axis=-1))
    assert np.all(np.abs(count - k) < 0.02 * k), count

    v = jax.random.normal(jax.random.PRNGKey(0), (2, 131072))
    k = 32768
    thr = _uncertainty_threshold(v, k)
    sel = v >= thr
    count = np.asarray(sel.sum(axis=-1))
    assert np.all(np.abs(count - k) < 0.01 * k), count
    exact_kth = jax.lax.top_k(v, k)[0][:, -1:]
    overlap = np.asarray((sel & (v >= exact_kth)).sum(-1)) / k
    assert np.all(overlap > 0.98), overlap


def test_pool_gather_custom_vjp_grad_parity():
    """The matmul-backward custom vjp matches the gather VJP exactly."""
    import jax
    import jax.numpy as jnp

    from s2d_tpu.losses.criterion import _lane_packed_sample
    from s2d_tpu.ops.sampling import grid_sample_rows

    maps = jax.random.normal(jax.random.PRNGKey(0), (5, 12, 16))
    pool = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))

    def f_custom(m):
        return (_lane_packed_sample(m, pool) ** 2).sum()

    def f_plain(m):
        r, h, w = m.shape
        rows = m.reshape(r, h * w).T[None]
        grid = (2.0 * pool - 1.0)[None]
        return (grid_sample_rows(rows, grid, h, w, impl="gather")[0].T ** 2).sum()

    ga, gb = jax.grad(f_custom)(maps), jax.grad(f_plain)(maps)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-5)
