"""Hungarian matching between queries and (padded) video targets.

TPU-native rebuild of the reference `VideoHungarianMatcher`
(`/root/reference/model_training/mask2former_video/modeling/matcher.py:
200-294`): per video, costs are computed on ONE shared set of `num_points`
uniform random points (memory-efficient matching), combining

  cost = cost_mask * batch_sigmoid_ce + cost_class * (-prob[class0])
       + cost_dice * batch_dice

with target classes forced to 0 (class-agnostic). The reference moves the
cost matrix to CPU and runs scipy `linear_sum_assignment` per video
(matcher.py:287-289) — a host sync per step. Here the assignment is solved
ON DEVICE by the epsilon-scaled auction algorithm (ops/auction.py), so the
whole train step stays on-chip. The assignment is returned fixed-shape: for
every target slot j, the matched query index.

Padded / invalid target slots are given a constant row-independent worst
cost inside the solver, which leaves the assignment of valid slots unchanged
(constant columns are indifferent among rows in an LSA).

`hungarian_assign_scipy` (host callback) remains available as the exactness
oracle for tests.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.auction import auction_assign
from ..ops.sampling import grid_sample_rows


def batch_sigmoid_ce_cost(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(Q, P) logits x (N, P) targets -> (Q, N) mean BCE cost."""
    p = logits.shape[-1]
    pos = jax.nn.softplus(-logits)  # BCE(x, 1)
    neg = jax.nn.softplus(logits)  # BCE(x, 0)
    return (
        jnp.einsum("qp,np->qn", pos, targets, precision=precision)
        + jnp.einsum("qp,np->qn", neg, 1.0 - targets, precision=precision)
    ) / p


def batch_dice_cost(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(Q, P) logits x (N, P) targets -> (Q, N) dice cost."""
    probs = jax.nn.sigmoid(logits)
    numerator = 2.0 * jnp.einsum("qp,np->qn", probs, targets, precision=precision)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Batched scipy LSA. cost (B, Q, N) -> (B, N) query index per target."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=np.float64)
    b, q, n = cost.shape
    out = np.zeros((b, n), dtype=np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_assign(
    cost: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """cost (B, Q, N) -> (B, N) int32: matched query for each target slot.

    On-device auction solve; `valid` (B, N) marks real target columns."""
    return auction_assign(cost, valid)


def hungarian_assign_scipy(cost: jnp.ndarray) -> jnp.ndarray:
    """Host scipy LSA oracle (tests only; axon TPU lacks host callbacks)."""
    b, q, n = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def match_costs(
    pred_logits: jnp.ndarray,  # (B, Q, K+1)
    pred_masks: jnp.ndarray,  # (B, Q, T, H', W') mask logits (stride 4)
    tgt_masks_points: jnp.ndarray,  # (B, N, P_total) point-sampled targets
    pred_masks_points: jnp.ndarray,  # (B, Q, P_total) point-sampled preds
    tgt_valid: jnp.ndarray,  # (B, N) bool
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Assemble the (B, Q, N) cost matrix.

    Stays exact f32 (HIGHEST) in the trainer: the reference matcher is an
    explicit fp32 autocast-OFF island (`/root/reference/model_training/
    mask2former_video/modeling/matcher.py:135,266` — `with
    autocast(enabled=False)` + `.float()` casts), so bf16-class cost
    noise would diverge assignments on near-ties. The `precision` knob
    exists for experiments only."""
    prob0 = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[..., 0]
    cost_cls = -prob0[:, :, None]  # (B, Q, 1) broadcast over targets

    def per_video(pm, tm):
        return (
            cost_mask * batch_sigmoid_ce_cost(pm, tm, precision)
            + cost_dice * batch_dice_cost(pm, tm, precision)
        )

    cost = jax.vmap(per_video)(
        pred_masks_points.astype(jnp.float32), tgt_masks_points.astype(jnp.float32)
    )
    # invalid target columns are handled by the assignment solver
    del tgt_valid
    return cost + cost_class * cost_cls


def sample_match_points(
    rng: jax.Array,
    pred_masks: jnp.ndarray,  # (B, Q, T, H', W')
    tgt_masks: jnp.ndarray,  # (B, N, T, H, W) float/bool
    num_points: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-random-point sampling for matching. One point set per video,
    applied to both prediction and target masks (T folded into channels, as
    the reference point_samples (Q, T, H, W) tensors directly).

    Returns (pred_points (B, Q, T*P), tgt_points (B, N, T*P))."""
    b = pred_masks.shape[0]
    coords = jax.random.uniform(rng, (b, num_points, 2))

    def shared_sample(maps, pts):
        """All maps share ONE point set -> pack (C', H, W) maps as LANES of
        a single row-gather: P row fetches of C' lanes instead of C'
        separate 1-lane samplings (the matcher's memory-efficient trick is
        also the TPU-efficient one)."""
        cprime = maps.shape[0]
        h, w = maps.shape[-2:]
        rows = maps.reshape(cprime, h * w).T[None]  # (1, HW, C')
        grid = (2.0 * pts - 1.0)[None]  # (1, P, 2)
        out = grid_sample_rows(rows, grid, h, w, impl="gather")  # (1, P, C')
        return out[0].T  # (C', P)

    def per_video(pm, tm, pts):
        q, t = pm.shape[0], pm.shape[1]
        n = tm.shape[0]
        pp = shared_sample(pm.reshape(q * t, *pm.shape[2:]), pts)
        tp = shared_sample(tm.astype(pm.dtype).reshape(n * t, *tm.shape[2:]), pts)
        return pp.reshape(q, -1), tp.reshape(n, -1)

    return jax.vmap(per_video)(pred_masks, tgt_masks, coords)
