"""Auction LSA vs scipy: optimal cost attainment on random instances."""
import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from s2d_tpu.ops.auction import auction_assign


def _opt_gap(cost, assign, n):
    rows, cols = linear_sum_assignment(cost[:, :n])
    opt = cost[:, :n][rows, cols].sum()
    got = cost[assign[:n], np.arange(n)].sum()
    rng = cost.max() - cost.min()
    return got - opt, rng


def test_square_random():
    rng = np.random.RandomState(0)
    cost = rng.rand(3, 12, 12).astype(np.float32) * 10
    assign = np.asarray(auction_assign(jnp.asarray(cost)))
    for b in range(3):
        gap, crange = _opt_gap(cost[b], assign[b], 12)
        assert len(set(assign[b].tolist())) == 12
        assert gap <= 0.01 * crange, gap


def test_rectangular_random():
    rng = np.random.RandomState(1)
    cost = rng.rand(4, 20, 7).astype(np.float32)
    assign = np.asarray(auction_assign(jnp.asarray(cost)))
    for b in range(4):
        gap, crange = _opt_gap(cost[b], assign[b], 7)
        assert len(set(assign[b].tolist())) == 7
        assert gap <= 0.01 * crange, gap


def test_with_invalid_columns():
    rng = np.random.RandomState(2)
    cost = rng.rand(1, 10, 6).astype(np.float32)
    valid = np.array([[True, True, True, False, False, False]])
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    gap, crange = _opt_gap(cost[0], assign[0], 3)
    assert gap <= 0.01 * crange, gap
    assert len(set(assign[0].tolist())) == 6


def test_mask2former_scale():
    """Q=100 queries, mixed valid/padded targets — the production shape."""
    rng = np.random.RandomState(3)
    cost = (rng.rand(2, 100, 40) * 20 - 10).astype(np.float32)
    valid = rng.rand(2, 40) > 0.3
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    for b in range(2):
        vidx = np.where(valid[b])[0]
        sub = cost[b][:, vidx]
        rows, cols = linear_sum_assignment(sub)
        opt = sub[rows, cols].sum()
        got = sub[assign[b][vidx], np.arange(len(vidx))].sum()
        crange = cost[b].max() - cost[b].min()
        assert len(set(assign[b].tolist())) == 40  # injective incl. padding
        assert got - opt <= 0.01 * crange * len(vidx), (got, opt)


def test_single_query_single_target():
    """Q=1 problems are trivial but must not crash (top_k(net, 2) needs a
    guard when the squared benefit matrix is 1x1)."""
    import jax.numpy as jnp

    from s2d_tpu.ops.auction import auction_assign

    out = auction_assign(jnp.asarray([[[3.5]]]), jnp.asarray([[True]]))
    assert out.shape == (1, 1) and int(out[0, 0]) == 0
