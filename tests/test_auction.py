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


def test_pallas_matches_xla_auction():
    """The single-kernel pallas auction (interpret mode on CPU) must return
    BIT-IDENTICAL assignments to the vmapped XLA auction: same epsilon
    schedule, same fp association in the bids, same tie-breaking."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import s2d_tpu.ops.auction as A
    from s2d_tpu.ops.auction_pallas import auction_square_pallas

    rng = np.random.RandomState(7)
    for b, q, n in [(3, 100, 25), (2, 8, 3), (4, 37, 37), (2, 150, 40)]:
        cost = jnp.asarray(rng.rand(b, q, n).astype(np.float32) * 10)
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        prev, A.IMPL = A.IMPL, "xla"
        try:
            ref = np.asarray(A.auction_assign(cost, valid))
        finally:
            A.IMPL = prev

        obj_ids = jnp.arange(q, dtype=jnp.float32)
        dummy_rows = jnp.arange(q - n, dtype=jnp.float32)
        div = -0.45 / q * ((obj_ids[None, :] + dummy_rows[:, None]) % q)

        def build(c, v):
            worst = jnp.max(jnp.where(v[None, :], c, -jnp.inf))
            worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
            c = jnp.where(v[None, :], c, worst + 1.0)
            ben = -c.T
            scale = A.QUANT / jnp.maximum(ben.max() - ben.min(), 1e-12)
            return jnp.concatenate(
                [jnp.round((ben - ben.min()) * scale), div], 0
            )

        bens = jax.vmap(build)(cost, valid)
        got = np.asarray(
            auction_square_pallas(
                bens, q, A._eps_schedule(q, False), interpret=True
            )
        )[:, :n]
        assert np.array_equal(ref, got), (b, q, n)
