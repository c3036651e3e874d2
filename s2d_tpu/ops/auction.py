"""On-device linear sum assignment via the auction algorithm.

The reference solves its per-video Hungarian matching by shipping the cost
matrix to the CPU and calling scipy (`/root/reference/model_training/
mask2former_video/modeling/matcher.py:287-289`) — a host sync every matcher
call. On TPU we solve the assignment on device: Bertsekas' auction algorithm
with epsilon-scaling, fully expressed in lax ops (scatter-max bidding), so it
jits, vmaps over batches/layers, and never leaves the chip. (The axon TPU
runtime additionally has no host-callback support, so an on-device solver is
required, not merely faster.)

Design notes:
  * The problem is SQUARED: with Q queries and N <= Q target columns we add
    Q - N dummy persons. Epsilon-scaling with carried-over prices is only
    sound for complete (square) assignments — with spare objects, a stale
    price on an unowned object breaks the eps-CS optimality bound (this
    exact failure is pinned by tests/test_auction.py).
  * Dummy person benefits are row-constant up to a sub-quantization-unit
    diversifier that gives each dummy a distinct cheap-object preference;
    without it, identical dummies all bid on the same object and place one
    per round (O(Q^2) rounds). Row-near-constant dummies perturb the valid
    assignment by at most the summed diversifier range — far below matching
    resolution.
  * Benefits are quantized to QUANT integer levels of the cost range; with
    integer benefits and final epsilon < 1/(n+1), the result is optimal for
    the quantized problem (`exact=True`). The default stops the epsilon
    schedule early at EPS_FINAL, bounding the gap by n*EPS_FINAL/QUANT of
    the cost range — measured <=0.03% on production-shaped instances for a
    ~2x round-count saving (matching is a training heuristic; ties are
    arbitrary in the reference's scipy solver too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

QUANT = 4096.0  # cost quantization levels
THETA = 4.0  # epsilon scaling factor per phase
EPS_FINAL = 4.0  # default early-stop epsilon (exact=False)
_NEG = -1.0e18

# solver backend: "xla" = vmapped lax.while_loop rounds; "pallas" = the
# whole batched auction as one on-chip kernel (ops/auction_pallas.py,
# bit-identical results, ~us rounds instead of ~165us dispatch-bound
# rounds); "auto" = pallas on TPU, xla elsewhere.
IMPL = "auto"


def _eps_schedule(q: int, exact: bool) -> tuple:
    eps_final = 1.0 / (q + 1) if exact else EPS_FINAL
    eps_list = []
    eps = QUANT / THETA
    while eps > eps_final:
        eps_list.append(eps)
        eps /= THETA
    eps_list.append(eps_final)
    return tuple(eps_list)


def _auction_square(
    benefit: jnp.ndarray, exact: bool, max_iters: int = 3000,
    unroll: int = 4
) -> jnp.ndarray:
    """benefit: (Q, Q) float32 (integer-valued up to the dummy diversifier).
    Returns (Q,) object index per person.

    Round-count engineering (measured on the train-step batch, 20 problems
    of (100, 25): 2960 max rounds at ~165 us of serial small-op dispatch
    each = ~490 ms per step):
      * PARTIAL RESET between epsilon phases: a person whose current object
        still satisfies eps-CS at the NEW epsilon keeps it; only violators
        re-bid. The auction's invariant — every assigned person is within
        eps of its best net value at the current prices — holds for kept
        pairs by construction, so optimality is untouched, but the late
        phases (price wars re-fought from scratch: 640/811/1179 rounds)
        collapse to the handful of genuinely contested objects.
      * UNROLL: several bidding rounds per while_loop iteration. A round on
        an already-complete assignment is a no-op (all bids are -inf), so
        overshooting the termination check is safe; the loop-condition
        scatter and per-op dispatch overhead amortize across the unrolled
        rounds.
    """
    q = benefit.shape[0]
    if q == 1:  # top_k(net, 2) needs 2 columns; the 1x1 problem is trivial
        return jnp.zeros((1,), jnp.int32)
    person_ids = jnp.arange(q)

    eps_list = _eps_schedule(q, exact)

    def assigned_mask(owner):
        idx = jnp.where(owner >= 0, owner, q)
        return jnp.zeros((q + 1,), bool).at[idx].set(True)[:q]

    def person_to_obj(owner):
        obj_ids = jnp.arange(q, dtype=jnp.int32)
        idx = jnp.where(owner >= 0, owner, q)
        return (
            jnp.full((q + 1,), -1, jnp.int32).at[idx].set(obj_ids)[:q]
        )

    def run_phase(prices, owner_prev, eps):
        # partial reset: keep assignments that satisfy eps-CS at this eps
        pobj = person_to_obj(owner_prev)  # (Q,) object of each person, -1
        net = benefit - prices[None, :]
        best = net.max(axis=1)
        own_net = jnp.take_along_axis(
            net, jnp.maximum(pobj, 0)[:, None], axis=1
        )[:, 0]
        keep = (pobj >= 0) & (own_net >= best - eps)
        idx = jnp.where(keep, pobj, q)
        owner0 = (
            jnp.full((q + 1,), -1, jnp.int32)
            .at[idx]
            .set(person_ids.astype(jnp.int32))[:q]
        )

        def cond(state):
            _, owner, it = state
            return (~assigned_mask(owner).all()) & (it < max_iters)

        def round_(prices, owner):
            unassigned = ~assigned_mask(owner)
            net = benefit - prices[None, :]  # (Q, Q)
            vals, idxs = jax.lax.top_k(net, 2)  # one op for best + runner-up
            i1 = idxs[:, 0]
            w1 = vals[:, 0]
            w2 = vals[:, 1]
            bid = prices[i1] + (w1 - w2) + eps
            bid = jnp.where(unassigned, bid, _NEG)

            best_bid = jnp.full((q,), _NEG).at[i1].max(bid)
            is_winner = unassigned & (bid >= best_bid[i1]) & (bid > _NEG)
            winner = (
                jnp.full((q,), q, jnp.int32)
                .at[i1]
                .min(jnp.where(is_winner, person_ids, q).astype(jnp.int32))
            )
            contested = winner < q
            owner = jnp.where(contested, winner, owner)
            prices = jnp.where(contested, best_bid, prices)
            return prices, owner

        def body(state):
            prices, owner, it = state
            for _ in range(unroll):
                prices, owner = round_(prices, owner)
            return prices, owner, it + unroll

        return jax.lax.while_loop(cond, body, (prices, owner0, jnp.int32(0)))

    prices = jnp.zeros((q,), jnp.float32)
    owner = jnp.full((q,), -1, jnp.int32)
    for eps in eps_list:
        prices, owner, _ = run_phase(prices, owner, eps)

    return person_to_obj(owner)


def auction_assign(
    cost: jnp.ndarray, valid: jnp.ndarray | None = None, exact: bool = False
) -> jnp.ndarray:
    """Batched min-cost assignment.

    Args:
      cost: (B, Q, N) float cost of assigning query q to target n, N <= Q.
      valid: (B, N) bool; invalid columns get a constant worst-case cost
        (row-independent, so valid columns keep their optimal assignment).

    Returns:
      (B, N) int32 matched query index per target slot.
    """
    cost = cost.astype(jnp.float32)
    b, q, n = cost.shape
    assert n <= q, f"auction needs targets <= queries, got {n} > {q}"

    # distinct cheap-object preference per dummy person, < 1 quantization unit
    obj_ids = jnp.arange(q, dtype=jnp.float32)
    dummy_rows = jnp.arange(q - n, dtype=jnp.float32)
    diversifier = -0.45 / q * ((obj_ids[None, :] + dummy_rows[:, None]) % q)

    def build_benefit(c, v):
        if valid is not None:
            worst = jnp.max(jnp.where(v[None, :], c, -jnp.inf))
            worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
            c = jnp.where(v[None, :], c, worst + 1.0)
        benefit = -c.T  # (N, Q), maximize
        bmin = benefit.min()
        bmax = benefit.max()
        scale = QUANT / jnp.maximum(bmax - bmin, 1e-12)
        quantized = jnp.round((benefit - bmin) * scale)
        return jnp.concatenate([quantized, diversifier], axis=0)  # (Q, Q)

    if valid is None:
        valid_arr = jnp.ones((b, n), bool)
    else:
        valid_arr = valid
    benefits = jax.vmap(build_benefit)(cost, valid_arr)

    impl = IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" and q > 1 else "xla"
    if impl == "pallas":
        from .auction_pallas import auction_square_pallas

        return auction_square_pallas(
            benefits, q, _eps_schedule(q, exact)
        )[:, :n]
    return jax.vmap(lambda bf: _auction_square(bf, exact)[:n])(benefits)
