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
  * The problem is solved ASYMMETRICALLY: the N <= Q targets are the
    bidding persons and the Q queries are the objects. The earlier SQUARE
    formulation (Q - N row-constant dummy persons completing the matrix)
    spent most of its rounds on dummy churn: at each finer epsilon, the
    ~75 dummies sitting on near-min-price objects fail the eps-CS keep
    test and re-flatten the cheap-object prices in eps-sized increments —
    measured as the per-phase round explosion ([23, 374, 611, 846, 824]
    at production shapes on random costs). With only real persons, those
    phases collapse, and every per-round tensor shrinks Q/N-fold.
  * Epsilon-scaling soundness with spare objects needs every UNASSIGNED
    object to end at the common floor price (lambda = 0 here; prices
    never go below it): a stale elevated price on an unowned object makes
    persons avoid it forever — forward auctions never lower prices; this
    failure is pinned by tests/test_auction.py. Naive fixes fail both
    ways: resetting dropped objects' prices at phase boundaries destroys
    the scaled-in price level (near-tie instances then re-run the whole
    price climb at the final tiny epsilon and blow the round budget),
    while never resetting breaks optimality. The classical resolution
    (Bertsekas-Castanon) is FORWARD-REVERSE auction, used here: prices
    are carried untouched across phases, and each phase ends with a
    REVERSE pass in which every unassigned object with price > 0 either
    SEDUCES its best person at the competitive price (second-best profit
    margin minus eps — the person's profit rises by >= eps, which bounds
    total reverse work) or, if no person values it above the floor,
    gives up and drops to 0. Person profits pi are derived state:
    pi_i = own net value if assigned, best net - eps otherwise.
    Every phase ends with all persons eps-CS-assigned and all unowned
    objects at 0, which is the premise of the asymmetric bound
    sum(benefit) >= opt - n*eps.
  * INVALID target slots (padding) become row-constant persons carrying a
    sub-quantization-unit diversifier that gives each a distinct
    preferred object; without it identical rows bid on the same object
    and place one per round. They perturb nothing real: any injective
    completion has equal total benefit, and the criterion zero-weights
    their rows.
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


def _auction_asym(
    benefit: jnp.ndarray, exact: bool, max_iters: int = 3000,
    unroll: int = 4
) -> jnp.ndarray:
    """benefit: (N, Q) float32, N bidding persons over Q >= N objects
    (integer-valued up to the invalid-person diversifier). Returns (N,)
    object index per person.

    Round-count engineering:
      * PARTIAL RESET between epsilon phases: a person whose current object
        still satisfies eps-CS at the NEW epsilon keeps it; only violators
        re-bid. Prices are NEVER reset — carrying them is what makes the
        scaled-in price level survive to the finer phases.
      * REVERSE pass per phase (see module docstring): unassigned objects
        with price > 0 either seduce their best person at the competitive
        price or drop to the floor — restoring the asymmetric bound's
        unowned-objects-at-floor premise that the drops broke.
      * UNROLL: several bidding rounds per while_loop iteration. A round on
        an already-complete assignment is a no-op (all bids are -inf), so
        overshooting the termination check is safe.
    """
    n, q = benefit.shape
    if q == 1:  # top_k(net, 2) needs 2 columns; the 1x1 problem is trivial
        return jnp.zeros((n,), jnp.int32)
    person_ids = jnp.arange(n)
    obj_ids32 = jnp.arange(q, dtype=jnp.int32)

    eps_list = _eps_schedule(n, exact)

    def assigned_mask(owner):
        # (N,) person assigned iff some object names it
        idx = jnp.where(owner >= 0, owner, n)
        return jnp.zeros((n + 1,), bool).at[idx].set(True)[:n]

    def person_to_obj(owner):
        idx = jnp.where(owner >= 0, owner, n)
        return jnp.full((n + 1,), -1, jnp.int32).at[idx].set(obj_ids32)[:n]

    def run_phase(prices, owner_prev, eps):
        # partial reset: keep assignments that satisfy eps-CS at this eps
        # (prices untouched, so one pass suffices — drops don't interact)
        net = benefit - prices[None, :]
        best = net.max(axis=1)
        pobj = person_to_obj(owner_prev)
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

        # ---- FORWARD: unassigned persons bid until all are assigned
        def fwd_cond(state):
            _, owner, it = state
            return (~assigned_mask(owner).all()) & (it < max_iters)

        def fwd_round(prices, owner):
            unassigned = ~assigned_mask(owner)
            net = benefit - prices[None, :]  # (N, Q)
            vals, idxs = jax.lax.top_k(net, 2)  # one op for best + runner-up
            i1 = idxs[:, 0]
            w1 = vals[:, 0]
            w2 = vals[:, 1]
            bid = prices[i1] + (w1 - w2) + eps
            bid = jnp.where(unassigned, bid, _NEG)

            best_bid = jnp.full((q,), _NEG).at[i1].max(bid)
            is_winner = unassigned & (bid >= best_bid[i1]) & (bid > _NEG)
            winner = (
                jnp.full((q,), n, jnp.int32)
                .at[i1]
                .min(jnp.where(is_winner, person_ids, n).astype(jnp.int32))
            )
            contested = winner < n
            owner = jnp.where(contested, winner, owner)
            prices = jnp.where(contested, best_bid, prices)
            return prices, owner

        def fwd_body(state):
            prices, owner, it = state
            for _ in range(unroll):
                prices, owner = fwd_round(prices, owner)
            return prices, owner, it + unroll

        prices, owner, _ = jax.lax.while_loop(
            fwd_cond, fwd_body, (prices, owner0, jnp.int32(0))
        )

        # ---- REVERSE: unassigned objects with price > 0 seduce or give up
        def rev_cond(state):
            prices, owner, it = state
            return ((owner < 0) & (prices > 0.0)).any() & (it < max_iters)

        def rev_round(prices, owner):
            assigned_p = assigned_mask(owner)
            pobj = person_to_obj(owner)
            net = benefit - prices[None, :]  # (N, Q)
            own_net = jnp.take_along_axis(
                net, jnp.maximum(pobj, 0)[:, None], axis=1
            )[:, 0]
            best_net = net.max(axis=1)
            pi = jnp.where(assigned_p, own_net, best_net - eps)  # (N,)

            r = benefit - pi[:, None]  # (N, Q) object value per person
            bidder = (owner < 0) & (prices > 0.0)  # (Q,)
            beta = r.max(axis=0)
            i_star = jnp.where(
                r >= beta[None, :], person_ids[:, None], n
            ).min(axis=0).astype(jnp.int32)  # lowest-index argmax
            gamma = jnp.where(
                person_ids[:, None] == i_star[None, :], _NEG, r
            ).max(axis=0)

            give_up = bidder & (beta <= eps)  # lambda = 0 floor
            prices = jnp.where(give_up, 0.0, prices)
            seducing = bidder & ~give_up

            # one winning object per seduced person: highest beta, then
            # lowest object index
            cand = seducing[None, :] & (
                person_ids[:, None] == i_star[None, :]
            )  # (N, Q)
            win_beta = jnp.where(cand, beta[None, :], _NEG).max(axis=1)
            seduced = win_beta > _NEG  # (N,)
            j_win = jnp.where(
                cand & (beta[None, :] >= win_beta[:, None]),
                obj_ids32[None, :], q,
            ).min(axis=1)

            # seduced persons abandon their old object and take j_win at
            # the competitive price max(0, gamma - eps)
            old_idx = jnp.where(
                seduced & (pobj >= 0), pobj, q
            )
            owner = owner.at[old_idx].set(-1, mode="drop")
            win_idx = jnp.where(seduced, j_win, q)
            owner = owner.at[win_idx].set(
                person_ids.astype(jnp.int32), mode="drop"
            )
            new_price = jnp.maximum(0.0, gamma - eps)
            prices = prices.at[win_idx].set(
                jnp.where(seduced, new_price[j_win], 0.0), mode="drop"
            )
            return prices, owner

        def rev_body(state):
            prices, owner, it = state
            prices, owner = rev_round(prices, owner)
            return prices, owner, it + 1

        prices, owner, _ = jax.lax.while_loop(
            rev_cond, rev_body, (prices, owner, jnp.int32(0))
        )
        return prices, owner

    prices = jnp.zeros((q,), jnp.float32)
    owner = jnp.full((q,), -1, jnp.int32)
    # scan over phases rather than unrolling: exact mode has ~9 phases of
    # three nested loops each, and the unrolled graph was big enough to
    # crash XLA:CPU's compiler (segfault) on some shapes
    (prices, owner), _ = jax.lax.scan(
        lambda c, eps: (run_phase(c[0], c[1], eps), None),
        (prices, owner),
        jnp.asarray(eps_list, jnp.float32),
    )

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

    # distinct preferred object per INVALID (row-constant) person, < 1
    # quantization unit — spreads them in one round instead of serial wars
    obj_ids = jnp.arange(q, dtype=jnp.float32)
    person_rows = jnp.arange(n, dtype=jnp.float32)
    diversifier = -0.45 / q * ((obj_ids[None, :] + person_rows[:, None]) % q)

    def build_benefit(c, v):
        # invalid persons: row-constant benefit below every valid row
        if valid is not None:
            worst = jnp.max(jnp.where(v[None, :], c, -jnp.inf))
            worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
            c = jnp.where(v[None, :], c, worst + 1.0)
        benefit = -c.T  # (N, Q), maximize
        bmin = benefit.min()
        bmax = benefit.max()
        scale = QUANT / jnp.maximum(bmax - bmin, 1e-12)
        quantized = jnp.round((benefit - bmin) * scale)
        if valid is not None:
            quantized = quantized + jnp.where(
                v[:, None], 0.0, diversifier
            )
        return quantized  # (N, Q)

    if valid is None:
        valid_arr = jnp.ones((b, n), bool)
    else:
        valid_arr = valid
    benefits = jax.vmap(build_benefit)(cost, valid_arr)

    impl = IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" and q > 1 else "xla"
    if impl == "pallas":
        from .auction_pallas import auction_asym_pallas

        return auction_asym_pallas(benefits, n, q, _eps_schedule(n, exact))
    return jax.vmap(lambda bf: _auction_asym(bf, exact))(benefits)
