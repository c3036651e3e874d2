"""Auction profiling on REAL train-step cost matrices.

bench_criterion measured the assignment solve at ~390 ms of the 636 ms
criterion pair — 3.7x the standalone random-benefit kernel benchmark — so
the cost distribution the matcher actually produces drives far more
bidding rounds than gaussian noise. This probe rebuilds the exact stacked
cost matrices of the bench_criterion harness (both criteria, 10 layers),
then reports:

  * pallas kernel wall time on those benefits
  * per-phase round counts (XLA replica with the SAME partial-reset
    semantics as ops.auction) — max and mean over the 2*L*B problems
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

from s2d_tpu.ops import auction as A


def build_real_costs(n=25, num_points=160000, layers=10):
    """Replicates bench_criterion's cost construction (both criteria)."""
    from s2d_tpu.losses import criterion as C

    b, q, t = 1, 100, 3
    hs, ws = 92, 160
    hf, wf = 368, 640
    l = layers

    cfg = C.CriterionConfig(num_points=num_points)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, q, 2), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, t, hs, ws), jnp.float32)
    aux_l = jnp.asarray(rng.randn(l - 1, b, q, 2), jnp.float32)
    aux_m = jnp.asarray(rng.randn(l - 1, b, q, t, hs, ws), jnp.float32)
    tgt_masks = jnp.asarray(rng.rand(b, n, t, hf, wf) > 0.7)
    tgt_valid = jnp.ones((b, n), bool)
    outputs = {
        "pred_logits": logits,
        "pred_masks": masks,
        "aux_pred_logits": list(aux_l),
        "aux_pred_masks": list(aux_m),
    }

    @jax.jit
    def costs():
        sts = C._criterion_costs_multi(
            jax.random.PRNGKey(0), outputs,
            [(tgt_masks, tgt_valid, cfg), (tgt_masks, tgt_valid, cfg)],
        )
        out = []
        for st in sts:
            out.append((st["stacked_cost"], st["stacked_valid"]))
        return out

    (ca, va), (cb, vb) = costs()
    cost = jnp.concatenate([ca, cb], axis=0)
    valid = jnp.concatenate([va, vb], axis=0)
    return np.asarray(cost), np.asarray(valid)


def build_benefits(cost, valid):
    """Replicates auction_assign's asymmetric benefit construction."""
    cost = jnp.asarray(cost, jnp.float32)
    b, q, n = cost.shape
    obj_ids = jnp.arange(q, dtype=jnp.float32)
    person_rows = jnp.arange(n, dtype=jnp.float32)
    diversifier = -0.45 / q * ((obj_ids[None, :] + person_rows[:, None]) % q)

    def build_benefit(c, v):
        worst = jnp.max(jnp.where(v[None, :], c, -jnp.inf))
        worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
        c = jnp.where(v[None, :], c, worst + 1.0)
        benefit = -c.T
        bmin = benefit.min()
        bmax = benefit.max()
        scale = A.QUANT / jnp.maximum(bmax - bmin, 1e-12)
        quantized = jnp.round((benefit - bmin) * scale)
        return quantized + jnp.where(v[:, None], 0.0, diversifier)

    return jax.jit(jax.vmap(build_benefit))(cost, jnp.asarray(valid))


def probe_rounds(bens, n, q):
    """XLA replica of _auction_asym (forward bids + reverse seductions)
    emitting per-phase (forward, reverse) iteration counts (semantics must
    track ops.auction.run_phase). Returns (iters (P, 2), person->object)."""
    eps_list = A._eps_schedule(n, exact=False)
    person_ids = jnp.arange(n)
    obj_ids32 = jnp.arange(q, dtype=jnp.int32)

    def assigned_mask(owner):
        idx = jnp.where(owner >= 0, owner, n)
        return jnp.zeros((n + 1,), bool).at[idx].set(True)[:n]

    def person_to_obj(owner):
        idx = jnp.where(owner >= 0, owner, n)
        return jnp.full((n + 1,), -1, jnp.int32).at[idx].set(obj_ids32)[:n]

    @jax.jit
    def run(benefit):
        iters = []
        prices = jnp.zeros((q,), jnp.float32)
        owner = jnp.full((q,), -1, jnp.int32)
        for eps in eps_list:
            net = benefit - prices[None, :]
            best = net.max(axis=1)
            pobj = person_to_obj(owner)
            own_net = jnp.take_along_axis(
                net, jnp.maximum(pobj, 0)[:, None], axis=1
            )[:, 0]
            keep = (pobj >= 0) & (own_net >= best - eps)
            idx = jnp.where(keep, pobj, q)
            owner = (
                jnp.full((q + 1,), -1, jnp.int32)
                .at[idx].set(person_ids.astype(jnp.int32))[:q]
            )

            def fcond(state):
                _, owner, it = state
                return (~assigned_mask(owner).all()) & (it < 3000)

            def fbody(state, eps=eps):
                prices, owner, it = state
                unassigned = ~assigned_mask(owner)
                net = benefit - prices[None, :]
                vals, idxs = jax.lax.top_k(net, 2)
                i1, w1, w2 = idxs[:, 0], vals[:, 0], vals[:, 1]
                bid = prices[i1] + (w1 - w2) + eps
                bid = jnp.where(unassigned, bid, A._NEG)
                best_bid = jnp.full((q,), A._NEG).at[i1].max(bid)
                is_winner = unassigned & (bid >= best_bid[i1]) & (bid > A._NEG)
                winner = (
                    jnp.full((q,), n, jnp.int32).at[i1]
                    .min(jnp.where(is_winner, person_ids, n).astype(jnp.int32))
                )
                contested = winner < n
                owner = jnp.where(contested, winner, owner)
                prices = jnp.where(contested, best_bid, prices)
                return prices, owner, it + 1

            prices, owner, fit = jax.lax.while_loop(
                fcond, fbody, (prices, owner, jnp.int32(0))
            )

            def rcond(state):
                prices, owner, it = state
                return ((owner < 0) & (prices > 0.0)).any() & (it < 3000)

            def rbody(state, eps=eps):
                prices, owner, it = state
                assigned_p = assigned_mask(owner)
                pobj = person_to_obj(owner)
                net = benefit - prices[None, :]
                own_net = jnp.take_along_axis(
                    net, jnp.maximum(pobj, 0)[:, None], axis=1
                )[:, 0]
                best_net = net.max(axis=1)
                pi = jnp.where(assigned_p, own_net, best_net - eps)
                r = benefit - pi[:, None]
                bidder = (owner < 0) & (prices > 0.0)
                beta = r.max(axis=0)
                i_star = jnp.where(
                    r >= beta[None, :], person_ids[:, None], n
                ).min(axis=0).astype(jnp.int32)
                gamma = jnp.where(
                    person_ids[:, None] == i_star[None, :], A._NEG, r
                ).max(axis=0)
                give_up = bidder & (beta <= eps)
                prices = jnp.where(give_up, 0.0, prices)
                seducing = bidder & ~give_up
                cand = seducing[None, :] & (
                    person_ids[:, None] == i_star[None, :]
                )
                win_beta = jnp.where(cand, beta[None, :], A._NEG).max(axis=1)
                seduced = win_beta > A._NEG
                j_win = jnp.where(
                    cand & (beta[None, :] >= win_beta[:, None]),
                    obj_ids32[None, :], q,
                ).min(axis=1)
                old_idx = jnp.where(seduced & (pobj >= 0), pobj, q)
                owner = owner.at[old_idx].set(-1, mode="drop")
                win_idx = jnp.where(seduced, j_win, q)
                owner = owner.at[win_idx].set(
                    person_ids.astype(jnp.int32), mode="drop"
                )
                new_price = jnp.maximum(0.0, gamma - eps)
                prices = prices.at[win_idx].set(
                    jnp.where(seduced, new_price[j_win], 0.0), mode="drop"
                )
                return prices, owner, it + 1

            prices, owner, rit = jax.lax.while_loop(
                rcond, rbody, (prices, owner, jnp.int32(0))
            )
            iters.append(jnp.stack([fit, rit]))
        return jnp.stack(iters), person_to_obj(owner)

    return jax.vmap(run)(bens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--random", action="store_true",
                    help="gaussian benefits instead of real matcher costs")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    q = 100
    if args.random:
        rng = jax.random.PRNGKey(0)
        cost = jax.random.normal(rng, (40, q, 25)) * 5.0
        valid = jnp.ones((40, 25), bool)
        bens = build_benefits(np.asarray(cost), np.asarray(valid))
    else:
        cost, valid = build_real_costs()
        print(f"cost stack {cost.shape}, range [{cost.min():.2f}, {cost.max():.2f}]",
              flush=True)
        bens = build_benefits(cost, valid)

    from scipy.optimize import linear_sum_assignment

    n = cost.shape[-1]
    its, pobj = probe_rounds(bens, n, q)  # its: (B, phases, 2) fwd/rev
    its, pobj = np.asarray(its), np.asarray(pobj)
    gaps = []
    for i in range(cost.shape[0]):
        c = np.asarray(cost[i], np.float64)
        rows, cols = linear_sum_assignment(c)
        opt = c[rows, cols].sum()
        # person j (real target j) holds object pobj[i, j] (query idx)
        got = c[pobj[i, :n], np.arange(n)].sum()
        rng_ = max(c.max() - c.min(), 1e-12)
        gaps.append((got - opt) / (rng_ * n))
    tot = its.sum(axis=(1, 2))  # (B,) fwd+rev rounds per problem
    print(
        f"rounds mean {tot.mean():7.1f} max {int(tot.max()):5d}  "
        f"gap/(range*n) mean {np.mean(gaps):.2e} max {np.max(gaps):.2e}",
        flush=True,
    )
    print("fwd rounds/phase max :", its[..., 0].max(axis=0).tolist(),
          flush=True)
    print("rev rounds/phase max :", its[..., 1].max(axis=0).tolist(),
          flush=True)
    print("rounds total: max-sum", int(its.max(axis=0).sum()),
          "per-problem max", int(tot.max()),
          "mean", float(np.round(tot.mean(), 1)), flush=True)

    # pallas kernel wall time on the same benefits
    from s2d_tpu.ops.auction_pallas import auction_asym_pallas

    eps_list = A._eps_schedule(n, exact=False)
    fn = lambda: auction_asym_pallas(bens, n, q, eps_list)
    out = fn()
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn()
    _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"pallas auction ({bens.shape[0]} problems): {dt*1e3:.1f} ms",
          flush=True)




def time_costs():
    """Time the jitted cost-stack computation alone (fwd; stop-gradient)."""
    from s2d_tpu.losses import criterion as C
    import numpy as np

    b, q, t, n, l = 1, 100, 3, 25, 10
    hs, ws, hf, wf = 92, 160, 368, 640
    num_points = 160000
    cfg = C.CriterionConfig(num_points=num_points)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, q, 2), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, t, hs, ws), jnp.float32)
    aux_l = jnp.asarray(rng.randn(l - 1, b, q, 2), jnp.float32)
    aux_m = jnp.asarray(rng.randn(l - 1, b, q, t, hs, ws), jnp.float32)
    tgt_masks = jnp.asarray(rng.rand(b, n, t, hf, wf) > 0.7)
    tgt_valid = jnp.ones((b, n), bool)
    outputs = {
        "pred_logits": logits, "pred_masks": masks,
        "aux_pred_logits": list(aux_l), "aux_pred_masks": list(aux_m),
    }

    @jax.jit
    def costs(masks, aux_m):
        outputs2 = dict(outputs, pred_masks=masks,
                        aux_pred_masks=list(aux_m))
        sts = C._criterion_costs_multi(
            jax.random.PRNGKey(0), outputs2,
            [(tgt_masks, tgt_valid, cfg), (tgt_masks, tgt_valid, cfg)],
        )
        return [(st["stacked_cost"], st["stacked_valid"]) for st in sts]

    out = costs(masks, aux_m)
    _ = np.asarray(out[0][0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        out = costs(masks, aux_m)
    _ = np.asarray(out[0][0][0, 0, 0])
    print(f"cost-stack fwd (pair, L=10): {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)


def time_costs_assign():
    """Time cost-stack + benefit build + auction chained, as in-step."""
    from s2d_tpu.losses import criterion as C
    import numpy as np

    b, q, t, n, l = 1, 100, 3, 25, 10
    hs, ws, hf, wf = 92, 160, 368, 640
    cfg = C.CriterionConfig(num_points=160000)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, q, 2), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, t, hs, ws), jnp.float32)
    aux_l = jnp.asarray(rng.randn(l - 1, b, q, 2), jnp.float32)
    aux_m = jnp.asarray(rng.randn(l - 1, b, q, t, hs, ws), jnp.float32)
    tgt_masks = jnp.asarray(rng.rand(b, n, t, hf, wf) > 0.7)
    tgt_valid = jnp.ones((b, n), bool)
    outputs = {
        "pred_logits": logits, "pred_masks": masks,
        "aux_pred_logits": list(aux_l), "aux_pred_masks": list(aux_m),
    }

    @jax.jit
    def costs_assign(masks, aux_m):
        outputs2 = dict(outputs, pred_masks=masks, aux_pred_masks=list(aux_m))
        sts = C._criterion_costs_multi(
            jax.random.PRNGKey(0), outputs2,
            [(tgt_masks, tgt_valid, cfg), (tgt_masks, tgt_valid, cfg)],
        )
        cost = jnp.concatenate([st["stacked_cost"] for st in sts], axis=0)
        valid = jnp.concatenate([st["stacked_valid"] for st in sts], axis=0)
        return C.hungarian_assign(cost, valid)

    out = costs_assign(masks, aux_m)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        out = costs_assign(masks, aux_m)
    _ = np.asarray(out[0, 0])
    print(f"cost-stack + auction (pair, L=10): {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__" and os.environ.get("TIME_COSTS"):
    time_costs()
elif __name__ == "__main__" and os.environ.get("TIME_COSTS_ASSIGN"):
    time_costs_assign()
elif __name__ == "__main__":
    main()
