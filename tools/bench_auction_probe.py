"""Probe the auction solver: rounds per epsilon phase at train-step shapes,
and the effect of unrolling multiple bidding rounds per while iteration."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

from s2d_tpu.ops import auction as A


def probe_rounds():
    rng = jax.random.PRNGKey(0)
    cost = jax.random.normal(rng, (20, 100, 25)) * 5.0
    q, n = 100, 25

    obj_ids = jnp.arange(q, dtype=jnp.float32)
    dummy_rows = jnp.arange(q - n, dtype=jnp.float32)
    diversifier = -0.45 / q * ((obj_ids[None, :] + dummy_rows[:, None]) % q)

    def benefits(c):
        benefit = -c.T
        bmin, bmax = benefit.min(), benefit.max()
        scale = A.QUANT / jnp.maximum(bmax - bmin, 1e-12)
        quantized = jnp.round((benefit - bmin) * scale)
        return jnp.concatenate([quantized, diversifier], axis=0)

    bens = jax.jit(jax.vmap(benefits))(cost)

    # replicate the phase loop, reporting iters per phase (batched max)
    eps_list = []
    eps = A.QUANT / A.THETA
    while eps > A.EPS_FINAL:
        eps_list.append(eps)
        eps /= A.THETA
    eps_list.append(A.EPS_FINAL)

    @jax.jit
    def phases(bens):
        person_ids = jnp.arange(q)

        def assigned_mask(owner):
            idx = jnp.where(owner >= 0, owner, q)
            return jnp.zeros((q + 1,), bool).at[idx].set(True)[:q]

        def one(benefit):
            iters = []
            prices = jnp.zeros((q,), jnp.float32)
            owner = jnp.full((q,), -1, jnp.int32)

            for eps in eps_list:
                owner0 = jnp.full((q,), -1, jnp.int32)

                def cond(state):
                    _, owner, it = state
                    return (~assigned_mask(owner).all()) & (it < 3000)

                def body(state, eps=eps):
                    prices, owner, it = state
                    unassigned = ~assigned_mask(owner)
                    net = benefit - prices[None, :]
                    i1 = jnp.argmax(net, axis=1)
                    w1 = jnp.take_along_axis(net, i1[:, None], axis=1)[:, 0]
                    net2 = net.at[person_ids, i1].set(A._NEG)
                    w2 = net2.max(axis=1)
                    bid = prices[i1] + (w1 - w2) + eps
                    bid = jnp.where(unassigned, bid, A._NEG)
                    best_bid = jnp.full((q,), A._NEG).at[i1].max(bid)
                    is_winner = unassigned & (bid >= best_bid[i1]) & (bid > A._NEG)
                    winner = (
                        jnp.full((q,), q, jnp.int32).at[i1]
                        .min(jnp.where(is_winner, person_ids, q).astype(jnp.int32))
                    )
                    contested = winner < q
                    owner = jnp.where(contested, winner, owner)
                    prices = jnp.where(contested, best_bid, prices)
                    return prices, owner, it + 1

                prices, owner, it = jax.lax.while_loop(
                    cond, body, (prices, owner0, jnp.int32(0))
                )
                iters.append(it)
            return jnp.stack(iters)

        return jax.vmap(one)(bens)

    its = phases(bens)
    print("rounds per phase (max over batch):",
          [int(x) for x in its.max(axis=0)], flush=True)
    print("rounds per phase (mean):",
          [float(x) for x in its.mean(axis=0)], flush=True)


def main():
    probe_rounds()


if __name__ == "__main__":
    main()
