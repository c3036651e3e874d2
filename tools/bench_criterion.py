"""Standalone full-scale criterion benchmark (no model): decomposes the
train step's "point machinery" — pool gathers, selection, ce/dice, matcher
costs, auction — at the real KD shapes (B=1, Q=100, T=3, stride-4 preds,
full-res targets, 10 decoder layers, both criteria).

fwd+bwd is timed through jax.value_and_grad w.r.t. the prediction masks
and logits, matching how the criterion sits inside the train step."""
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


def timed(fn, iters):
    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--num-points", type=int, default=160000)
    ap.add_argument("--matcher-points", type=int, default=0,
                    help="matcher-side point count (0 = num-points)")
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--amp", action="store_true",
                    help="DEFAULT-precision bwd einsums (SOLVER.AMP on)")
    ap.add_argument("--no-selection", action="store_true")
    ap.add_argument("--fixed-assign", action="store_true")
    ap.add_argument("--single", action="store_true",
                    help="one criterion instead of the KD pair")
    ap.add_argument("--point-sampling", choices=["iid", "lattice"],
                    default="iid")
    ap.add_argument("--assign-input", action="store_true",
                    help="precompute REAL assignments once, then time the "
                         "loss side with assigns as jit inputs. CAVEAT: "
                         "nothing consumes stacked_cost, so the whole "
                         "cost scan is DCE'd — combine with --keep-costs "
                         "for losses+costs-without-auction")
    ap.add_argument("--keep-costs", action="store_true",
                    help="with --assign-input: also output the cost "
                         "stack sums so the cost scan survives DCE")
    args = ap.parse_args()

    from s2d_tpu.losses import criterion as C

    b, q, t, n = 1, 100, 3, args.n
    hs, ws = 92, 160  # stride-4 prediction grid
    hf, wf = 368, 640  # full-res targets
    l = args.layers

    cfg = C.CriterionConfig(
        num_points=args.num_points,
        matcher_num_points=args.matcher_points,
        importance_sample_ratio=0.0 if args.no_selection else 0.75,
        bwd_einsum_precision=(
            jax.lax.Precision.DEFAULT if args.amp
            else jax.lax.Precision.HIGHEST
        ),
        gather_dtype=jnp.bfloat16 if args.amp else jnp.float32,
        point_sampling=args.point_sampling,
    )

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, q, 2), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, t, hs, ws), jnp.float32)
    aux_l = jnp.asarray(rng.randn(l - 1, b, q, 2), jnp.float32)
    aux_m = jnp.asarray(rng.randn(l - 1, b, q, t, hs, ws), jnp.float32)
    tgt_masks = jnp.asarray(rng.rand(b, n, t, hf, wf) > 0.7)
    tgt_valid = jnp.ones((b, n), bool)
    key = jax.random.PRNGKey(0)

    if args.fixed_assign:
        fixed = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (l * b, 1))
        orig_assign = C.hungarian_assign
        C.hungarian_assign = lambda cost, valid: jnp.tile(
            jnp.arange(cost.shape[-1], dtype=jnp.int32)[None],
            (cost.shape[0], 1),
        )

    def loss_fn(masks, aux_m, logits):
        outputs = {
            "pred_logits": logits,
            "pred_masks": masks,
            "aux_pred_logits": list(aux_l),
            "aux_pred_masks": list(aux_m),
        }
        k1, k2 = jax.random.split(key)
        if args.single:
            losses = C.set_criterion(
                k1, outputs, tgt_masks, tgt_valid, cfg
            )
        else:
            la, lb = C.set_criterion_pair(
                k1, outputs, tgt_masks, tgt_valid, cfg,
                k2, outputs, tgt_masks, tgt_valid, cfg,
            )
            losses = {**la, **{f"kd_{k}": v for k, v in lb.items()}}
        return sum(jax.tree_util.tree_leaves(losses))

    if args.assign_input:
        def compute_assigns(masks, aux_m):
            outputs = {
                "pred_logits": logits, "pred_masks": masks,
                "aux_pred_logits": list(aux_l), "aux_pred_masks": list(aux_m),
            }
            k1, _ = jax.random.split(key)
            sts = C._criterion_costs_multi(
                k1, outputs,
                [(tgt_masks, tgt_valid, cfg), (tgt_masks, tgt_valid, cfg)],
            )
            cost = jnp.concatenate([st["stacked_cost"] for st in sts], 0)
            vald = jnp.concatenate([st["stacked_valid"] for st in sts], 0)
            a = C.hungarian_assign(cost, vald)
            rows = sts[0]["stacked_cost"].shape[0]
            return (
                a[:rows].reshape(sts[0]["n_layers"], sts[0]["b"], -1),
                a[rows:].reshape(sts[1]["n_layers"], sts[1]["b"], -1),
            )

        assigns_ab = jax.jit(compute_assigns)(masks, aux_m)
        assigns_ab = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), assigns_ab
        )

        def loss_only(masks, aux_m, logits, assigns_ab):
            outputs = {
                "pred_logits": logits, "pred_masks": masks,
                "aux_pred_logits": list(aux_l), "aux_pred_masks": list(aux_m),
            }
            k1, _ = jax.random.split(key)
            sts = C._criterion_costs_multi(
                k1, outputs,
                [(tgt_masks, tgt_valid, cfg), (tgt_masks, tgt_valid, cfg)],
            )
            la = C._criterion_losses(sts[0], assigns_ab[0], cfg, True)
            lb = C._criterion_losses(sts[1], assigns_ab[1], cfg, True)
            losses = {**la, **{f"kd_{k}": v for k, v in lb.items()}}
            total = sum(jax.tree_util.tree_leaves(losses))
            if args.keep_costs:
                # keep the (otherwise dead) cost scan alive: its sums ride
                # along in the output barrier
                total = total + 1e-30 * sum(
                    jnp.tanh(st["stacked_cost"]).sum() for st in sts
                )
            return total

        grad_fn0 = jax.jit(jax.value_and_grad(loss_only, argnums=(0, 1)))
        grad_fn = lambda m, am, lg: grad_fn0(m, am, lg, assigns_ab)
    else:
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = grad_fn(masks, aux_m, logits)
    _ = float(out[0])
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    tm = timed(lambda: grad_fn(masks, aux_m, logits), args.iters)
    tag = []
    if args.single: tag.append("single")
    if args.amp: tag.append("amp")
    if args.no_selection: tag.append("no-sel")
    if args.assign_input: tag.append("assign-input")
    if args.fixed_assign: tag.append("fixed-assign")
    print(
        f"criterion fwd+bwd [{' '.join(tag) or 'full pair'}] "
        f"(L={l}, N={n}, P={args.num_points}): {tm*1e3:.0f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
