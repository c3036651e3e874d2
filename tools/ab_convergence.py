#!/usr/bin/env python
"""Convergence A/B for the criterion's statistical reformulations.

Round-1 VERDICT (Weak #5): the production criterion replaces the
reference's per-layer iid point resampling / exact top-k uncertainty
selection / exact-count random points (reference `mask2former_video/
modeling/criterion.py:292-383`) with ONE shared pool per step, Bernoulli
thinning, and a bisected quantile threshold ("iid" mode) or random-phase
lattice pools ("lattice" mode). Each piece is argued unbiased per step;
this experiment checks the *training outcome*: three arms train the same
tiny model on the same synthetic data stream, differing ONLY in the
loss-side point-sampling stack:

  naive    — reference-style: fresh pool per layer, oversample 3P, exact
             top-k uncertainty points, exact-count fresh random points
             (implemented here, independent of the production code paths)
  iid      — production shared-pool + Bernoulli + bisect stack
  lattice  — production random-phase lattice pools

Matching (costs + auction) is the production path in all arms — auction
optimality and cost parity are pinned by tests/test_criterion.py and
tests/test_auction.py, so the A/B isolates the loss sampling.

All arms are scored with the SAME frozen yardsticks on held-out data:
the naive criterion's loss (an exact, unbiased reference-semantics
estimate) and mean matched-mask IoU. Results feed AB_CONVERGENCE.md.

  S2D_PLATFORM=cpu python tools/ab_convergence.py --steps 300 --out ab.json
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ------------------------------------------------------------ data stream

def make_batch(rs: np.random.RandomState, b=4, t=2, h=32, w=32, n=3):
    """Colored moving rectangles on noise: learnable color->mask task."""
    images = rs.rand(b, t, h, w, 3).astype(np.float32) * 0.2
    masks = np.zeros((b, n, t, h, w), bool)
    valid = np.zeros((b, n), bool)
    # distinct color per instance slot; eye(3) for the toy n=3, extended
    # with saturated mixtures so the full-scale n=8 stays one-color-per-slot
    palette = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1],
         [0, 1, 1], [1, 0.5, 0], [0.5, 0, 1], [0, 1, 0.5], [1, 1, 1]],
        dtype=np.float32)
    colors = palette[np.arange(n) % len(palette)]
    # rectangle sizes scale with the canvas (1/4 .. 1/2 of each side)
    smin, smax = max(2, h // 4), max(3, h // 2)
    wmin, wmax = max(2, w // 4), max(3, w // 2)
    shift = max(1, h // 10)
    for bi in range(b):
        k = rs.randint(1, n + 1)
        for ni in range(k):
            bh, bw = rs.randint(smin, smax), rs.randint(wmin, wmax)
            y, x = rs.randint(0, h - bh), rs.randint(0, w - bw)
            dy, dx = rs.randint(-shift, shift + 1), rs.randint(-shift, shift + 1)
            for ti in range(t):
                yy = np.clip(y + dy * ti, 0, h - bh)
                xx = np.clip(x + dx * ti, 0, w - bw)
                masks[bi, ni, ti, yy:yy + bh, xx:xx + bw] = True
                images[bi, ti, yy:yy + bh, xx:xx + bw] = (
                    0.8 * colors[ni] + 0.2 * images[bi, ti, yy:yy + bh, xx:xx + bw]
                )
            valid[bi, ni] = True
    return images, masks, valid


# ------------------------------------- naive reference-style criterion

def build_naive_criterion(cfg):
    """Reference-semantics criterion: per-layer fresh pools, exact top-k
    importance points, exact-count randoms (criterion.py:292-383 +
    get_uncertain_point_coords_with_randomness)."""
    import jax
    import jax.numpy as jnp

    from s2d_tpu.losses.criterion import (
        _loss_labels,
        hungarian_assign,
    )
    from s2d_tpu.ops.sampling import point_sample

    p = cfg.num_points
    n_over = int(cfg.oversample_ratio * p)
    n_imp = int(cfg.importance_sample_ratio * p)
    n_rand = p - n_imp

    def sample_rows(rows, coords):
        # rows (R, H, W), coords (R, P, 2) -> (R, P)
        return point_sample(rows[:, None], coords)[:, 0]

    def layer_losses(rng, logits, masks, tgt_masks, tgt_valid, row_keep,
                     num_masks):
        b, q, t = masks.shape[:3]
        n = tgt_masks.shape[1]
        k_match, k_over, k_rand = jax.random.split(rng, 3)

        # --- matcher: fresh iid pool for THIS layer
        pool = jax.random.uniform(k_match, (p, 2))
        rows_p = masks.astype(jnp.float32).reshape(b * q * t, *masks.shape[3:])
        rows_t = tgt_masks.astype(jnp.float32).reshape(
            b * n * t, *tgt_masks.shape[3:])
        pred_pts = sample_rows(rows_p, jnp.broadcast_to(pool, (b * q * t, p, 2)))
        tgt_pts = sample_rows(rows_t, jnp.broadcast_to(pool, (b * n * t, p, 2)))
        pred_pts = jax.lax.stop_gradient(pred_pts).reshape(b, q, t * p)
        tgt_pts = jax.lax.stop_gradient(tgt_pts).reshape(b, n, t * p)
        pos = jax.nn.softplus(-pred_pts)
        neg = jax.nn.softplus(pred_pts)
        ce = (jnp.einsum("bqp,bnp->bqn", pos, tgt_pts)
              + jnp.einsum("bqp,bnp->bqn", neg, 1.0 - tgt_pts)) / (t * p)
        prob = jax.nn.sigmoid(pred_pts)
        dice = 1.0 - (2 * jnp.einsum("bqp,bnp->bqn", prob, tgt_pts) + 1.0) / (
            prob.sum(-1)[:, :, None] + tgt_pts.sum(-1)[:, None, :] + 1.0)
        cost = cfg.cost_mask * ce + cfg.cost_dice * dice
        assign = hungarian_assign(cost, tgt_valid)  # (B, N)

        # --- matched rows
        onehot = jax.nn.one_hot(assign, q, dtype=masks.dtype)
        src = jnp.einsum("bnq,bqf->bnf", onehot,
                         masks.reshape(b, q, -1)).reshape(
            b, n, t, *masks.shape[3:])
        rows_s = src.astype(jnp.float32).reshape(b * n * t, *src.shape[3:])
        keep = row_keep.reshape(b * n * t).astype(jnp.float32)

        # --- reference point selection: oversample, exact top-k, randoms
        r = b * n * t
        over = jax.random.uniform(k_over, (r, n_over, 2))
        over_logits = jax.lax.stop_gradient(sample_rows(rows_s, over))
        unc = -jnp.abs(over_logits)
        _, idx = jax.lax.top_k(unc, n_imp)
        imp_coords = jnp.take_along_axis(over, idx[..., None], axis=1)
        rand_coords = jax.random.uniform(k_rand, (r, n_rand, 2))
        coords = jnp.concatenate([imp_coords, rand_coords], axis=1)  # (R,P,2)

        src_pts = sample_rows(rows_s, coords)
        tgt_pts = sample_rows(rows_t, coords)
        ce = (jax.nn.softplus(-src_pts) * tgt_pts
              + jax.nn.softplus(src_pts) * (1.0 - tgt_pts)).mean(-1)
        loss_mask = (ce * keep).sum() / num_masks
        prob = jax.nn.sigmoid(src_pts)
        dval = 1.0 - (2 * (prob * tgt_pts).sum(-1) + 1.0) / (
            prob.sum(-1) + tgt_pts.sum(-1) + 1.0)
        loss_dice = (dval * keep).sum() / num_masks
        return assign, loss_mask, loss_dice

    def criterion(rng, outputs, tgt_masks, tgt_valid, cfg_):
        empty = tgt_masks.reshape(*tgt_masks.shape[:3], -1).sum(-1) == 0
        row_keep = tgt_valid[:, :, None] & ~empty
        num_masks = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)
        # lax.scan over layers, like the production criterion: unrolled,
        # the 10 per-layer fresh (R, S) oversample pools co-schedule and
        # OOM real-chip HBM at full scale (S=480K) — scan serializes them
        # so peak memory is ONE layer's pool
        logits_all = jnp.stack(
            [outputs["pred_logits"], *outputs["aux_pred_logits"]]
        )
        masks_all = jnp.stack(
            [outputs["pred_masks"], *outputs["aux_pred_masks"]]
        )
        n_layers = logits_all.shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(n_layers)
        )

        # remat: layer_losses' differentiable src sampling is a one-hot
        # interpolation einsum whose saved residual is the (R, P, HW)
        # sparse matrix — stacked over 9 scan steps that is a ~2 TB
        # compile-time allocation at full scale. Recomputed inside each
        # layer's backward, XLA fuses the one-hot into the cotangent
        # einsum and nothing per-layer is saved.
        layer_ckpt = jax.checkpoint(layer_losses)

        def step(carry, inp):
            key, logits, masks = inp
            assign, lm, ld = layer_ckpt(
                key, logits, masks, tgt_masks, tgt_valid, row_keep,
                num_masks)
            return carry, (assign, lm, ld)

        _, (assigns, lms, lds) = jax.lax.scan(
            step, 0, (keys, logits_all, masks_all)
        )
        losses = {
            "loss_mask": lms[0],
            "loss_dice": lds[0],
            "loss_ce": _loss_labels(logits_all[0], assigns[0], tgt_valid,
                                    cfg_),
        }
        for i in range(1, n_layers):
            losses[f"loss_mask_{i - 1}"] = lms[i]
            losses[f"loss_dice_{i - 1}"] = lds[i]
        return losses

    return criterion


# -------------------------------------------------------------- training

SCALES = {
    # the round-1 toy experiment (32-dim, 8 queries, 2 layers, 32px)
    "toy": dict(
        model=dict(hidden_dim=32, mask_dim=32, num_queries=8, nheads=4,
                   dim_feedforward=64, dec_layers=2),
        batch=dict(b=4, t=2, h=32, w=32, n=3),
        val_b=8, num_points=64,
    ),
    # the PRODUCTION criterion regime (VERDICT r2 Weak #6): 100 queries,
    # 10 decoder outputs, TRAIN_NUM_POINTS=160000 (S=480K oversample
    # pools), masks at the reference train resolution 368x640 — the
    # model stays thin (64-dim) so the run measures the SAMPLING stack,
    # not backbone capacity. Sized for the real chip (~15-25 min/arm for
    # naive, ~3 min for iid/lattice at 300 steps).
    "full": dict(
        model=dict(hidden_dim=64, mask_dim=64, num_queries=100, nheads=8,
                   dim_feedforward=128, dec_layers=9),
        batch=dict(b=1, t=3, h=368, w=640, n=8),
        val_b=4, num_points=160000,
    ),
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--arms", default="naive,iid,lattice")
    parser.add_argument("--scale", default="toy", choices=sorted(SCALES))
    parser.add_argument("--num-points", type=int, default=None,
                        help="default: per-scale (toy 64, full 160000)")
    parser.add_argument("--matcher-points", type=int, default=0,
                        help="MATCHER_NUM_POINTS for the production arms "
                        "(iid/lattice); the naive arm stays reference-"
                        "exact. 0 = full num-points (parity default)")
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="/tmp/ab_convergence.json")
    parser.add_argument("--resume", action="store_true",
                        help="skip arms already finished in <out>.partial "
                        "and continue interrupted arms from <out>.<arm>."
                        "ckpt (round-3 lost ~6h of full-scale runs to "
                        "timeouts erasing all intra-arm progress)")
    parser.add_argument("--ckpt-every", type=int, default=25,
                        help="persist per-arm train state every N steps")
    args = parser.parse_args(argv)
    preset = SCALES[args.scale]
    if args.num_points is None:
        args.num_points = preset["num_points"]
    bshape = preset["batch"]

    from s2d_tpu.utils.jax_setup import setup_runtime
    setup_runtime()
    import jax
    import jax.numpy as jnp
    import optax

    from s2d_tpu.losses.criterion import CriterionConfig, set_criterion
    from s2d_tpu.models.meta_arch import VideoMaskFormer

    model = VideoMaskFormer(
        num_classes=1, transformer_enc_layers=1,
        compute_dtype=jnp.float32,
        # the training-safe MSDA unit (same as the production trainer's
        # non-AMP build): the default "xla" auto-routes small levels to
        # the one-hot unit, whose BACKWARD materializes the sparse
        # interpolation matrices and OOMs HBM at the full-scale preset
        msda_impl="xla_gather",
        # remat the encoder like the production trainer: the f32
        # full-scale step's saved activations otherwise stack on top of
        # the criterion peak and kill the 16G chip
        grad_checkpoint=True,
        **preset["model"],
    )

    def weighted_total(losses, cfg):
        total = 0.0
        for k, v in losses.items():
            base = k.rsplit("_", 1)[0] if k.split("_")[-1].isdigit() else k
            w = {"loss_ce": cfg.cost_class or 2.0, "loss_mask": cfg.cost_mask,
                 "loss_dice": cfg.cost_dice}[base]
            total = total + w * v
        return total

    def build_arm(name):
        cfg = CriterionConfig(
            num_points=args.num_points,
            point_sampling="lattice" if name == "lattice" else "iid",
            matcher_num_points=0 if name == "naive" else args.matcher_points,
        )
        crit = build_naive_criterion(cfg) if name == "naive" else set_criterion
        def loss_fn(params, images, masks, valid, rng):
            out = model.apply(params, images)
            losses = crit(rng, out, masks, valid, cfg)
            return weighted_total(losses, cfg), losses
        return cfg, jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    # frozen yardsticks (same for every arm)
    eval_cfg = CriterionConfig(num_points=args.num_points)
    naive_eval = build_naive_criterion(eval_cfg)

    @jax.jit
    def validate(params, images, masks, valid, rng):
        out = model.apply(params, images)
        losses = naive_eval(rng, out, masks, valid, eval_cfg)
        total = weighted_total(losses, eval_cfg)
        # matched-mask IoU at the final layer (argmin-cost via naive assign
        # is inside losses; recompute cheap greedy IoU): upsample pred to
        # target res, binarize, best-query IoU per valid target
        pm = out["pred_masks"]  # (B, Q, T, h', w')
        b, q, t = pm.shape[:3]
        h, w = masks.shape[-2:]
        pm = jax.image.resize(pm, (b, q, t, h, w), "bilinear") > 0
        # matmul-form IoU: exact for 0/1 counts in f32 (pixel counts
        # < 2^24) and avoids the (B, N, Q, T, H, W) broadcast that is
        # terabytes at full scale
        pm_f = pm.reshape(b, q, -1).astype(jnp.float32)
        tm_f = masks.reshape(b, masks.shape[1], -1).astype(jnp.float32)
        inter = jnp.einsum("bnf,bqf->bnq", tm_f, pm_f)
        union = (tm_f.sum(-1)[:, :, None] + pm_f.sum(-1)[:, None, :]
                 - inter)
        iou = inter / jnp.maximum(union, 1.0)  # (B, N, Q)
        best = iou.max(-1)
        mean_iou = (best * valid).sum() / jnp.maximum(valid.sum(), 1)
        return total, mean_iou

    rs_val = np.random.RandomState(10_000 + args.seed)
    val_batch = make_batch(rs_val, **{**bshape, "b": preset["val_b"]})
    val_rng = jax.random.PRNGKey(999)

    def validate_all(params):
        """One val clip per device call: the naive yardstick at val_b=4
        in one jit (4x the training criterion's peak, plus the (B, Q, T,
        H, W) upsample) took the full-scale chip down. Per-item
        num_masks normalization differs from one batched call only in
        the per-clip weighting of the average — identical for every arm,
        so comparisons are unaffected."""
        tl, ti = [], []
        for i in range(val_batch[0].shape[0]):
            vloss, viou = validate(
                params,
                jnp.asarray(val_batch[0][i : i + 1]),
                jnp.asarray(val_batch[1][i : i + 1]),
                jnp.asarray(val_batch[2][i : i + 1]),
                val_rng,
            )
            tl.append(float(vloss))
            ti.append(float(viou))
        return float(np.mean(tl)), float(np.mean(ti))

    def save_ckpt(path, step, params, opt_state, rs, traj, t_spent):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({
                "step": step,
                "params": jax.device_get(params),
                "opt_state": jax.device_get(opt_state),
                "rs_state": rs.get_state(),
                "traj": traj,
                "seconds": t_spent,
            }, f)
        os.replace(tmp, path)

    results = {}
    if args.resume and os.path.exists(args.out + ".partial"):
        with open(args.out + ".partial") as f:
            results = json.load(f)
        print(f"[resume] loaded finished arms: {sorted(results)}", flush=True)

    for name in args.arms.split(","):
        if args.resume and name in results:
            print(f"[{name}] already finished, skipping", flush=True)
            continue
        ckpt_path = f"{args.out}.{name}.ckpt"
        cfg, step_fn = build_arm(name)
        params = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, bshape["t"], bshape["h"], bshape["w"], 3)),
        )
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)
        rs = np.random.RandomState(args.seed)  # same stream for every arm
        traj = []
        start_step, t_prev = 0, 0.0
        if args.resume and os.path.exists(ckpt_path):
            with open(ckpt_path, "rb") as f:
                ck = pickle.load(f)
            # restore onto the freshly-built pytrees so structure (incl.
            # optax namedtuple types) comes from code, arrays from disk
            params = jax.tree_util.tree_map(
                lambda _, v: jnp.asarray(v), params, ck["params"])
            opt_state = jax.tree_util.tree_map(
                lambda _, v: jnp.asarray(v), opt_state, ck["opt_state"])
            rs.set_state(ck["rs_state"])
            traj = list(ck["traj"])
            start_step, t_prev = ck["step"], ck["seconds"]
            print(f"[{name}] resumed from step {start_step}", flush=True)
        t0 = time.time()
        for step in range(start_step, args.steps):
            images, masks, valid = make_batch(rs, **bshape)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), step)
            (total, _losses), grads = step_fn(
                params, jnp.asarray(images), jnp.asarray(masks),
                jnp.asarray(valid), rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            traj.append(float(total))
            if step % 50 == 0:
                print(f"[{name}] step {step}: loss {float(total):.4f}",
                      flush=True)
            if args.ckpt_every and (step + 1) % args.ckpt_every == 0:
                save_ckpt(ckpt_path, step + 1, params, opt_state, rs, traj,
                          t_prev + time.time() - t0)
        t0 -= t_prev  # fold resumed time into the reported total
        vloss, viou = validate_all(params)
        results[name] = {
            "loss_first50": float(np.mean(traj[:50])),
            "loss_mid": float(np.mean(traj[len(traj) // 2 - 25:
                                           len(traj) // 2 + 25])),
            "loss_last50": float(np.mean(traj[-50:])),
            "val_naive_loss": vloss,
            "val_mean_best_iou": viou,
            "seconds": round(time.time() - t0, 1),
            "trajectory_every10": [round(x, 4) for x in traj[::10]],
        }
        print(f"[{name}] done: last50 {results[name]['loss_last50']:.4f}  "
              f"val {results[name]['val_naive_loss']:.4f}  "
              f"IoU {results[name]['val_mean_best_iou']:.4f}", flush=True)
        # persist after EVERY arm: a timeout mid-run keeps finished arms
        tmp = args.out + ".partial.tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.out + ".partial")
        if os.path.exists(ckpt_path):
            os.remove(ckpt_path)  # finished arms live in .partial now

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "trajectory_every10"}
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
