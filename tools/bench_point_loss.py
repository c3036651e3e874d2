"""Fused point-loss kernel microbench at production criterion shapes.

Times one layer pass (fwd and fwd+bwd) of the point loss three ways:
  * fused pallas kernel (ops/point_loss_pallas.py)
  * unfused lattice path (XLA blends + (R, S) chain)
and prints per-pass times — the full KD step runs 20 such passes.
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


def timed(fn, iters):
    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--r", type=int, default=75)
    ap.add_argument("--amp", action="store_true", default=True)
    args = ap.parse_args()

    import dataclasses

    from s2d_tpu.losses import criterion as C
    from s2d_tpu.ops.lattice import choose_lattice

    r = args.r
    hp, wp = 92, 160
    ht, wt = 368, 640
    nominal = 480000
    ly, lx = choose_lattice(nominal, (hp, ht), (wp, wt))
    s = ly * lx
    print(f"lattice ({ly}, {lx}) = {s} points", flush=True)

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(r, hp, wp).astype(np.float32))
    tgt = jnp.asarray(rng.rand(r, ht, wt) > 0.7)
    bern = jnp.asarray(rng.rand(r, s) < 0.08)
    phase = jnp.asarray([0.37, 0.81], jnp.float32)
    keep = jnp.ones((r,), jnp.float32)
    num_masks = jnp.asarray(25.0)

    wd = jnp.bfloat16 if args.amp else jnp.float32
    cfg = C.CriterionConfig(
        num_points=160000, gather_dtype=wd,
        bwd_einsum_precision=jax.lax.Precision.DEFAULT,
        point_sampling="lattice",
    )
    num_uncertain = int(cfg.importance_sample_ratio * cfg.num_points)

    def fused(src):
        return C._loss_masks_fused(
            src, tgt, phase, bern, keep, num_masks, cfg, (ly, lx),
            num_uncertain, wd,
        )

    def unfused(src):
        from s2d_tpu.ops.lattice import lattice_sample

        pool_tgt = jax.lax.stop_gradient(
            lattice_sample(tgt.astype(wd), ly, lx, phase)
        ).reshape(r, -1)
        return C._loss_masks(
            src[:, None, None], phase, pool_tgt, bern,
            keep[:, None, None], num_masks,
            dataclasses.replace(cfg, fused_point_loss="off"),
            lattice=(ly, lx),
        )

    for name, fn in (("fused", fused), ("unfused", unfused)):
        fwd = jax.jit(lambda x, fn=fn: sum(fn(x)))
        t_f = timed(lambda: fwd(src), args.iters)
        bwd = jax.jit(jax.grad(lambda x, fn=fn: sum(fn(x))))
        t_b = timed(lambda: bwd(src), args.iters)
        print(
            f"{name}: fwd {t_f*1e3:.2f} ms  fwd+bwd {t_b*1e3:.2f} ms "
            f"(per layer pass; x20 per KD step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
