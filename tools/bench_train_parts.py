"""Microbenchmarks for non-point train-step components on the TPU:
the auction Hungarian solve at train-step shapes, the distillation-target
prep (teacher top-k + mask NMS), and the EMA/optimizer tree update."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()


def timed(fn, iters=10):
    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25, help="targets per video")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweep-auction", action="store_true")
    ap.add_argument("--auction-impl", action="store_true",
                    help="time the xla vs pallas auction backends")
    ap.add_argument("--pool-gather", action="store_true")
    ap.add_argument("--pool-gather-bwd", action="store_true")
    args = ap.parse_args()

    from s2d_tpu.losses.matcher import hungarian_assign
    from s2d_tpu.ops import auction as A

    # train-step shape: (layers*B*criteria) independent (Q, N) problems
    rng = jax.random.PRNGKey(0)
    cost = jax.random.normal(rng, (20, 100, args.n)) * 5.0
    valid = jnp.ones((20, args.n), bool)
    fn = jax.jit(hungarian_assign)
    t = timed(lambda: fn(cost, valid), args.iters)
    print(f"hungarian_assign (20, 100, {args.n}): {t*1e3:.1f} ms", flush=True)

    if args.auction_impl:
        for nb in (20, 40):
            c = jax.random.normal(jax.random.PRNGKey(nb), (nb, 100, args.n)) * 5.0
            v = jnp.ones((nb, args.n), bool)
            outs = {}
            for impl in ("xla", "pallas"):
                A.IMPL = impl
                fn = jax.jit(lambda c, v: A.auction_assign(c, v))
                t = timed(lambda: fn(c, v), args.iters)
                outs[impl] = jax.device_get(fn(c, v))
                print(f"auction ({nb}, 100, {args.n}) {impl}: {t*1e3:.2f} ms",
                      flush=True)
            A.IMPL = "auto"
            import numpy as _np
            print("  assignments identical:",
                  bool(_np.array_equal(outs["xla"], outs["pallas"])), flush=True)

    if args.pool_gather_bwd:
        # fwd vs fwd+bwd of the criterion's lane-packed pool sample at
        # train shapes — isolates the matmul-backward einsum cost
        from s2d_tpu.losses.criterion import _lane_packed_sample

        for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            prec = (jax.lax.Precision.HIGHEST if dtype_name == "f32"
                    else jax.lax.Precision.DEFAULT)
            maps = jax.random.normal(jax.random.PRNGKey(0), (75, 92, 160))
            pool = jax.random.uniform(jax.random.PRNGKey(1), (480000, 2))

            fwd = jax.jit(lambda m, p: _lane_packed_sample(m, p, prec, dtype))
            t_f = timed(lambda: fwd(maps, pool), args.iters)

            def loss(m, p):
                return _lane_packed_sample(m, p, prec, dtype).astype(
                    jnp.float32
                ).sum()

            vg = jax.jit(jax.grad(loss))
            t_fb = timed(lambda: vg(maps, pool), args.iters)
            print(
                f"pool_src {dtype_name}: fwd {t_f*1e3:.2f} ms, "
                f"fwd+bwd {t_fb*1e3:.2f} ms", flush=True,
            )

    if args.sweep_auction:
        import functools as _ft

        base_theta = A.THETA
        for theta, unroll in ((4.0, 8), (8.0, 4), (8.0, 8), (16.0, 8)):
            A.THETA = theta
            orig = A._auction_asym
            A._auction_asym = _ft.partial(orig, unroll=unroll)
            # fresh lambda: jit caches on function identity, so wrapping
            # A.auction_assign directly would silently reuse the first trace
            fn = jax.jit(lambda c, v: A.auction_assign(c, v))
            t = timed(lambda: fn(cost, valid), args.iters)
            A._auction_asym = orig
            print(
                f"auction theta={theta} unroll={unroll}: {t*1e3:.1f} ms",
                flush=True,
            )
        A.THETA = base_theta

    if args.pool_gather:
        from s2d_tpu.ops.sampling import (
            grid_sample_packed, grid_sample_rows, pack_2x2,
        )

        for hw_shape, r, s_pts, tag in (
            ((92, 160), 75, 480000, "pool_src stride4"),
            ((368, 640), 75, 480000, "pool_tgt fullres"),
            ((92, 160), 300, 480000, "pool_src N=100"),
            ((92, 160), 300, 160000, "pred_pts N=100"),
        ):
            hh, ww = hw_shape
            k1, k2 = jax.random.split(jax.random.PRNGKey(r), 2)
            rows = jax.random.normal(k1, (1, hh * ww, r))
            grid = jax.random.uniform(k2, (1, s_pts, 2)) * 2.0 - 1.0
            for impl in ("gather", "onehot", "packed", "packed_pre"):
                if impl == "packed":
                    # pack included in the timed region (it is per-layer
                    # work when the maps change every layer)
                    fn = jax.jit(
                        lambda ro, g, hh=hh, ww=ww: grid_sample_packed(
                            pack_2x2(ro, hh, ww), g, hh, ww, onehot=False
                        )
                    )
                    t = timed(lambda: fn(rows, grid), args.iters)
                elif impl == "packed_pre":
                    packed = jax.jit(
                        lambda ro, hh=hh, ww=ww: pack_2x2(ro, hh, ww)
                    )(rows)
                    packed.block_until_ready()
                    fn = jax.jit(
                        lambda pk, g, hh=hh, ww=ww: grid_sample_packed(
                            pk, g, hh, ww, onehot=False
                        )
                    )
                    t = timed(lambda: fn(packed, grid), args.iters)
                else:
                    fn = jax.jit(
                        lambda ro, g, impl=impl, hh=hh, ww=ww: grid_sample_rows(
                            ro, g, hh, ww, impl=impl
                        )
                    )
                    t = timed(lambda: fn(rows, grid), args.iters)
                print(f"{tag} {impl}: {t*1e3:.2f} ms", flush=True)

    from s2d_tpu.train.trainer import prepare_distillation_targets

    q, tt, hh, ww = 100, 3, 92, 160
    k1, k2 = jax.random.split(rng)
    teacher_out = {
        "pred_logits": jax.random.normal(k1, (1, q, 2)),
        "pred_masks": jax.random.normal(k2, (1, q, tt, hh, ww)),
    }
    fn2 = jax.jit(
        lambda o: prepare_distillation_targets(o, 0.75, (hh * 4, ww * 4))
    )
    t = timed(lambda: fn2(teacher_out), args.iters)
    print(f"prepare_distillation_targets: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
