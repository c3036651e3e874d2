"""Per-level MSDA sampling microbenchmark at the eval-protocol shapes.

Times the XLA one-hot sampling unit per level (and the full ms_deform_attn
call) at the shapes one deformable encoder layer sees for T=8 @ 368x640:
levels (46,80), (23,40), (12,20), Lq = 4840, M=8 heads, D=32, P=4 points.
Forced scalar read is the timing barrier (axon transport).
"""
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

from s2d_tpu.ops.ms_deform_attn import ms_deform_attn
from s2d_tpu.ops.sampling import grid_sample_rows


def timed(fn, iters=10):
    out = fn()
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--orient", default="y", choices=["y", "swap", "auto"],
                    help="pallas axis orientation (auto: smaller axis to "
                         "the output; ~42%% fewer padded-K FLOPs)")
    ap.add_argument("--skip-levels", action="store_true")
    args = ap.parse_args()

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    b, m, d, p = args.t, 8, 32, 4
    shapes = [(46, 80), (23, 40), (12, 20)]
    lq = sum(h * w for h, w in shapes)
    s = lq
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)

    value = jax.random.normal(k1, (b, s, m, d), dtype)
    locs = jax.random.uniform(k2, (b, lq, m, len(shapes), p, 2))
    w = jax.nn.softmax(
        jax.random.normal(k3, (b, lq, m, len(shapes), p)).reshape(b, lq, m, -1)
    ).reshape(b, lq, m, len(shapes), p)

    full = jax.jit(lambda v, l, wt: ms_deform_attn(v, shapes, l, wt))
    t_full = timed(lambda: full(value, locs, w), args.iters)
    print(f"full ms_deform_attn ({args.dtype}): {t_full*1e3:.2f} ms", flush=True)

    if args.pallas:
        from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

        for pt in (256, 512, 1024):
            fn = jax.jit(
                lambda v, l, wt, pt=pt: ms_deform_attn_pallas(
                    v, shapes, l, wt, compute_dtype=jnp.bfloat16, q_tile=pt,
                    orient=args.orient,
                )
            )
            t = timed(lambda: fn(value, locs, w), args.iters)
            print(f"pallas (bf16, q_tile={pt}, orient={args.orient}): "
                  f"{t*1e3:.2f} ms", flush=True)

        # per-level cost: single-level calls at the same point count
        for lid, (h, w_) in enumerate(shapes):
            v1 = jax.random.normal(k1, (b, h * w_, m, d), jnp.bfloat16)
            l1 = locs[:, :, :, lid : lid + 1]
            w1 = w[:, :, :, lid : lid + 1]
            fn = jax.jit(
                lambda v, l, wt, h=h, w_=w_: ms_deform_attn_pallas(
                    v, [(h, w_)], l, wt, compute_dtype=jnp.bfloat16,
                    q_tile=512, orient=args.orient,
                )
            )
            t = timed(lambda: fn(v1, l1, w1), args.iters)
            print(f"pallas level {lid} ({h}x{w_}): {t*1e3:.2f} ms", flush=True)
        ref = full(value, locs, w)
        out = jax.jit(
            lambda v, l, wt: ms_deform_attn_pallas(
                v, shapes, l, wt, compute_dtype=jnp.bfloat16
            )
        )(value, locs, w)
        err = float(jnp.abs(out - ref).max())
        scale = float(jnp.abs(ref).max())
        print(f"pallas bf16 vs xla: max abs err {err:.2e} (ref scale {scale:.2f})",
              flush=True)

    # per-level sampling unit
    if args.skip_levels:
        return
    start = 0
    for lid, (h, w_) in enumerate(shapes):
        v_rows = (
            value[:, start : start + h * w_]
            .transpose(0, 2, 1, 3)
            .reshape(b * m, h * w_, d)
        )
        grid = 2.0 * locs[:, :, :, lid].transpose(0, 2, 1, 3, 4).reshape(
            b * m, lq * p, 2
        ) - 1.0
        for impl in ("onehot", "gather"):
            fn = jax.jit(
                lambda vr, g, impl=impl, h=h, w_=w_: grid_sample_rows(
                    vr, g, h, w_, impl=impl
                )
            )
            t = timed(lambda: fn(v_rows, grid), args.iters)
            print(
                f"level {lid} ({h}x{w_}) {impl}: {t*1e3:.2f} ms", flush=True
            )
        start += h * w_


if __name__ == "__main__":
    main()
