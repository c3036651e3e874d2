"""Bisect the pallas MSDA kernel cost: dot-only / no-epilogue / empty kernels
at one level's eval shapes. Identifies whether time goes to MXU, epilogue,
construction, or per-tile overhead."""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()


def timed(fn, iters=10):
    out = fn()
    _ = float(jnp.ravel(out)[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - start) / iters


def make(variant, ng, wd, k, gqp, w, d, p_tile):
    def kernel(vt_ref, ya_ref, wy0_ref, wy1_ref, x0_ref, wx0_ref, wx1_ref,
               o_ref):
        j = pl.program_id(1)
        if variant == "empty":
            o_ref[0] = jnp.zeros_like(o_ref[0])
            return
        sl = (0, slice(0, 1), pl.ds(j * p_tile, p_tile))
        ya, wy0, wy1 = ya_ref[sl], wy0_ref[sl], wy1_ref[sl]
        x0, wx0, wx1 = x0_ref[sl], wx0_ref[sl], wx1_ref[sl]
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (k, p_tile), 0)
        if variant == "noconstruct":
            a_t = (h_iota == 0).astype(jnp.bfloat16) * 0.5
        else:
            a_t = (
                jnp.where(h_iota == ya, wy0, 0.0)
                + jnp.where(h_iota == ya + 1, wy1, 0.0)
            ).astype(jnp.bfloat16)
        c_t = jax.lax.dot_general(
            vt_ref[0], a_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if variant in ("dotonly", "noconstruct"):
            o_ref[0] = c_t[:d].reshape(1, d, p_tile)[0]
            return
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1, p_tile), 0)
        x0r = x0.reshape(1, 1, p_tile)
        wxt = jnp.where(w_iota == x0r, wx0.reshape(1, 1, p_tile), 0.0) + \
            jnp.where(w_iota == x0r + 1, wx1.reshape(1, 1, p_tile), 0.0)
        c3 = c_t.reshape(w, d, p_tile)
        o_ref[0] = (c3 * wxt).sum(axis=0).astype(o_ref.dtype)

    point_spec = pl.BlockSpec((1, 1, gqp), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ng, d, gqp), jnp.float32),
        grid=(ng, gqp // p_tile),
        in_specs=[
            pl.BlockSpec((1, wd, k), lambda i, j: (i, 0, 0)),
            point_spec, point_spec, point_spec,
            point_spec, point_spec, point_spec,
        ],
        out_specs=pl.BlockSpec((1, d, p_tile), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=12)
    ap.add_argument("--w", type=int, default=20)
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--p-tile", type=int, default=512)
    args = ap.parse_args()

    n, d, qp = 64, 32, 19360
    g = args.g
    ng = n // g
    k = 128
    wd = args.w * d
    gqp = -(-g * qp // args.p_tile) * args.p_tile

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    vt = jax.random.normal(ks[0], (ng, wd, k), jnp.bfloat16)
    ya = jax.random.randint(ks[1], (ng, 1, gqp), 0, args.h * g)
    x0 = jax.random.randint(ks[2], (ng, 1, gqp), 0, args.w)
    wy0, wy1, wx0, wx1 = (
        jax.random.uniform(kk, (ng, 1, gqp)) for kk in ks[3:7]
    )

    for variant in ("empty", "dotonly", "noconstruct", "full"):
        fn = jax.jit(make(variant, ng, wd, k, gqp, args.w, d, args.p_tile))
        t = timed(lambda: fn(vt, ya, wy0, wy1, x0, wx0, wx1))
        print(f"{variant}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
