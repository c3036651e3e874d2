#!/usr/bin/env python
"""ON-CHIP (Mosaic, non-interpret) parity check for the fused point-loss
kernel — the gate for re-enabling `fused_point_loss="auto"`.

tests/test_point_loss_pallas.py pins parity in INTERPRET mode only;
interpret mode has previously missed a Mosaic i1 lowering bug, so the
kernel stays off by default until this passes on real hardware
(round-1 VERDICT Weak #3 / next-round item #1).

Checks, all against the XLA lattice path on the SAME device at f32
(HIGHEST-precision blends so the reference itself is exact):
  1. forward sums + custom-VJP src-grad at the unit-test shapes
     (covers up/up, x-up, and target-x-DOWNSAMPLE resampling cases);
  2. forward + grad at production criterion shapes (r=75, 92x160 pred,
     368x640 tgt, ~480K lattice) in f32 AND bf16 compute;
  3. a W == Lx config exercising the lane-shift (pltpu.roll) fast path
     on both operands;
  4. criterion-level fused=on vs off equality (selection off) and
     closeness (selection on).

Prints ONE JSON line {"ok": bool, "backend": ..., "checks": {...}};
exit code 0 iff every check passes at its tolerance.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from s2d_tpu.utils import jax_setup

jax_setup.setup_runtime()

import jax
import jax.numpy as jnp

from s2d_tpu.ops.lattice import choose_lattice, lattice_sample
from s2d_tpu.ops.point_loss_pallas import fused_point_sums

# real Mosaic lowering on TPU; interpret elsewhere (script smoke-test only
# — the on-chip gate is a TPU run)
INTERPRET = jax.default_backend() != "tpu"

CHECKS = {}
FAILS = []


def reference_sums(src, tgt, bern, thr, phase, ly, lx):
    r = src.shape[0]
    pv = lattice_sample(src, ly, lx, phase).reshape(r, -1)
    tv = lattice_sample(tgt, ly, lx, phase).reshape(r, -1)
    sel = (
        -jnp.abs(jax.lax.stop_gradient(pv)) >= thr.reshape(r, 1)
    ).astype(pv.dtype)
    w = bern.astype(pv.dtype) + sel
    ce = jnp.maximum(pv, 0.0) - pv * tv + jax.nn.softplus(-jnp.abs(pv))
    probs = jax.nn.sigmoid(pv)
    return (
        (ce * w).sum(axis=1),
        w.sum(axis=1),
        (probs * tv * w).sum(axis=1),
        (probs * w).sum(axis=1),
        (tv * w).sum(axis=1),
    )


def record(name, got, ref, tol):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    denom = np.maximum(np.abs(ref), 1.0)
    err = float(np.max(np.abs(got - ref) / denom))
    ok = bool(err <= tol)
    CHECKS[name] = {"max_rel_err": round(err, 8), "tol": tol, "ok": ok}
    if not ok:
        FAILS.append(name)


def record_robust(name, got, ref, err_thresh, frac_tol):
    """For bf16 GRADIENTS: the selection indicator [|pv| <= -thr] is
    computed on bf16-rounded values, so points on the threshold boundary
    can flip vs the f32 reference — a flipped point changes its element's
    gradient DISCRETELY (legit behavior, seen identically in interpret
    mode, not a Mosaic artifact). Pass iff big deviations are isolated
    (fraction <= frac_tol) while the bulk matches."""
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    frac_big = float((rel > err_thresh).mean())
    mean_err = float(rel.mean())
    ok = bool(frac_big <= frac_tol and mean_err <= err_thresh / 10)
    CHECKS[name] = {
        "frac_over_thresh": round(frac_big, 8),
        "mean_rel_err": round(mean_err, 8),
        "err_thresh": err_thresh, "frac_tol": frac_tol, "ok": ok,
    }
    if not ok:
        FAILS.append(name)


def check_shapes(name, sp, tp, ly, lx, compute_dtype, tol, grad_tol,
                 robust_grad=False):
    import zlib

    rng = np.random.RandomState(zlib.crc32(name.encode()) % 2**31)
    src = jnp.asarray(rng.randn(*sp).astype(np.float32))
    tgt = jnp.asarray((rng.rand(*tp) > 0.5).astype(np.float32))
    bern = jnp.asarray(rng.rand(sp[0], ly * lx) < 0.3)
    thr = jnp.asarray(rng.rand(sp[0]).astype(np.float32) * -0.5)
    phase = jnp.asarray([0.37, 0.81], jnp.float32)
    cot = jnp.asarray(rng.randn(3, sp[0]).astype(np.float32))

    @jax.jit
    def fused_all(s):
        return fused_point_sums(
            s, tgt, bern, thr, phase, ly, lx, compute_dtype, INTERPRET
        )

    @jax.jit
    def ref_all(s):
        return reference_sums(s, tgt, bern, thr, phase, ly, lx)

    got = fused_all(src)
    ref = ref_all(src)
    for i, part in enumerate(("ce", "w", "num", "ps", "ts")):
        record(f"{name}/fwd_{part}", got[i], ref[i], tol)

    def fused_total(s):
        ce, _w, num, ps, _ts = fused_point_sums(
            s, tgt, bern, thr, phase, ly, lx, compute_dtype, INTERPRET
        )
        return (cot[0] * ce + cot[1] * num + cot[2] * ps).sum()

    def ref_total(s):
        ce, _w, num, ps, _ts = reference_sums(
            s, tgt, bern, thr, phase, ly, lx
        )
        return (cot[0] * ce + cot[1] * num + cot[2] * ps).sum()

    g_f = jax.jit(jax.grad(fused_total))(src)
    g_r = jax.jit(jax.grad(ref_total))(src)
    if robust_grad == "self":
        # bf16 vs the f32 XLA reference is dominated by bf16 rounding, so
        # the sharp lowering test is Mosaic vs the SAME kernel in
        # interpret mode (identical algorithm + rounding sequence)
        def fused_total_interp(s):
            ce, _w, num, ps, _ts = fused_point_sums(
                s, tgt, bern, thr, phase, ly, lx, compute_dtype, True
            )
            return (cot[0] * ce + cot[1] * num + cot[2] * ps).sum()

        g_i = jax.jit(jax.grad(fused_total_interp))(src)
        record_robust(f"{name}/grad_vs_interp", g_f, g_i, grad_tol,
                      frac_tol=1e-3)
    elif robust_grad:
        # f32 at production pool sizes: ~480K points/row means some |pv|
        # sit within float noise of the selection threshold; a flipped
        # point changes its element's gradient discretely. Isolated flips
        # are legit — the bulk must match.
        record_robust(f"{name}/grad", g_f, g_r, grad_tol, frac_tol=2e-4)
    else:
        record(f"{name}/grad", g_f, g_r, grad_tol)


def check_criterion():
    import dataclasses

    from s2d_tpu.losses import CriterionConfig, set_criterion

    rng = np.random.RandomState(5)
    b, q, n, t, hp, wp = 1, 6, 3, 2, 8, 12
    h, w = hp * 4, wp * 4
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, q, 2).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(b, q, t, hp, wp).astype(np.float32)),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
    }
    masks = jnp.asarray(rng.rand(b, n, t, h, w) > 0.6)
    valid = jnp.asarray([[True, True, False]])

    for ratio, name, tol in ((0.0, "crit_nosel", 5e-5), (0.75, "crit_sel", 0.1)):
        base = CriterionConfig(
            num_points=1536, point_sampling="lattice",
            importance_sample_ratio=ratio,
        )
        l_off = set_criterion(
            jax.random.PRNGKey(0), outputs, masks, valid,
            dataclasses.replace(base, fused_point_loss="off"),
        )
        l_on = set_criterion(
            jax.random.PRNGKey(0), outputs, masks, valid,
            dataclasses.replace(base, fused_point_loss="on"),
        )
        for k in ("loss_mask", "loss_dice"):
            record(f"{name}/{k}", float(l_on[k]), float(l_off[k]), tol)


def main() -> int:
    backend = jax.default_backend()

    # 1. unit-test shapes (resampling-case coverage), exact f32
    for i, (sp, tp, ly, lx) in enumerate([
        ((4, 6, 8), (4, 12, 16), 24, 16),
        ((3, 4, 10), (3, 8, 20), 8, 40),
        ((2, 5, 24), (2, 10, 12), 10, 12),
    ]):
        check_shapes(f"unit{i}", sp, tp, ly, lx, jnp.float32, 5e-5, 5e-4)

    # 2. production criterion shapes, f32 then bf16 compute
    hp, wp, ht, wt = 92, 160, 368, 640
    ly, lx = choose_lattice(480000, (hp, ht), (wp, wt))
    check_shapes("prod_f32", (75, hp, wp), (75, ht, wt), ly, lx,
                 jnp.float32, 2e-4, 1e-2, robust_grad=True)
    check_shapes("prod_bf16", (75, hp, wp), (75, ht, wt), ly, lx,
                 jnp.bfloat16, 2e-2, 2e-2, robust_grad="self")

    # 3. lane-shift fast path: W == Lx on both operands
    check_shapes("laneshift", (16, 24, 128), (16, 48, 128), 48, 128,
                 jnp.float32, 5e-5, 5e-4)

    # 4. criterion-level fused on/off
    check_criterion()

    ok = not FAILS
    print(json.dumps({
        "ok": ok, "backend": backend, "fails": FAILS,
        "checks": CHECKS,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
