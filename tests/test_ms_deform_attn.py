"""MS deformable attention: XLA implementation vs an independent numpy oracle.

Mirrors the reference's own op-parity strategy (`/root/reference/
model_training/mask2former/modeling/pixel_decoder/ops/test.py`): the oracle is
a naive per-point loop with explicit bilinear interpolation, written
independently of both the JAX and torch implementations.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2d_tpu.ops import ms_deform_attn


def numpy_msda_oracle(value, spatial_shapes, locs, weights):
    """Naive loop oracle. value (B,S,M,D); locs (B,Lq,M,L,P,2); w (B,Lq,M,L,P)."""
    b, s, m, d = value.shape
    _, lq, _, nl, p, _ = locs.shape
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    out = np.zeros((b, lq, m * d), dtype=np.float64)
    for bi in range(b):
        for qi in range(lq):
            for mi in range(m):
                acc = np.zeros(d)
                for li, (h, w) in enumerate(spatial_shapes):
                    vmap = value[bi, starts[li] : starts[li] + h * w, mi].reshape(h, w, d)
                    for pi in range(p):
                        x, y = locs[bi, qi, mi, li, pi]
                        # [0,1] -> pixel coords, half-pixel centres
                        ix, iy = x * w - 0.5, y * h - 0.5
                        x0, y0 = int(np.floor(ix)), int(np.floor(iy))
                        sample = np.zeros(d)
                        for (xc, yc, wt) in [
                            (x0, y0, (1 - (ix - x0)) * (1 - (iy - y0))),
                            (x0 + 1, y0, (ix - x0) * (1 - (iy - y0))),
                            (x0, y0 + 1, (1 - (ix - x0)) * (iy - y0)),
                            (x0 + 1, y0 + 1, (ix - x0) * (iy - y0)),
                        ]:
                            if 0 <= xc < w and 0 <= yc < h:
                                sample += wt * vmap[yc, xc]
                        acc += weights[bi, qi, mi, li, pi] * sample
                out[bi, qi, mi * d : (mi + 1) * d] = acc
    return out


def _random_inputs(seed=0, b=2, lq=7, m=2, d=4, p=3):
    rng = np.random.RandomState(seed)
    spatial_shapes = [(6, 9), (3, 5), (2, 2)]
    s = sum(h * w for h, w in spatial_shapes)
    nl = len(spatial_shapes)
    value = rng.randn(b, s, m, d).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, size=(b, lq, m, nl, p, 2)).astype(np.float32)
    w = rng.rand(b, lq, m, nl, p).astype(np.float32)
    w /= w.reshape(b, lq, m, -1).sum(-1)[..., None, None]
    return value, spatial_shapes, locs, w


def test_msda_xla_matches_oracle():
    value, shapes, locs, w = _random_inputs()
    ref = numpy_msda_oracle(
        value.astype(np.float64), shapes, locs.astype(np.float64), w.astype(np.float64)
    )
    out = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_msda_grad_finite_differences():
    value, shapes, locs, w = _random_inputs(seed=1, b=1, lq=3, m=1, d=2, p=2)
    value, locs, w = jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for argi, arg in enumerate([value, locs, w]):
        arr = np.asarray(arg)
        for _ in range(5):
            idx = tuple(rng.randint(0, sdim) for sdim in arr.shape)
            bumped = arr.copy()
            bumped[idx] += eps
            hi = f(*(jnp.asarray(bumped) if i == argi else a for i, a in enumerate([value, locs, w])))
            bumped[idx] -= 2 * eps
            lo = f(*(jnp.asarray(bumped) if i == argi else a for i, a in enumerate([value, locs, w])))
            fd = (float(hi) - float(lo)) / (2 * eps)
            an = float(np.asarray(grads[argi])[idx])
            assert abs(fd - an) < 2e-2 * max(1.0, abs(fd)), (argi, idx, fd, an)


def test_msda_pallas_matches_oracle():
    """Pallas kernel (interpret mode) vs the numpy oracle: exact in f32
    compute, AMP-class (~1e-2) in the bf16 default."""
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _random_inputs(seed=3, b=2, lq=9, m=2, d=4, p=4)
    ref = numpy_msda_oracle(
        value.astype(np.float64), shapes, locs.astype(np.float64), w.astype(np.float64)
    )
    out = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            compute_dtype=jnp.float32, q_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    out16 = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            compute_dtype=jnp.bfloat16, q_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(out16, ref, rtol=0.05, atol=0.02)


def test_msda_pallas_tall_level_and_tile_padding():
    """H > 128 exercises the multi-tile K dimension; Lq*P not a multiple of
    p_tile exercises point padding."""
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    rng = np.random.RandomState(7)
    shapes = [(130, 3)]
    s = sum(h * w for h, w in shapes)
    b, lq, m, d, p = 1, 11, 1, 4, 3
    value = rng.randn(b, s, m, d).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(b, lq, m, 1, p, 2)).astype(np.float32)
    w = rng.rand(b, lq, m, 1, p).astype(np.float32)
    ref = numpy_msda_oracle(
        value.astype(np.float64), shapes, locs.astype(np.float64), w.astype(np.float64)
    )
    out = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            compute_dtype=jnp.float32, q_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_msda_pallas_grad_matches_xla():
    """Custom-VJP backward (transposed MXU kernel) vs jax.grad of the XLA
    path: exact in f32 compute (both are f32 sums of the same terms)."""
    from s2d_tpu.ops.ms_deform_attn import _ms_deform_attn_xla
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _random_inputs(seed=5, b=2, lq=9, m=2, d=4, p=4)
    value, locs, w = jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
    cot = jnp.asarray(
        np.random.RandomState(0).randn(2, 9, 8).astype(np.float32)
    )

    def f_ref(v, l, a):
        return jnp.sum(_ms_deform_attn_xla(v, shapes, l, a) * cot)

    def f_pal(v, l, a):
        return jnp.sum(
            ms_deform_attn_pallas(
                v, shapes, l, a,
                compute_dtype=jnp.float32, q_tile=128, interpret=True,
            )
            * cot
        )

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(value, locs, w)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(value, locs, w)
    for name, a, b_ in zip(("value", "locs", "attn"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=name,
        )


def test_msda_jit_compiles():
    value, shapes, locs, w = _random_inputs(seed=2)
    fn = jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a))
    out = fn(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    assert out.shape == (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])


@pytest.mark.parametrize("orient", ["swap", "auto"])
def test_msda_pallas_orient_matches_oracle(orient):
    """Swapped-axis orientation (K = W, output rows = H*D): same math,
    ~42% fewer padded-K FLOPs at wide aspect ratios. Forward parity vs
    the numpy oracle, incl. out-of-range sampling points."""
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _random_inputs(seed=11, b=2, lq=9, m=2, d=4, p=4)
    ref = numpy_msda_oracle(
        value.astype(np.float64), shapes, locs.astype(np.float64),
        w.astype(np.float64)
    )
    out = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            compute_dtype=jnp.float32, q_tile=128, interpret=True,
            orient=orient,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_msda_pallas_orient_grad_matches_xla():
    """Swapped orientation backward: custom VJP vs jax.grad of the XLA
    path, all three operand grads."""
    from s2d_tpu.ops.ms_deform_attn import _ms_deform_attn_xla
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _random_inputs(seed=13, b=2, lq=9, m=2, d=4, p=4)
    value, locs, w = jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
    cot = jnp.asarray(
        np.random.RandomState(1).randn(2, 9, 8).astype(np.float32)
    )

    def f_ref(v, l, a):
        return jnp.sum(_ms_deform_attn_xla(v, shapes, l, a) * cot)

    def f_pal(v, l, a):
        return jnp.sum(
            ms_deform_attn_pallas(
                v, shapes, l, a,
                compute_dtype=jnp.float32, q_tile=128, interpret=True,
                orient="auto",
            )
            * cot
        )

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(value, locs, w)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(value, locs, w)
    for name, a, b_ in zip(("value", "locs", "attn"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=name,
        )


def test_msda_orient_auto_swaps_protocol_levels():
    """At the eval protocol's wide levels, 'auto' puts H in the output and
    W on the padded-K axis (that's the FLOP win); square levels stay."""
    from s2d_tpu.ops.ms_deform_attn_pallas import _prep_operands

    rng = np.random.RandomState(0)
    shapes = [(46, 80), (23, 40), (12, 12)]
    s = sum(h * w for h, w in shapes)
    b, lq, m, d, p = 1, 5, 1, 4, 2
    value = jnp.asarray(rng.randn(b, s, m, d).astype(np.float32))
    locs = jnp.asarray(rng.rand(b, lq, m, 3, p, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(b, lq, m, 3, p).astype(np.float32))

    v_ts, _, _, fracs, kshapes = _prep_operands(
        value, shapes, locs, w, jnp.float32, orient="auto")
    assert kshapes == [(80, 46), (40, 23), (12, 12)]
    assert [f[0] for f in fracs] == [True, True, False]
    # output rows = blend_axis * d; K padded to 128
    assert v_ts[0].shape == (1, 46 * d, 128)
    assert v_ts[2].shape == (1, 12 * d, 128)


def test_msda_pallas_swap_wide_level_multitile_k():
    """Swapped orientation with W > 128: the padded-K axis spans multiple
    128 tiles (mirror of the tall-level test for orient='y')."""
    from s2d_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    rng = np.random.RandomState(17)
    shapes = [(3, 130)]
    s = sum(h * w for h, w in shapes)
    b, lq, m, d, p = 1, 11, 1, 4, 3
    value = rng.randn(b, s, m, d).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(b, lq, m, 1, p, 2)).astype(np.float32)
    w = rng.rand(b, lq, m, 1, p).astype(np.float32)
    ref = numpy_msda_oracle(
        value.astype(np.float64), shapes, locs.astype(np.float64),
        w.astype(np.float64)
    )
    out = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            compute_dtype=jnp.float32, q_tile=128, interpret=True,
            orient="auto",
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dispatch_qtile_env_knob(monkeypatch):
    """ms_deform_attn(impl="pallas*") honors S2D_MSDA_QTILE at trace time
    and maps pallas_auto -> orient="auto" (whole-pipeline A/B knob)."""
    import importlib

    # the ops package re-exports the FUNCTION under the same name, which
    # shadows the submodule attribute — go through importlib
    mod = importlib.import_module("s2d_tpu.ops.ms_deform_attn")
    pmod = importlib.import_module("s2d_tpu.ops.ms_deform_attn_pallas")

    captured = {}

    def fake(value, shapes, locs, wts, q_tile=512, orient="y", **kw):
        captured.update(q_tile=q_tile, orient=orient)
        b, lq = value.shape[0], locs.shape[1]
        return jnp.zeros((b, lq, value.shape[2] * value.shape[3]))

    monkeypatch.setattr(pmod, "ms_deform_attn_pallas", fake)
    monkeypatch.setenv("S2D_MSDA_QTILE", "1024")
    b, m, d = 1, 2, 4
    shapes = [(4, 6)]
    value = jnp.zeros((b, 24, m, d))
    locs = jnp.zeros((b, 5, m, 1, 2, 2))
    wts = jnp.zeros((b, 5, m, 1, 2))
    out = mod.ms_deform_attn(value, shapes, locs, wts, impl="pallas_auto")
    assert out.shape == (b, 5, m * d)
    assert captured == {"q_tile": 1024, "orient": "auto"}


def test_auto_orientation_counts_padding():
    """orient='auto' minimizes padded MXU FLOPs = output_rows *
    round_up(K, 128), not a bare H<W compare: at (92, 160) swapping would
    put K=256 and do ~15% MORE work, so auto must NOT swap there, while
    at the protocol's (46, 80) it must."""
    import importlib

    import jax.numpy as jnp

    pmod = importlib.import_module("s2d_tpu.ops.ms_deform_attn_pallas")

    def kernel_shapes(h, w):
        b, m, d, lq, p = 1, 1, 4, 3, 1
        value = jnp.zeros((b, h * w, m, d))
        locs = jnp.full((b, lq, m, 1, p, 2), 0.5)
        wts = jnp.ones((b, lq, m, 1, p))
        _, _, _, _, ks = pmod._prep_operands(
            value, [(h, w)], locs, wts, jnp.float32, orient="auto")
        return ks[0]

    assert kernel_shapes(46, 80) == (80, 46)   # swapped: 46*128 < 80*128
    assert kernel_shapes(92, 160) == (92, 160)  # NOT swapped: 92*256 > 160*128
    assert kernel_shapes(160, 92) == (92, 160)  # tall level: swap to K=92
