"""Flash masked cross-attention kernel vs the plain XLA softmax path.

Runs in Pallas interpret mode on CPU (the TPU compile path is exercised by
bench/TPU smoke runs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def xla_masked_attention(q, k, v, blocked):
    dh = q.shape[-1]
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * (dh ** -0.5)
    logits = jnp.where(blocked, jnp.finfo(logits.dtype).min, logits)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("q_len,k_len,dh", [(100, 300, 32), (128, 1024, 32), (7, 130, 16)])
def test_flash_matches_xla(q_len, k_len, dh, monkeypatch):
    from jax.experimental import pallas as pl
    import s2d_tpu.ops.masked_attention_pallas as map_mod

    # interpret mode on CPU
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(map_mod.pl, "pallas_call", interp_call)

    rng = np.random.RandomState(0)
    bh = 2
    q = jnp.asarray(rng.randn(bh, q_len, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, k_len, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, k_len, dh).astype(np.float32))
    blocked = jnp.asarray(rng.rand(bh, q_len, k_len) > 0.7)
    # ensure no fully-blocked row (the decoder unmasks those upstream)
    blocked = blocked.at[:, :, 0].set(False)

    ref = xla_masked_attention(q, k, v, blocked)
    got = map_mod.masked_cross_attention_flash(q, k, v, blocked, k_tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_fully_blocked_rows_are_finite(monkeypatch):
    from jax.experimental import pallas as pl
    import s2d_tpu.ops.masked_attention_pallas as map_mod

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(map_mod.pl, "pallas_call", interp_call)

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 8, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 64, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 64, 16).astype(np.float32))
    blocked = jnp.ones((1, 8, 64), bool)  # everything blocked
    out = map_mod.masked_cross_attention_flash(q, k, v, blocked, k_tile=64)
    assert np.isfinite(np.asarray(out)).all()
