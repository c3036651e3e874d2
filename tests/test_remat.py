"""Gradient checkpointing: remat model matches non-remat values + grads."""
import numpy as np

import jax
import jax.numpy as jnp

from s2d_tpu.models import VideoMaskFormer


def test_remat_matches_plain():
    kw = dict(
        num_queries=4, hidden_dim=32, mask_dim=32, nheads=4,
        dim_feedforward=64, dec_layers=2, transformer_enc_layers=2,
        compute_dtype=jnp.float32,
    )
    plain = VideoMaskFormer(**kw)
    remat = VideoMaskFormer(grad_checkpoint=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32, 3))
    params = plain.init(jax.random.PRNGKey(1), x)

    out_a = plain.apply(params, x)["pred_masks"]
    out_b = remat.apply(params, x)["pred_masks"]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)

    def loss(model, p):
        return jnp.sum(model.apply(p, x)["pred_masks"] ** 2)

    ga = jax.grad(lambda p: loss(plain, p))(params)
    gb = jax.grad(lambda p: loss(remat, p))(params)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
