"""Swin backbone: pyramid shapes + parity vs an independent torch oracle."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2d_tpu.models.swin import SwinTransformer, _rel_pos_index, _shift_attn_mask


def test_rel_pos_index():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # relative index is symmetric under swap up to reflection
    assert idx[0, 0] == idx[4, 4]


def test_shift_mask_blocks_cross_regions():
    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    assert mask.any() and not mask.all()
    # unshifted top-left window has no blocked pairs
    assert not mask[0].any()


def test_swin_pyramid_shapes():
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["res2"].shape == (1, 16, 24, 32)
    assert feats["res3"].shape == (1, 8, 12, 64)
    assert feats["res4"].shape == (1, 4, 6, 128)
    assert feats["res5"].shape == (1, 2, 3, 256)


def test_window_attention_matches_torch():
    """One Swin block (shifted) vs a torch reference built from primitives."""
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    c, heads, win = 16, 2, 4
    h = w = 8
    x = rng.randn(1, h, w, c).astype(np.float32)

    from s2d_tpu.models.swin import SwinBlock

    block = SwinBlock(dim=c, num_heads=heads, window=win, shift=2)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(block.apply(params, jnp.asarray(x)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()

    # torch cross-check of the attention core on the unshifted path
    block0 = SwinBlock(dim=c, num_heads=heads, window=win, shift=0)
    p0 = block0.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out0 = np.asarray(block0.apply(p0, jnp.asarray(x)))

    pd = jax.tree_util.tree_map(np.asarray, p0["params"])
    xt = torch.from_numpy(x)
    xn = F.layer_norm(
        xt, (c,), torch.from_numpy(pd["norm1"]["scale"]),
        torch.from_numpy(pd["norm1"]["bias"]), eps=1e-5,
    )
    # window partition (h=w=8, win=4 -> 4 windows)
    xw = xn.reshape(1, 2, win, 2, win, c).permute(0, 1, 3, 2, 4, 5).reshape(4, win * win, c)
    qkv = xw @ torch.from_numpy(pd["attn"]["qkv"]["kernel"]) + torch.from_numpy(pd["attn"]["qkv"]["bias"])
    q, k, v = qkv.reshape(4, win * win, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    attn = (q * (c // heads) ** -0.5) @ k.transpose(-2, -1)
    table = torch.from_numpy(pd["attn"]["relative_position_bias_table"])
    idx = torch.from_numpy(_rel_pos_index(win).astype(np.int64))
    attn = attn + table[idx.reshape(-1)].reshape(win * win, win * win, heads).permute(2, 0, 1)[None]
    attn = attn.softmax(-1)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(4, win * win, c)
    o = o @ torch.from_numpy(pd["attn"]["proj"]["kernel"]) + torch.from_numpy(pd["attn"]["proj"]["bias"])
    o = o.reshape(1, 2, 2, win, win, c).permute(0, 1, 3, 2, 4, 5).reshape(1, h, w, c)
    xres = xt + o
    yn = F.layer_norm(
        xres, (c,), torch.from_numpy(pd["norm2"]["scale"]),
        torch.from_numpy(pd["norm2"]["bias"]), eps=1e-5,
    )
    yh = yn @ torch.from_numpy(pd["mlp_fc1"]["kernel"]) + torch.from_numpy(pd["mlp_fc1"]["bias"])
    yh = F.gelu(yh)
    yh = yh @ torch.from_numpy(pd["mlp_fc2"]["kernel"]) + torch.from_numpy(pd["mlp_fc2"]["bias"])
    ref = (xres + yh).numpy()
    np.testing.assert_allclose(out0, ref, rtol=1e-4, atol=1e-5)
