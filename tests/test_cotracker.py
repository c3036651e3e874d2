"""CoTracker-style neural tracker: protocol compliance, query-frame
anchoring, and torch state_dict converter roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_net():
    from s2d_tpu.keymask.cotracker import CoTrackerNet

    net = CoTrackerNet(latent_dim=16, dim=32, heads=4, depth=1, iters=2,
                       levels=2, radius=1)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((3, 64, 64, 3)), jnp.zeros((8, 2)), 0
    )
    return net, params


def test_forward_shapes_and_anchoring(tiny_net):
    net, params = tiny_net
    frames = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64, 3))
    queries = jnp.asarray([[10.0, 20.0], [40.0, 12.0]] + [[32.0, 32.0]] * 6)
    tracks, vis = net.apply(params, frames, queries, 1)
    assert tracks.shape == (3, 8, 2)
    assert vis.shape == (3, 8)
    assert np.isfinite(np.asarray(tracks)).all()
    assert (np.asarray(vis) >= 0).all() and (np.asarray(vis) <= 1).all()
    # the query frame is anchored exactly at the query coordinates
    np.testing.assert_allclose(np.asarray(tracks[1]), np.asarray(queries),
                               atol=1e-4)


def test_protocol_wrapper(tiny_net):
    from s2d_tpu.keymask.cotracker import CoTrackerTracker

    net, params = tiny_net
    tracker = CoTrackerTracker(params=params, net=net, interp_h=64,
                               interp_w=64, point_bucket=8)
    video = np.random.RandomState(0).randint(0, 255, (3, 48, 96, 3), np.uint8)
    queries = np.asarray([[12.0, 10.0], [80.0, 40.0], [50.0, 24.0]])
    tracks, vis = tracker.track(video, queries, query_frame=0)
    assert tracks.shape == (3, 3, 2)
    assert vis.shape == (3, 3)
    # anchored at the query frame in ORIGINAL pixel coords
    np.testing.assert_allclose(tracks[0], queries, atol=0.5)


def test_pyramid_cache_amortizes_encode(tiny_net):
    """The encoded pyramid is computed once per video: repeat calls on the
    same video reuse the cached device pyramid (identity) and match a
    fresh tracker bit-for-bit; a different video misses the cache."""
    from s2d_tpu.keymask.cotracker import CoTrackerTracker

    net, params = tiny_net
    kw = dict(params=params, net=net, interp_h=64, interp_w=64,
              point_bucket=8)
    tracker = CoTrackerTracker(**kw)
    rng = np.random.RandomState(1)
    video = rng.randint(0, 255, (3, 48, 96, 3), np.uint8)
    queries = np.asarray([[12.0, 10.0], [80.0, 40.0]])

    t1, v1 = tracker.track(video, queries, query_frame=0)
    cached = tracker._pyramid_cache._value
    t2, v2 = tracker.track(video, queries, query_frame=2)
    assert tracker._pyramid_cache._value is cached  # hit, not re-encoded
    # warm-cache results == fresh-tracker results (no stale-cache skew)
    t3, v3 = CoTrackerTracker(**kw).track(video, queries, query_frame=2)
    np.testing.assert_array_equal(t2, t3)
    np.testing.assert_array_equal(v2, v3)
    # a different video misses
    tracker.track(rng.randint(0, 255, (3, 48, 96, 3), np.uint8), queries, 0)
    assert tracker._pyramid_cache._value is not cached


def test_converter_roundtrip(tiny_net):
    from s2d_tpu.keymask.cotracker import (
        convert_cotracker_state_dict,
        to_torch_state_dict,
    )

    net, params = tiny_net
    sd = to_torch_state_dict(params)
    assert any(k.startswith("fnet.") for k in sd)
    assert any(k.startswith("updateformer.") for k in sd)
    restored = convert_cotracker_state_dict(sd, params)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_converter_upstream_shaped_keys_roundtrip(tiny_net, tmp_path):
    """VERDICT r4 #7: the table is aimed at the PUBLIC co-tracker naming.
    The emitted state_dict spells keys the upstream way (fused attn qkv,
    time_blocks.{i}, layerN.0, input_transform/flow_head/time_emb, real
    torch tensor layouts), and a torch.save'd checkpoint with a "model."
    prefix — the `scaled_offline.pth` wrapping — loads back bijectively
    through the production load path."""
    import torch

    from s2d_tpu.keymask.cotracker import (
        load_cotracker_checkpoint,
        to_torch_state_dict,
    )

    net, params = tiny_net
    sd = to_torch_state_dict(params)
    # upstream spellings present, internal spellings absent
    assert "updateformer.time_blocks.0.attn.qkv.weight" in sd
    assert "updateformer.space_virtual_blocks.0.mlp.fc1.weight" in sd
    assert "updateformer.input_transform.weight" in sd
    assert "updateformer.flow_head.weight" in sd
    assert "fnet.layer1.0.conv1.weight" in sd
    assert "fnet.conv2.weight" in sd  # internal "fuse"
    assert "time_emb" in sd
    assert not any(".mlp1." in k or ".time0." in k or "input_proj" in k
                   for k in sd)
    # real torch layouts: fused qkv is (3D, D), conv1 is OIHW
    dim = net.dim
    assert sd["updateformer.time_blocks.0.attn.qkv.weight"].shape == (3 * dim, dim)
    assert sd["fnet.conv1.weight"].shape == (64, 3, 7, 7)

    path = tmp_path / "scaled_offline.pth"
    torch.save({"model." + k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, str(path))
    restored = load_cotracker_checkpoint(str(path), net, params)
    flat_a = _flatten_with_paths(params)
    flat_b = _flatten_with_paths(restored)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), rtol=1e-6,
            err_msg=str(k),
        )
    # and the imported params produce identical tracks
    frames = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64, 3))
    queries = jnp.asarray([[10.0, 20.0], [40.0, 12.0]] + [[32.0, 32.0]] * 6)
    t_a, v_a = net.apply(params, frames, queries, 1)
    t_b, v_b = net.apply(restored, frames, queries, 1)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-5)


def _flatten_with_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_with_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_converter_reports_mismatch(tiny_net):
    from s2d_tpu.keymask.cotracker import (
        convert_cotracker_state_dict,
        to_torch_state_dict,
    )

    net, params = tiny_net
    sd = to_torch_state_dict(params)
    sd.pop(sorted(sd)[0])
    sd["bogus.extra"] = np.zeros((1,))
    with pytest.raises(ValueError, match="key mismatch"):
        convert_cotracker_state_dict(sd, params)
