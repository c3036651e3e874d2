"""Native C++ RLE ops: build, parity vs numpy codec, batched track IoU."""
import numpy as np
import pytest

from s2d_tpu import native
from s2d_tpu.data import rle


@pytest.fixture(scope="module")
def cdll():
    lib = native.lib()
    if lib is None:
        pytest.skip("native lib unavailable (g++ build failed)")
    return lib


def test_native_encode_matches_numpy(cdll):
    rng = np.random.RandomState(0)
    for shape in [(17, 23), (64, 64), (1, 5)]:
        mask = rng.rand(*shape) > 0.5
        nat = native.encode_counts(mask)
        # numpy reference path (bypassing the native hook)
        flat = mask.reshape(-1, order="F")
        boundaries = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        runs = np.diff(np.concatenate(([0], boundaries, [flat.size])))
        if flat[0]:
            runs = np.concatenate(([0], runs))
        np.testing.assert_array_equal(nat, runs)


def test_native_decode_roundtrip(cdll):
    rng = np.random.RandomState(1)
    mask = rng.rand(33, 41) > 0.4
    counts = native.encode_counts(mask)
    out = native.decode_counts(counts, 33, 41)
    np.testing.assert_array_equal(out, mask)


def test_native_through_rle_module(cdll):
    rng = np.random.RandomState(2)
    mask = rng.rand(50, 70) > 0.6
    enc = rle.encode(mask)
    np.testing.assert_array_equal(rle.decode(enc), mask)
    assert rle.area(enc) == int(mask.sum())


def test_track_iou_matrix(cdll):
    rng = np.random.RandomState(3)
    h, w, t = 32, 32, 3

    def make_track(p):
        return [native.encode_counts(rng.rand(h, w) < p) for _ in range(t)]

    d_tracks = [make_track(0.3), make_track(0.5)]
    g_tracks = [make_track(0.3), [None, *make_track(0.4)[:2]]]
    mat = native.track_iou_matrix(d_tracks, g_tracks, t)
    assert mat.shape == (2, 2)

    # reference via decoded masks
    def decode_track(track):
        return [
            native.decode_counts(c, h, w) if c is not None else np.zeros((h, w), bool)
            for c in track
        ]

    for di in range(2):
        for gi in range(2):
            dm = decode_track(d_tracks[di])
            gm = decode_track(g_tracks[gi])
            inter = sum(np.logical_and(a, b).sum() for a, b in zip(dm, gm))
            union = sum(np.logical_or(a, b).sum() for a, b in zip(dm, gm))
            expect = inter / union if union else 0.0
            assert mat[di, gi] == pytest.approx(expect, rel=1e-12)


def test_string_to_counts_rejects_unbounded_varint():
    """A corrupt counts string whose continuation bits never end within
    the 13 five-bit groups an int64 can hold must be REJECTED by the
    native decoder (shifting by >=64 is UB in C++), falling back to the
    Python big-int parser instead of returning garbage as success."""
    from s2d_tpu import native
    from s2d_tpu.data import rle

    # 20 chars, every one with the 0x20 continuation bit set, then a
    # terminator: 21 five-bit groups >> int64
    bad = bytes([48 + 0x3F] * 20 + [48 + 0x0F])
    if native.lib() is not None:
        assert native.string_to_counts(bad) is None, (
            "native decoder accepted an over-long varint"
        )
    # the public API still parses it (arbitrary-precision Python ints)
    counts = rle.string_to_counts(bad)
    assert isinstance(counts, list) and len(counts) == 1
