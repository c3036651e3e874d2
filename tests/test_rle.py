"""RLE codec: round-trip, golden values, area/bbox."""
import numpy as np
import pytest

from s2d_tpu.data import rle


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape", [(7, 5), (32, 17), (1, 1), (64, 64)])
def test_roundtrip(seed, shape):
    rng = np.random.RandomState(seed)
    mask = rng.rand(*shape) > 0.5
    enc = rle.encode(mask)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)


def test_roundtrip_extremes():
    for mask in [np.zeros((4, 6), bool), np.ones((4, 6), bool)]:
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)


def test_counts_column_major():
    # column-major: mask[:, 0] runs first
    mask = np.array([[1, 0], [1, 0]], dtype=bool)
    counts = rle.mask_to_counts(mask)
    # column 0 = [1,1], column 1 = [0,0] -> runs: 0 zeros, 2 ones, 2 zeros
    np.testing.assert_array_equal(counts, [0, 2, 2])


def test_string_codec_golden():
    """Golden value from the COCO spec: counts [0, 5, 2] encode via the
    signed base-32 varint with difference coding from index 2 on."""
    counts = [0, 5, 2]
    s = rle.counts_to_string(counts)
    assert rle.string_to_counts(s) == counts
    # difference coding: third element stored as 2 - 0 = 2
    counts2 = [3, 1, 4, 1, 5, 9, 2, 6]
    assert rle.string_to_counts(rle.counts_to_string(counts2)) == counts2
    # large counts exercise multi-char varints
    counts3 = [100000, 1, 999999]
    assert rle.string_to_counts(rle.counts_to_string(counts3)) == counts3


def test_string_codec_native_matches_python(monkeypatch):
    """The C codec (native/rle_ops.cpp) and the pure-Python fallback in
    data/rle.py must be byte-identical both directions, including negative
    difference codes and multi-char varints."""
    from s2d_tpu import native

    rng = np.random.RandomState(7)
    cases = [list(rng.randint(0, hi, size=n))
             for hi, n in [(5, 1), (50, 17), (10**6, 64), (2, 33)]]
    cases.append([0, 999999, 1, 1000000, 2])  # big alternating diffs
    for counts in cases:
        s_nat = rle.counts_to_string(counts)
        assert native.counts_to_string(np.asarray(counts)) == s_nat
        monkeypatch.setattr(native, "counts_to_string", lambda c: None)
        monkeypatch.setattr(native, "string_to_counts", lambda s: None)
        s_py = rle.counts_to_string(counts)
        assert s_py == s_nat
        assert rle.string_to_counts(s_nat) == counts  # python parser
        monkeypatch.undo()
        assert rle.string_to_counts(s_py) == counts  # native parser


def test_area_and_bbox():
    mask = np.zeros((10, 12), bool)
    mask[2:5, 3:9] = True
    enc = rle.encode(mask)
    assert rle.area(enc) == 3 * 6
    assert rle.to_bbox(enc) == [3.0, 2.0, 6.0, 3.0]


def test_polygons_to_mask():
    # a filled axis-aligned square
    poly = [[2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0]]
    mask = rle.polygons_to_mask(poly, 12, 12)
    assert mask[5, 5]
    assert not mask[0, 0]
    assert 36 <= mask.sum() <= 49


def test_encode_window_matches_paste_encode():
    """encode_window == paste-into-zero-canvas + encode, bit-for-bit, on
    random windows including borders, full-canvas, all-zero and all-one
    crops (the crop-transport results.json hot path)."""
    from s2d_tpu.data import rle

    rng = np.random.default_rng(5)
    h, w = 37, 53
    cases = []
    for _ in range(30):
        ch = int(rng.integers(1, h + 1))
        cw = int(rng.integers(1, w + 1))
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        cases.append((rng.random((ch, cw)) > 0.5, y0, x0))
    cases.append((np.zeros((5, 4), bool), 0, 0))           # empty
    cases.append((np.ones((5, 4), bool), 0, 0))            # solid at origin
    cases.append((np.ones((h, w), bool), 0, 0))            # full canvas
    cases.append((np.ones((3, 2), bool), h - 3, w - 2))    # bottom-right
    cases.append((np.ones((h, 1), bool), 0, w - 1))        # last column
    for crop, y0, x0 in cases:
        canvas = np.zeros((h, w), bool)
        canvas[y0: y0 + crop.shape[0], x0: x0 + crop.shape[1]] = crop
        want = rle.encode(canvas)
        got = rle.encode_window(crop, y0, x0, h, w)
        assert got == want, (crop.shape, y0, x0)
    # and the no-native fallback path agrees too
    import s2d_tpu.native as native

    orig = native.encode_window_counts
    native.encode_window_counts = lambda *a: None
    try:
        crop, y0, x0 = cases[0]
        canvas = np.zeros((h, w), bool)
        canvas[y0: y0 + crop.shape[0], x0: x0 + crop.shape[1]] = crop
        assert rle.encode_window(crop, y0, x0, h, w) == rle.encode(canvas)
    finally:
        native.encode_window_counts = orig
