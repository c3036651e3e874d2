"""Keymask discovery pipeline tests on a synthetic moving-square video."""
import numpy as np
import pytest

from s2d_tpu.keymask import (
    CorrelationTracker,
    binarize_curves,
    extract_visibility_curves,
    grid_points_in_mask,
    group_quality,
    load_masks_from_color_png,
    match_candidate,
    match_matrix,
    merge_video_jsons,
    point_mask_iou,
    temporal_correspondence_clustering,
    visibility_windows,
    write_annotation_for_video,
    convert_results_to_annotations,
)
from s2d_tpu.data import rle


def _make_video(t=5, h=64, w=96, speed=3, size=24):
    """A textured square moving right over a textured background."""
    rng = np.random.RandomState(0)
    bg = rng.randint(0, 80, (h, w, 3), np.uint8)
    patch = rng.randint(120, 255, (size, size, 3), np.uint8)
    video = np.zeros((t, h, w, 3), np.uint8)
    masks = np.zeros((t, h, w), bool)
    y0 = (h - size) // 2
    for fi in range(t):
        frame = bg.copy()
        x0 = 6 + fi * speed
        frame[y0 : y0 + size, x0 : x0 + size] = patch
        video[fi] = frame
        masks[fi, y0 : y0 + size, x0 : x0 + size] = True
    return video, masks


def test_grid_points_in_mask():
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:16] = True
    pts = grid_points_in_mask(mask, 16)
    assert len(pts) > 4
    assert (pts[:, 0] >= 7.5).all() and (pts[:, 0] <= 16).all()


def test_tracker_follows_moving_square():
    video, masks = _make_video()
    tracker = CorrelationTracker()
    pts = grid_points_in_mask(masks[0], 24)
    tracks, vis = tracker.track(video, pts, query_frame=0)
    assert tracks.shape == (5, len(pts), 2)
    # points should move right by ~speed per frame (12 px over 4 frames)
    dx = tracks[-1, :, 0] - tracks[0, :, 0]
    assert np.median(dx) == pytest.approx(4 * 3, abs=3.0)
    assert vis.mean() > 0.4


def test_visibility_curves_and_windows():
    video, masks = _make_video()
    masks_per_frame = [{1: masks[fi]} for fi in range(len(video))]
    tracker = CorrelationTracker()
    records = extract_visibility_curves(video, masks_per_frame, tracker, grid_size=12)
    assert len(records) == 5  # one per (frame, mask)
    curves = np.asarray([r["visibility"] for r in records])
    assert curves.shape == (5, 5)
    assert curves.mean() > 0.4
    windows = visibility_windows(curves, threshold=0.3, min_samples=2, eps=0.45)
    assert windows, "expected at least one visibility window"
    assert windows[0]["range"][0] == 0


def test_point_mask_iou():
    mask = np.zeros((32, 32), bool)
    mask[10:20, 10:20] = True
    inside = np.stack(np.meshgrid(np.arange(11, 19), np.arange(11, 19)), -1).reshape(-1, 2).astype(np.float32)
    vis = np.ones(len(inside))
    assert point_mask_iou(inside, vis, mask) > 0.5
    outside = inside + 15
    assert point_mask_iou(outside, vis, mask) < 0.2


def test_matching_and_grouping():
    video, masks = _make_video()
    frame_masks = [{fi: masks[fi]} for fi in range(len(video))]  # overall id = frame
    tracker = CorrelationTracker()
    matches = [
        match_candidate(video, tracker, masks[0], 0, frame_masks, 0.3),
        match_candidate(video, tracker, masks[2], 2, frame_masks, 0.3),
    ]
    assert matches[0], "candidate should match some pseudo-masks"
    mat = match_matrix(matches, list(range(5)))
    # min_samples=1 override: 2 candidates < the reference's real-data
    # min_samples table (3-5), which would mark this tiny set all-noise
    labels = temporal_correspondence_clustering(mat, min_samples=1)
    groups = group_quality(mat, labels, frame_of_id=list(range(5)))
    assert groups
    assert groups[0]["coverage"] > 0.3
    assert groups[0]["one2x"] == 0


def test_clustering_reference_params():
    """Reference DBSCAN table (cotracker_matching.py:795-815): adaptive
    eps/min_samples by matrix width, zero rows forced to noise."""
    from s2d_tpu.keymask.matching import temporal_correspondence_clustering

    # width < 10 -> min_samples 3: two identical rows alone are noise...
    mat2 = np.zeros((2, 5), bool)
    mat2[:, 0] = True
    assert (temporal_correspondence_clustering(mat2) == -1).all()
    # ...three identical rows cluster
    mat3 = np.zeros((3, 5), bool)
    mat3[:, 0] = True
    labels = temporal_correspondence_clustering(mat3)
    assert (labels == labels[0]).all() and labels[0] != -1
    # all-zero rows are ALWAYS noise, even clustered together
    zeros = np.zeros((6, 5), bool)
    assert (temporal_correspondence_clustering(zeros) == -1).all()
    # explicit override reaches below the table
    assert (temporal_correspondence_clustering(mat2, min_samples=1) >= 0).all()


def test_color_png_to_masks():
    png = np.zeros((16, 16, 3), np.uint8)
    png[2:6, 2:6] = (255, 0, 0)
    png[8:12, 8:12] = (0, 255, 0)
    out = load_masks_from_color_png(png)
    assert len(out) == 2
    assert sum(m.sum() for m in out.values()) == 32


def test_annotation_writer_and_merge(tmp_path):
    import json

    _, masks = _make_video(t=3)
    groups = [{"group": 0, "one2x": 0, "coverage": 1.0}]
    data = write_annotation_for_video(
        video_id=7, file_names=["a.jpg", "b.jpg", "c.jpg"], height=48, width=64,
        groups=groups, group_masks=[[masks[0], masks[1], None]],
    )
    ann = data["annotations"][0]
    assert ann["segmentations"][2] is None
    assert ann["areas"][0] == int(masks[0].sum())
    decoded = rle.decode(ann["segmentations"][0])
    np.testing.assert_array_equal(decoded, masks[0])

    p1 = tmp_path / "v1.json"
    p1.write_text(json.dumps(data))
    noisy = write_annotation_for_video(
        video_id=8, file_names=["x.jpg"], height=48, width=64,
        groups=[{"group": 0, "one2x": 5, "coverage": 1.0}],
        group_masks=[[masks[0]]],
    )
    p2 = tmp_path / "v2.json"
    p2.write_text(json.dumps(noisy))

    merged = merge_video_jsons([str(p1), str(p2)], one2x_threshold=2)
    assert len(merged["videos"]) == 2
    assert len(merged["annotations"]) == 1  # noisy track filtered
    assert merged["annotations"][0]["video_id"] == 1  # renumbered


def test_convert_results_to_annotations():
    _, masks = _make_video(t=2)
    segs = [rle.encode(masks[0]), rle.encode(masks[1])]
    results = [
        {"video_id": 1, "score": 0.9, "category_id": 1, "segmentations": segs},
        {"video_id": 1, "score": 0.5, "category_id": 1, "segmentations": segs},
    ]
    gt_videos = [{"id": 1, "file_names": ["a", "b"], "height": 48, "width": 64}]
    out = convert_results_to_annotations(results, gt_videos, score_threshold=0.75)
    assert len(out["annotations"]) == 1  # low score filtered
    ann = out["annotations"][0]
    assert ann["areas"][0] == int(masks[0].sum())
    assert ann["bboxes"][0] is not None


def test_candidate_mask_export(tmp_path):
    from s2d_tpu.keymask.export import save_candidate_masks

    video, masks = _make_video(t=3)
    masks_per_frame = [{1: masks[fi]} for fi in range(3)]
    records = [
        {"frame": 0, "mask_id": 1, "visibility": [1, 1, 1]},
        {"frame": 1, "mask_id": 1, "visibility": [1, 1, 1]},
    ]
    windows = [{"cluster": 0, "range": (0, 2), "winners": [0, 1]}]
    written = save_candidate_masks(str(tmp_path), windows, records, masks_per_frame)
    assert len(written) == 2
    import cv2
    img = cv2.imread(written[0], cv2.IMREAD_GRAYSCALE)
    assert (img > 0).sum() == masks[0].sum()


def test_device_video_cache_keys_and_grey_parity():
    """track() caches the device grey video per source array; a new or
    edited video must miss the cache, and the uint8 device-grey path must
    match the float host path exactly (f32)."""
    from s2d_tpu.keymask.tracker import (
        DeviceVideoCache,
        _grey_video_to_device,
    )

    video, _ = _make_video(t=3)
    calls = []

    def convert(v):
        calls.append(1)
        return _grey_video_to_device(v)

    cache = DeviceVideoCache(convert)
    g1 = cache.get(video)
    g2 = cache.get(video)
    assert len(calls) == 1 and g1 is g2

    other, _ = _make_video(t=3, speed=5)
    cache.get(other)
    assert len(calls) == 2

    # in-place edit of a sampled pixel invalidates the entry
    video[0, 0, 0] ^= 255
    cache.get(video)
    assert len(calls) == 3

    # uint8 device path == float host path
    grey_dev = np.asarray(_grey_video_to_device(video))
    grey_host = np.asarray(
        video.astype(np.float32)
        @ np.asarray([0.299, 0.587, 0.114], np.float32)
    )
    np.testing.assert_allclose(grey_dev, grey_host, rtol=0, atol=1e-4)


def test_tracker_cache_reuse_same_results():
    """Second track() call on the same video (cache hit) returns identical
    results, and a different video does not leak the cached frames."""
    video, masks = _make_video()
    tr = CorrelationTracker(point_bucket=8)
    pts = grid_points_in_mask(masks[0], 6)
    t1, v1 = tr.track(video, pts, 0)
    t2, v2 = tr.track(video, pts, 0)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(v1, v2)

    static = np.repeat(video[:1], len(video), axis=0)
    t3, _ = tr.track(static, pts, 0)
    # on a static video tracks stay near the seed; on the moving one they move
    assert np.abs(t3[-1] - pts).max() < np.abs(t1[-1] - pts).max()


def test_track_batch_matches_per_call():
    """Batched multi-seed tracking is exactly the per-call results: points
    are independent, so concatenation + per-point seed frames changes
    nothing but the number of device calls."""
    video, masks = _make_video()
    tracker = CorrelationTracker(point_bucket=32, batch_points=64)
    seeds = [(0, grid_points_in_mask(masks[0], 8)),
             (2, grid_points_in_mask(masks[2], 10)),
             (4, grid_points_in_mask(masks[4], 6))]
    batched = tracker.track_batch(
        video, [p for _, p in seeds], [f for f, _ in seeds]
    )
    assert len(batched) == 3
    for (fi, pts), (bt, bv) in zip(seeds, batched):
        st, sv = tracker.track(video, pts, query_frame=fi)
        assert bt.shape == st.shape and bv.shape == sv.shape
        np.testing.assert_allclose(bt, st, atol=1e-5)
        np.testing.assert_allclose(bv, sv, atol=1e-5)


def test_match_candidates_batch_equals_loop():
    from s2d_tpu.keymask import match_candidates

    video, masks = _make_video()
    frame_masks = [{fi * 10 + 1: masks[fi]} for fi in range(len(video))]
    candidates = [(0, masks[0]), (3, masks[3])]
    batched = match_candidates(video, CorrelationTracker(), candidates,
                               frame_masks, matching_threshold=0.3)
    looped = [
        match_candidate(video, CorrelationTracker(), m, f, frame_masks,
                        matching_threshold=0.3)
        for f, m in candidates
    ]
    assert batched == looped
    assert any(batched[0].values())  # the moving square is matched


def test_visibility_curves_batched_path_equals_serial():
    """extract_visibility_curves uses track_batch when present; results
    must equal the per-call path."""
    video, masks = _make_video()
    masks_per_frame = [{1: masks[fi]} for fi in range(len(video))]
    tracker = CorrelationTracker()
    batched = extract_visibility_curves(video, masks_per_frame, tracker,
                                        grid_size=12)

    class NoBatch:
        def __init__(self, inner):
            self._inner = inner

        def track(self, *a, **k):
            return self._inner.track(*a, **k)

    serial = extract_visibility_curves(video, masks_per_frame,
                                       NoBatch(tracker), grid_size=12)
    assert len(batched) == len(serial) == 5
    for a, b in zip(batched, serial):
        assert a["frame"] == b["frame"] and a["mask_id"] == b["mask_id"]
        np.testing.assert_allclose(a["visibility"], b["visibility"],
                                   atol=1e-5)
