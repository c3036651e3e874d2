"""Data layer: YTVIS json loading, clip mapper, collation (synthetic fixture)."""
import json
import os

import numpy as np
import pytest

from s2d_tpu.data import (
    ClipMapper,
    MapperConfig,
    collate_clips,
    load_ytvis_json,
    rle,
)
from s2d_tpu.data.augment import ClipAugConfig
from s2d_tpu.data.mapper import dense_frame_selection, sparse_frame_selection


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ytvis")
    img_root = root / "frames"
    img_root.mkdir()
    videos, annotations = [], []
    ann_id = 1
    for vid in range(1, 3):
        h, w, t = 48, 64, 4
        file_names = []
        for fi in range(t):
            name = f"v{vid}/{fi:05d}.jpg"
            (img_root / f"v{vid}").mkdir(exist_ok=True)
            img = np.full((h, w, 3), 30 * vid + 10 * fi, np.uint8)
            cv2.imwrite(str(img_root / name), img)
            file_names.append(name)
        videos.append(
            {"id": vid, "file_names": file_names, "height": h, "width": w, "length": t}
        )
        # one instance visible in all frames, one visible in frames 1..2
        for inst, frames in [(0, range(t)), (1, range(1, 3))]:
            segs = []
            for fi in range(t):
                if fi in frames:
                    mask = np.zeros((h, w), bool)
                    mask[8 + inst * 16 : 16 + inst * 16, 8 : 24 + fi] = True
                    segs.append(rle.encode(mask))
                else:
                    segs.append(None)
            annotations.append(
                {
                    "id": ann_id,
                    "video_id": vid,
                    "category_id": 1,
                    "segmentations": segs,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    data = {
        "videos": videos,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg"}],
    }
    json_path = root / "train.json"
    json_path.write_text(json.dumps(data))
    return str(json_path), str(img_root)


def test_load_ytvis_json(fake_dataset):
    json_path, img_root = fake_dataset
    dicts, metadata = load_ytvis_json(json_path, img_root, class_agnostic=True)
    assert len(dicts) == 2
    assert metadata["thing_classes"] == ["fg"]
    rec = dicts[0]
    assert rec["length"] == 4
    assert len(rec["annotations"]) == 2
    assert os.path.exists(rec["file_names"][0])


def test_dense_frame_selection():
    rng = np.random.RandomState(0)
    anno_frames = {1: [0, 1, 2, 5, 6], 2: [3]}
    sel = dense_frame_selection(rng, anno_frames, 8, 3, 20)
    assert sel == [0, 1, 2]  # only consecutive window of length 3
    # no dense window -> sparse fallback, sorted, right length
    sel2 = dense_frame_selection(rng, {1: [0, 2, 4]}, 8, 3, 20)
    assert len(sel2) == 3 and sel2 == sorted(sel2)


def test_sparse_selection_short_video():
    rng = np.random.RandomState(0)
    sel = sparse_frame_selection(rng, 2, 3, 20)
    assert len(sel) == 3


def test_mapper_train(fake_dataset):
    json_path, img_root = fake_dataset
    dicts, _ = load_ytvis_json(json_path, img_root, class_agnostic=True)
    cfg = MapperConfig(
        sampling_frame_num=2,
        max_instances=5,
        aug=ClipAugConfig(min_sizes=(32,), max_size=96),
    )
    mapper = ClipMapper(cfg, is_train=True, seed=0)
    sample = mapper(dicts[0])
    t = sample["image"].shape[0]
    assert t == 2
    assert sample["masks"].shape[:2] == (5, 2)
    assert sample["masks"].shape[2:] == sample["image"].shape[1:3]
    assert sample["valid"].sum() >= 1
    # mask content survives the resize
    assert sample["masks"][0].sum() > 0


def test_mapper_eval_all_frames(fake_dataset):
    json_path, img_root = fake_dataset
    dicts, _ = load_ytvis_json(json_path, img_root, class_agnostic=True)
    cfg = MapperConfig(aug=ClipAugConfig(min_sizes=(32,), max_size=96))
    mapper = ClipMapper(cfg, is_train=False)
    sample = mapper(dicts[0])
    assert sample["image"].shape[0] == 4  # all frames
    assert sample["selected_idx"] == [0, 1, 2, 3]


def test_collate(fake_dataset):
    json_path, img_root = fake_dataset
    dicts, _ = load_ytvis_json(json_path, img_root, class_agnostic=True)
    cfg = MapperConfig(
        sampling_frame_num=2, max_instances=5,
        aug=ClipAugConfig(min_sizes=(32,), max_size=96),
    )
    mapper = ClipMapper(cfg, is_train=True, seed=1)
    samples = [mapper(d) for d in dicts]
    batch = collate_clips(samples, (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
    b, t, h, w, c = batch["images"].shape
    assert (b, t, c) == (2, 2, 3)
    assert h % 32 == 0 and w % 32 == 0
    assert batch["masks"].shape == (2, 5, 2, h, w)
    assert batch["valid"].shape == (2, 5)


def test_prefetch_propagates_worker_errors():
    """A mapper crash must surface, not silently truncate the stream."""
    from s2d_tpu.data.loader import _prefetch

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = _prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_finalize_thread_error_no_deadlock():
    """A FinalizeThread whose callback raises must propagate the error to
    the producer instead of deadlocking it: the worker keeps draining the
    bounded queue after failing, and put()/close() re-raise."""
    import time

    from s2d_tpu.data.loader import FinalizeThread

    boom = RuntimeError("finalize failed")

    def fn(i):
        raise boom

    fin = FinalizeThread(fn, depth=1)
    with pytest.raises(RuntimeError, match="finalize failed"):
        # more puts than the queue holds: without draining, this blocks
        deadline = time.monotonic() + 30
        i = 0
        while time.monotonic() < deadline:
            fin.put(i)
            i += 1
        raise AssertionError("producer never saw the worker error")

    # close() after the error also re-raises (and returns promptly)
    with pytest.raises(RuntimeError, match="finalize failed"):
        fin.close()


def test_finalize_thread_flushes_all_items():
    from s2d_tpu.data.loader import FinalizeThread

    seen = []
    fin = FinalizeThread(lambda a, b: seen.append((a, b)), depth=2)
    for i in range(10):
        fin.put(i, i * 2)
    fin.close()
    assert seen == [(i, i * 2) for i in range(10)]
