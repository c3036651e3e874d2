"""ctypes bindings for the native RLE ops, with auto-build + fallback.

Exposes `lib()` (the loaded shared library or None) and high-level wrappers
used by data/rle.py and evaluation/ytvos_eval.py. If the .so is missing we
try one `g++` build; failing that, callers fall back to numpy paths.
"""
from __future__ import annotations

import contextlib
import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librle_ops.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build(target: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", target,
             os.path.join(_DIR, "rle_ops.cpp")],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        if not _build(_SO):
            return None
    else:
        src = os.path.join(_DIR, "rle_ops.cpp")
        with contextlib.suppress(OSError):
            # 1s slack: fresh git checkouts stamp source and binary at
            # near-identical times in arbitrary order; only a clearly-newer
            # source triggers a refresh
            if os.path.getmtime(src) > os.path.getmtime(_SO) + 1.0:
                # source edited after the committed binary was built: build
                # to a per-pid temp and atomically replace so a concurrent
                # process never dlopens a partially written .so; on build
                # failure fall through to the existing binary
                fresh = f"{_SO}.{os.getpid()}"
                if _build(fresh):
                    os.replace(fresh, _SO)
                else:
                    with contextlib.suppress(OSError):
                        os.remove(fresh)
    try:
        cdll = ctypes.CDLL(_SO)
        if not hasattr(cdll, "rle_encode_window"):
            # stale binary from an older source revision: rebuild and load
            # under a unique path (dlopen returns the cached handle for an
            # already-loaded pathname), then move it over the stale file so
            # the NEXT process loads the fresh build directly
            fresh = f"{_SO}.{os.getpid()}"
            if not _build(fresh):
                return None
            try:
                cdll = ctypes.CDLL(fresh)
                os.replace(fresh, _SO)
            except Exception:
                # don't leave the per-pid temp behind when the fresh build
                # fails to load (it would accrete as untracked git noise)
                with contextlib.suppress(OSError):
                    os.remove(fresh)
                raise
            if not hasattr(cdll, "rle_encode_window"):
                return None
        cdll.rle_encode.restype = ctypes.c_int64
        cdll.rle_encode.argtypes = [_u8p, ctypes.c_int64, _i64p, ctypes.c_int64]
        cdll.rle_decode.restype = None
        cdll.rle_decode.argtypes = [_i64p, ctypes.c_int64, _u8p, ctypes.c_int64]
        cdll.rle_area.restype = ctypes.c_int64
        cdll.rle_area.argtypes = [_i64p, ctypes.c_int64]
        cdll.rle_intersection.restype = ctypes.c_int64
        cdll.rle_intersection.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64]
        cdll.track_iou_matrix.restype = None
        cdll.track_iou_matrix.argtypes = [
            _i64p, _i64p, _i64p, _i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _f64p,
        ]
        cdll.rle_encode_window.restype = ctypes.c_int64
        cdll.rle_encode_window.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i64p,
            ctypes.c_int64,
        ]
        cdll.rle_counts_to_string.restype = ctypes.c_int64
        cdll.rle_counts_to_string.argtypes = [
            _i64p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        cdll.rle_string_to_counts.restype = ctypes.c_int64
        cdll.rle_string_to_counts.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, _i64p, ctypes.c_int64,
        ]
        _LIB = cdll
    except Exception:
        _LIB = None
    return _LIB


def encode_counts(mask: np.ndarray) -> Optional[np.ndarray]:
    """(H, W) mask -> run counts via the native encoder (None if no lib)."""
    cdll = lib()
    if cdll is None:
        return None
    flat = np.ascontiguousarray(
        np.asarray(mask, np.uint8).reshape(-1, order="F")
    )
    cap = flat.size + 2
    out = np.empty(cap, np.int64)
    k = cdll.rle_encode(flat, flat.size, out, cap)
    if k < 0:
        return None
    return out[:k].copy()


def encode_window_counts(
    crop: np.ndarray, y0: int, x0: int, h: int, w: int
) -> Optional[np.ndarray]:
    """Run counts of a zero (h, w) canvas with the row-major (ch, cw)
    `crop` pasted at (y0, x0) — without materializing the canvas (the
    crop-transport results.json hot path). None if no lib/bounds."""
    cdll = lib()
    if cdll is None:
        return None
    crop = np.ascontiguousarray(np.asarray(crop, np.uint8))
    ch, cw = crop.shape
    cap = ch * cw + 2 * cw + 4
    out = np.empty(cap, np.int64)
    k = cdll.rle_encode_window(
        crop, ch, cw, int(y0), int(x0), int(h), int(w), out, cap
    )
    if k < 0:
        return None
    return out[:k].copy()


def decode_counts(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    cdll = lib()
    if cdll is None:
        return None
    counts = np.ascontiguousarray(np.asarray(counts, np.int64))
    flat = np.empty(h * w, np.uint8)
    cdll.rle_decode(counts, counts.size, flat, flat.size)
    return flat.reshape(h, w, order="F").astype(bool)


def counts_to_string(counts: np.ndarray) -> Optional[str]:
    """Run counts -> COCO compressed-counts string (None if no lib)."""
    cdll = lib()
    if cdll is None or not hasattr(cdll, "rle_counts_to_string"):
        return None
    counts = np.ascontiguousarray(np.asarray(counts, np.int64))
    # worst case: 13 chars per count (int64 varint, 5 bits/char)
    cap = 13 * max(counts.size, 1) + 1
    buf = ctypes.create_string_buffer(cap)
    n = cdll.rle_counts_to_string(counts, counts.size, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def string_to_counts(s: Union[str, bytes]) -> Optional[np.ndarray]:
    """COCO compressed-counts string -> run counts (None if no lib or
    malformed/truncated input — callers fall back to the Python parser)."""
    cdll = lib()
    if cdll is None or not hasattr(cdll, "rle_string_to_counts"):
        return None
    raw = s.encode("ascii") if isinstance(s, str) else bytes(s)
    cap = len(raw) + 1  # every count takes >= 1 char
    out = np.empty(cap, np.int64)
    m = cdll.rle_string_to_counts(raw, len(raw), out, cap)
    if m < 0:
        return None
    return out[:m].copy()


def _pack_tracks(tracks: Sequence[Sequence[Optional[np.ndarray]]]):
    """tracks: per track, per frame run-count arrays (or None)."""
    counts: List[np.ndarray] = []
    offsets = [0]
    for track in tracks:
        for frame in track:
            if frame is not None and len(frame):
                counts.append(np.asarray(frame, np.int64))
                offsets.append(offsets[-1] + len(frame))
            else:
                offsets.append(offsets[-1])
    all_counts = (
        np.concatenate(counts) if counts else np.zeros(0, np.int64)
    )
    return np.ascontiguousarray(all_counts), np.asarray(offsets, np.int64)


def track_iou_matrix(
    d_tracks: Sequence[Sequence[Optional[np.ndarray]]],
    g_tracks: Sequence[Sequence[Optional[np.ndarray]]],
    t: int,
) -> Optional[np.ndarray]:
    """Pairwise spatio-temporal IoU of detection vs gt run-count tracks."""
    cdll = lib()
    if cdll is None:
        return None
    d_counts, d_offsets = _pack_tracks(d_tracks)
    g_counts, g_offsets = _pack_tracks(g_tracks)
    d_n, g_n = len(d_tracks), len(g_tracks)
    out = np.zeros(d_n * g_n, np.float64)
    if d_n and g_n:
        cdll.track_iou_matrix(
            d_counts, d_offsets, g_counts, g_offsets, d_n, g_n, t, out
        )
    return out.reshape(d_n, g_n)
