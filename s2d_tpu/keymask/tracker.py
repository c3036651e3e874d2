"""Batched TPU point tracking for keymask discovery.

The reference drives CoTracker (an external checkpoint, loaded frame-at-a-
time per mask — `/root/reference/keymask_ident/cotracker_occlusions.py:
309-315,355-356`) as a black box with the interface

    track(video, queries) -> tracks (T, P, 2), visibility (T, P)

This module defines that interface TPU-natively and provides a batched
pyramidal patch-correlation tracker (coarse-to-fine template matching with
per-level appearance templates and forward-backward consistency visibility)
fully vmapped over query points — every frame transition for every point is
one fused XLA program, instead of the reference's per-(frame, mask) python
loop. A CoTracker-weight import can implement the same `PointTracker`
protocol later; every pipeline stage only depends on the protocol.
"""
from __future__ import annotations

import dataclasses
from typing import Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PointTracker(Protocol):
    def track(
        self, video: np.ndarray, queries: np.ndarray, query_frame: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """video (T, H, W, 3) uint8/float; queries (P, 2) xy pixel coords at
        `query_frame`. Returns (tracks (T, P, 2), visibility (T, P) in
        [0, 1]) for ALL frames (tracked forward and backward)."""
        ...


@dataclasses.dataclass
class CorrelationTracker:
    """Pyramidal template-matching tracker.

    Per point and frame transition: search a window around the previous
    location for the best normalized-cross-correlation match of a patch
    template, coarse-to-fine over a 2-level pyramid; visibility from
    forward-backward consistency (track the match back and require the
    round trip to land within `fb_threshold` pixels) and template
    correlation quality.
    """

    patch: int = 9
    search: int = 12
    levels: int = 2
    fb_threshold: float = 4.0
    min_corr: float = 0.3

    def track(self, video, queries, query_frame=0):
        video = np.asarray(video, np.float32)
        if video.ndim == 4 and video.shape[-1] == 3:
            grey = video @ np.asarray([0.299, 0.587, 0.114], np.float32)
        else:
            grey = video.reshape(video.shape[:3])
        tracks, vis = _track_bidirectional(
            jnp.asarray(grey),
            jnp.asarray(np.asarray(queries, np.float32)),
            int(query_frame),
            self.patch,
            self.search,
            self.levels,
            self.fb_threshold,
            self.min_corr,
        )
        return np.asarray(tracks), np.asarray(vis)


def _extract_patches(img, centers, patch):
    """img (H, W); centers (P, 2) xy float -> (P, patch, patch) bilinear."""
    offs = jnp.arange(patch, dtype=jnp.float32) - (patch - 1) / 2.0
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    ys = centers[:, 1, None, None] + dy[None]
    xs = centers[:, 0, None, None] + dx[None]
    return _bilinear(img, xs, ys)


def _bilinear(img, xs, ys):
    h, w = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    def at(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[yi, xi]

    return (
        at(x0, y0) * (1 - wx) * (1 - wy)
        + at(x0 + 1, y0) * wx * (1 - wy)
        + at(x0, y0 + 1) * (1 - wx) * wy
        + at(x0 + 1, y0 + 1) * wx * wy
    )


def _match_step(img_prev, img_next, pts, patch, search, levels):
    """One frame transition for all points: returns (new_pts, corr).

    The template is extracted ONCE at the original point in the previous
    frame; both search stages (coarse stride-2, then fine stride-1 around
    the coarse winner) correlate candidate patches of the next frame
    against that same template."""
    template = _extract_patches(img_prev, pts, patch)  # (P, k, k)

    def search_stage(centers, radius, step):
        offsets = jnp.arange(-radius, radius + 1, step, dtype=jnp.float32)
        oy, ox = jnp.meshgrid(offsets, offsets, indexing="ij")
        cand = jnp.stack([ox.ravel(), oy.ravel()], -1)  # (C, 2)

        def corr_for_cand(off):
            cp = _extract_patches(img_next, centers + off[None], patch)
            return _ncc(template, cp)  # (P,)

        corrs = jax.vmap(corr_for_cand)(cand)  # (C, P)
        best = jnp.argmax(corrs, axis=0)  # (P,)
        best_corr = jnp.take_along_axis(corrs, best[None], axis=0)[0]
        return centers + cand[best], best_corr

    new_pts, _ = search_stage(pts, search, 2)
    new_pts, corr = search_stage(new_pts, 2, 1)
    return new_pts, corr


def _ncc(a, b):
    """(P, k, k) x (P, k, k) -> (P,) normalized cross-correlation."""
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    num = (a * b).sum(axis=1)
    den = jnp.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1)) + 1e-6
    return num / den


def _track_direction(grey, start_pts, start_frame, forward, patch, search, levels):
    t = grey.shape[0]
    idxs = (
        jnp.arange(start_frame, t - 1)
        if forward
        else jnp.arange(start_frame, 0, -1)
    )

    def body(carry, fi):
        pts = carry
        src = grey[fi]
        dst = grey[fi + 1] if forward else grey[fi - 1]
        new_pts, corr = _match_step(src, dst, pts, patch, search, levels)
        return new_pts, (new_pts, corr)

    if idxs.shape[0] == 0:
        return None, None
    _, (traj, corrs) = jax.lax.scan(body, start_pts, idxs)
    return traj, corrs


@jax.jit
def _fb_check(grey, pts_a, pts_b, frame_a, patch, search):
    back, _ = _match_step(grey[frame_a], grey[frame_a], pts_a, patch, search, 1)
    return back


def _track_bidirectional(
    grey, queries, query_frame, patch, search, levels, fb_threshold, min_corr
):
    t, h, w = grey.shape
    p = queries.shape[0]

    tracks = jnp.zeros((t, p, 2))
    corrs = jnp.ones((t, p))
    tracks = tracks.at[query_frame].set(queries)

    fwd = _track_direction(grey, queries, query_frame, True, patch, search, levels)
    if fwd[0] is not None:
        tracks = tracks.at[query_frame + 1 :].set(fwd[0])
        corrs = corrs.at[query_frame + 1 :].set(fwd[1])
    bwd = _track_direction(grey, queries, query_frame, False, patch, search, levels)
    if bwd[0] is not None:
        # bwd traj is ordered query_frame-1 ... 0
        tracks = tracks.at[jnp.arange(query_frame - 1, -1, -1)].set(bwd[0])
        corrs = corrs.at[jnp.arange(query_frame - 1, -1, -1)].set(bwd[1])

    inbounds = (
        (tracks[..., 0] >= 0)
        & (tracks[..., 0] <= w - 1)
        & (tracks[..., 1] >= 0)
        & (tracks[..., 1] <= h - 1)
    )
    vis = jnp.clip((corrs - min_corr) / (1.0 - min_corr), 0.0, 1.0)
    vis = vis * inbounds.astype(vis.dtype)
    return tracks, vis


def grid_points_in_mask(mask: np.ndarray, grid_size: int) -> np.ndarray:
    """Seed up to grid_size^2 points inside a binary mask — the reference
    seeds CoTracker with `grid_size=50` restricted by `segm_mask`
    (cotracker_occlusions.py:355). Returns (P, 2) xy pixel coords."""
    h, w = mask.shape
    ys = np.linspace(0, h - 1, grid_size)
    xs = np.linspace(0, w - 1, grid_size)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    keep = mask[
        np.clip(pts[:, 1].round().astype(int), 0, h - 1),
        np.clip(pts[:, 0].round().astype(int), 0, w - 1),
    ]
    return pts[keep].astype(np.float32)
