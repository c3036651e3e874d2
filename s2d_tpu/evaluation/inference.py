"""Video instance inference post-processing (top-k, upsample, NMS).

Rebuild of the reference's eval path (`/root/reference/model_training/
mask2former_video/kd_video_maskformer_model.py:327-356,530-610`):

  1. bilinear-upsample stride-4 mask logits to the padded input size
  2. softmax class scores (drop no-object), flatten (Q, K) and take the
     `num_predictions` top (query, class) pairs, sorted
  3. crop the padding off (image_size), bilinear-resize to the original
     video resolution, binarize at logit 0
  4. greedy same-class mask-IoU NMS at threshold `nms_thresh`

Steps 1-3 are pure jit functions; NMS runs on-device via the fixed-shape
greedy pass in ops/nms.py. The final keep-mask is applied host-side.

Departure for HBM: the reference materializes all Q=100 upsampled masks;
we first gather the top-k queries and only upsample those (identical
results, 2x less peak memory), and the final full-resolution resize is
chunked over predictions.

Departure for transport: the binarized full-resolution masks are
bit-packed on device along H (MSB-first, numpy's `unpackbits(axis=-2)`
convention; see `pack_mask_bits` for why H and not W) before they leave
the chip. The host needs the
masks only to RLE-encode them (evaluator) or paint overlays (demo), and
a whole-video track at 50 predictions x T x 720 x 1280 is ~GBs as bools;
packing cuts the device->host readback (and the output HBM buffer) 8x.
On top of that, survivors ship as per-track BBOX CROPS from the packed
canvas (instance masks are mostly empty — typically another 4-15x fewer
bytes): the small bundle carries byte-row-aligned track boxes, the host
picks a bucketed crop window, `_crop_packed_jit` slices every survivor's
window on device, and the host pastes the crops back bit-exactly before
RLE. `finalize_predictions` unpacks transparently.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import greedy_mask_nms, mask_iou_matrix
from ..ops.resize import interpolate_bilinear


def postprocess_video(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    *,
    pack_bits: bool | None = None,
    **kwargs,
) -> Dict[str, jnp.ndarray]:
    """Un-jitted entry: resolves the S2D_PACK_MASKS escape hatch HERE, at
    every call, so flipping the env mid-process takes effect (a default
    resolved inside the traced body would be baked into the jit cache)."""
    if pack_bits is None:
        pack_bits = os.environ.get("S2D_PACK_MASKS", "1") != "0"
    out = dict(_postprocess_video_jit(
        pred_logits, pred_masks, pack_bits=pack_bits, **kwargs
    ))
    if pack_bits:
        # static at trace time — a plain int spares consumers a per-video
        # device round-trip (each D2H call costs ~0.7 s of fixed latency
        # on the TPU tunnel, see PERFORMANCE.md transport attribution)
        out["mask_height"] = int(kwargs["output_size"][0])
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_frames",
        "num_predictions",
        "num_classes",
        "image_size",
        "output_size",
        "use_nms",
        "nms_thresh",
        "compute_dtype",
        "pack_bits",
    ),
)
def _postprocess_video_jit(
    pred_logits: jnp.ndarray,  # (Q, K+1), or (1, Q, K+1)
    pred_masks: jnp.ndarray,  # (Q, T, H/4, W/4) mask logits, or batched
    *,
    num_frames: int | None = None,
    num_predictions: int,
    num_classes: int,
    image_size: Tuple[int, int],  # unpadded network input size
    output_size: Tuple[int, int],  # original video resolution
    use_nms: bool = True,
    nms_thresh: float = 0.75,
    compute_dtype: jnp.dtype | None = None,
    pack_bits: bool = True,
) -> Dict[str, jnp.ndarray]:
    """compute_dtype: dtype of the mask resize chain (the largest arrays of
    the whole eval step). None resolves to bf16 on TPU — the reference runs
    its eval forward INCLUDING this interpolation under fp16 autocast
    (`/root/reference/model_training/train_net_video.py:260`,
    `demo_video/demo.py:162`), so bf16 here is the same noise class — and
    f32 elsewhere (CPU tests stay exact)."""
    if compute_dtype is None:
        compute_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
    # accept the model's batched (1, ...) outputs and the T-bucket pad so
    # the batch-strip and un-pad slices trace here instead of costing two
    # eager dispatches per video on the TPU tunnel
    if pred_logits.ndim == 3:
        pred_logits = pred_logits[0]
    if pred_masks.ndim == 5:
        pred_masks = pred_masks[0]
    if num_frames is not None:
        pred_masks = pred_masks[:, :num_frames]
    q = pred_logits.shape[0]
    scores = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[:, :-1]
    flat_scores = scores.reshape(-1)  # (Q*K)
    # clamp: configs with Q*K < NUM_PREDICTIONS (tiny models) keep working
    num_predictions = min(num_predictions, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, num_predictions)
    labels = top_idx % num_classes
    query_idx = top_idx // num_classes

    sel = pred_masks[query_idx].astype(compute_dtype)  # (P, T, H/4, W/4)
    t = sel.shape[1]
    mh, mw = sel.shape[2], sel.shape[3]
    pad_h, pad_w = mh * 4, mw * 4
    if compute_dtype == jnp.bfloat16:
        # TPU fast path: the upsample-x4 -> crop -> full-res-resize chain
        # is bilinear-of-bilinear, i.e. LINEAR — compose the interpolation
        # matrices once (ops/resize.composed_interp_matrix) and apply ONE
        # (out_h, H/4) x (out_w, W/4) pair directly to the stride-4
        # logits. The (P, T, pad_h, pad_w) intermediate never exists
        # (~190 MB less traffic + ~500 GFLOP less dense matmul per clip).
        # Same AMP noise class as the sequential bf16 chain (the
        # reference evaluates this interpolation under fp16 autocast);
        # the f32/CPU path below keeps the reference's literal two-stage
        # order for bit-level protocol parity (test_demo_parity).
        from ..ops.resize import composed_interp_matrix

        mat_h = jnp.asarray(
            composed_interp_matrix(mh, pad_h, image_size[0], output_size[0]),
            dtype=compute_dtype,
        )
        mat_w = jnp.asarray(
            composed_interp_matrix(mw, pad_w, image_size[1], output_size[1]),
            dtype=compute_dtype,
        )
        def resize_chunk_bf16(chunk):  # (C, t, mh, mw)
            flat = chunk.reshape(-1, mh, mw)
            up_h = jnp.einsum(
                "oh,bhw->bow", mat_h, flat,
                precision=jax.lax.Precision.DEFAULT,
            )
            m = jnp.einsum(
                "ow,bhw->bho", mat_w, up_h,
                precision=jax.lax.Precision.DEFAULT,
            ) > 0.0
            return m.reshape(*chunk.shape[:2], *output_size)

        # one-shot when the bf16 intermediates stay modest (the short
        # protocol keeps its ~1.5% lax.map-free edge); chunked over
        # predictions like the f32 path otherwise — un-chunked, the
        # einsum pair materializes (P*T, out_h, mw) + (P*T, out_h, out_w)
        # bf16, ~6.6 GB at the whole-video P=50, T=64, 720x1280 shapes,
        # which OOMs v5e next to the bool output + IoU buffers
        bf16_bytes = 2 * num_predictions * t * output_size[0] * (
            output_size[1] + mw
        )
        if bf16_bytes <= int(1.5e9):
            masks = resize_chunk_bf16(sel)
        else:
            chunks = jnp.stack(
                jnp.split(sel, _chunks(num_predictions), axis=0)
            )
            masks = jax.lax.map(resize_chunk_bf16, chunks)
            masks = masks.reshape(num_predictions, t, *output_size)
    else:
        up = interpolate_bilinear(sel, (pad_h, pad_w), precision="default")
        up = up[:, :, : image_size[0], : image_size[1]]

        # chunked full-resolution resize + binarize (bounds peak memory)
        def resize_chunk(chunk):
            return interpolate_bilinear(
                chunk, output_size, precision="default"
            ) > 0.0

        chunks = jnp.stack(jnp.split(up, _chunks(num_predictions), axis=0))
        masks = jax.lax.map(resize_chunk, chunks)
        masks = masks.reshape(num_predictions, t, *output_size)

    if use_nms:
        iou = mask_iou_matrix(masks)
        keep = greedy_mask_nms(iou, labels, nms_thresh)
    else:
        keep = jnp.ones((num_predictions,), dtype=bool)

    # Per-track bounding boxes for the crop transport (VERDICT r4 #1):
    # instance masks are mostly empty at full canvas, so the host ships
    # survivors as byte-row-aligned bbox crops instead of full-canvas
    # bitmaps. Boxes are the union over frames (constant offset per track
    # keeps host reassembly a single paste per survivor), in PACKED byte-
    # row units for H: [y0_byte, x0, h_bytes, w].
    def _extent(a):  # (P, N) bool -> (first, last), empty -> (0, 1)
        n = a.shape[1]
        nonempty = a.any(axis=1)
        first = jnp.where(nonempty, jnp.argmax(a, axis=1), 0)
        last = jnp.where(nonempty, n - jnp.argmax(a[:, ::-1], axis=1), 1)
        return first, last

    pres = masks.any(axis=1)  # (P, H, W)
    y0, y1 = _extent(pres.any(axis=2))
    x0, x1 = _extent(pres.any(axis=1))
    y0b = y0 // 8
    boxes = jnp.stack(
        [y0b, x0, (y1 + 7) // 8 - y0b, x1 - x0], axis=-1
    ).astype(jnp.int32)
    # bit-pack along H for the 8x-smaller readback (see module docstring);
    # "mask_height" rides along so the host can crop the pad byte's bits.
    # S2D_PACK_MASKS=0 opts out (escape hatch for a backend where the
    # pack lowering misbehaves; tools/check_packbits_onchip.py gates it)
    if not pack_bits:
        return {
            "scores": top_scores, "labels": labels,
            "masks": masks, "keep": keep,
        }
    # Keep-compaction for transport: store the packed masks KEPT-FIRST
    # (stable sort, so within the kept group the score order survives) and
    # ship the permutation. The host reads `keep` (tiny), then slices the
    # device array to the ~n_keep surviving rows before the transfer —
    # on the TPU tunnel the full-P mask buffer is the dominant
    # device->host leg, and typically only 10-20 of 50 predictions
    # survive NMS. `keep` stays in ORIGINAL prediction order; consumers
    # that want original-order masks invert via `order`.
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    boxes = boxes[order]  # kept-first, matching the stored mask layout
    return {
        "scores": top_scores,
        "labels": labels,
        "masks": pack_mask_bits(masks)[order],
        "order": order.astype(jnp.int32),
        "keep": keep,
        "boxes": boxes,  # kept-first [y0_byte, x0, h_bytes, w]
        # every per-prediction scalar in ONE array: the host reads the
        # whole bundle in a single D2H call (which also serves as the
        # device-completion barrier) instead of multiple round-trips.
        # Layout: 8 groups of P floats — scores/labels/keep/order in
        # ORIGINAL prediction order, then the 4 box fields in KEPT-FIRST
        # order (mask layout) for the crop transport
        "small": jnp.concatenate([
            top_scores.astype(jnp.float32),
            labels.astype(jnp.float32),
            keep.astype(jnp.float32),
            order.astype(jnp.float32),
            boxes.T.reshape(-1).astype(jnp.float32),
        ]),
    }


def pack_mask_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack bool masks (..., H, W) along the H axis (MSB-first, the
    numpy `packbits(axis=-2)` convention) -> (..., ceil(H/8), W) uint8.

    H, not W: packing the minor (lane) axis lowers to a cross-lane
    shuffle on TPU (`jnp.packbits(axis=-1)` measured 6 ms for a protocol
    clip — ~60 GB/s effective); grouping 8 SUBLANE rows is a contiguous
    reshape + weighted sum, which XLA fuses into the producers. The bits
    are disjoint powers of two, so the uint8 sum is exact."""
    h = masks.shape[-2]
    pad = (-h) % 8
    if pad:
        cfgpad = [(0, 0)] * (masks.ndim - 2) + [(0, pad), (0, 0)]
        masks = jnp.pad(masks, cfgpad)
    view = masks.reshape(
        *masks.shape[:-2], (h + pad) // 8, 8, masks.shape[-1]
    )
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (view.astype(jnp.uint8) * weights[:, None]).sum(
        axis=-2, dtype=jnp.uint8
    )


def _chunks(n: int) -> int:
    for c in (10, 5, 2, 1):
        if n % c == 0:
            return n // c
    return n


def unpack_masks(device_out: Dict[str, jnp.ndarray]) -> np.ndarray:
    """Read back `postprocess_video` masks and unpack to bool (P,T,H,W).

    Accepts the H-packed layout (uint8 + "mask_height"), the legacy
    W-packed layout (uint8 + "mask_width"), and plain bool masks
    (hand-built dicts in tests / older callers)."""
    masks = np.asarray(device_out["masks"])
    if masks.dtype == np.uint8 and "mask_height" in device_out:
        height = int(device_out["mask_height"])
        # unpackbits yields 0/1 uint8 — view as bool (no second full-size
        # copy; whole-video tracks are GBs) and crop the pad byte's bits
        masks = np.unpackbits(masks, axis=-2).view(np.bool_)[
            ..., :height, :
        ]
    elif masks.dtype == np.uint8 and "mask_width" in device_out:
        width = int(device_out["mask_width"])
        masks = np.unpackbits(masks, axis=-1).view(np.bool_)[..., :width]
    if "order" in device_out and masks.shape[0] == np.asarray(
        device_out["order"]
    ).shape[0]:
        # kept-first storage layout -> original prediction order
        order = np.asarray(device_out["order"])
        restored = np.empty_like(masks)
        restored[order] = masks
        masks = restored
    return masks


@functools.partial(jax.jit, static_argnames=("ch8", "cw"))
def _crop_packed_jit(packed, boxes, ch8: int, cw: int):
    """Per-survivor bbox crops from the packed canvas: packed
    (n, T, H8, W) uint8, boxes (n, 4) int32 [y0_byte, x0, ...] -> crops
    (n, T, ch8, cw). Offsets are clamped so every crop window fits; the
    host mirrors the clamp when pasting (crop_offsets)."""
    h8, w = packed.shape[-2], packed.shape[-1]
    y0 = jnp.clip(boxes[:, 0], 0, h8 - ch8)
    x0 = jnp.clip(boxes[:, 1], 0, w - cw)

    def one(pm, y, x):
        return jax.lax.dynamic_slice(
            pm, (0, y, x), (pm.shape[0], ch8, cw)
        )

    return jax.vmap(one)(packed, y0, x0)


def crop_bucket(boxes: np.ndarray, h8: int, w: int):
    """Host-side crop-window bucket for the kept boxes: byte rows to a
    multiple of 8, width to a lane-friendly multiple of 128 (bounds the
    jit-cache to a handful of shapes per canvas)."""
    ch8 = max(min(int(-(-int(boxes[:, 2].max()) // 8) * 8), h8), min(8, h8))
    cw = max(min(int(-(-int(boxes[:, 3].max()) // 128) * 128), w), min(128, w))
    return ch8, cw


def crop_offsets(boxes: np.ndarray, h8: int, w: int, ch8: int, cw: int):
    """The exact clamped offsets _crop_packed_jit used (host mirror)."""
    y0 = np.clip(boxes[:, 0], 0, h8 - ch8)
    x0 = np.clip(boxes[:, 1], 0, w - cw)
    return y0, x0


def start_kept_masks_read(
    device_out: Dict[str, jnp.ndarray],
    keep: np.ndarray,
    boxes: np.ndarray | None = None,
):
    """First half of the survivors-only mask readback: slice the DEVICE
    array to the NMS survivors and fire the device->host copy
    asynchronously. Returns an opaque handle for finish_kept_masks_read.

    With the kept-first layout ("order" present) the slice means the
    device->host leg carries ~n_keep/P of the packed buffer. The slice
    length is rounded up to a multiple of 8 so the transfer program
    cache sees at most P/8 shapes. Splitting start/finish lets a
    pipelined caller overlap this transfer with other host reads (the
    evaluator runs them on two finalize threads).

    `boxes` (host, kept-first, from the small bundle) upgrades the leg to
    BBOX CROPS (VERDICT r4 #1): instance masks are mostly empty, so the
    device ships byte-row-aligned per-track crop windows instead of the
    full canvas — typically 4-15x fewer bytes — and the host pastes them
    back before RLE. Falls back to the full-row slice whenever cropping
    wouldn't cut at least ~30% of the bytes (no extra dispatch for
    frame-filling tracks)."""
    masks = device_out["masks"]
    if "order" in device_out and not isinstance(masks, np.ndarray):
        n = int(keep.sum())
        n_pad = min(keep.size, -(-n // 8) * 8)
        sliced = masks[:n_pad]
        if (
            boxes is not None
            and "boxes" in device_out
            and n > 0
            and os.environ.get("S2D_CROP_MASKS", "1") != "0"
        ):
            h8, w = masks.shape[-2], masks.shape[-1]
            ch8, cw = crop_bucket(np.asarray(boxes)[:n], h8, w)
            if ch8 * cw < 0.7 * h8 * w:
                crops = _crop_packed_jit(
                    sliced, device_out["boxes"][:n_pad], ch8=ch8, cw=cw
                )
                if hasattr(crops, "copy_to_host_async"):
                    crops.copy_to_host_async()
                y0, x0 = crop_offsets(np.asarray(boxes)[:n], h8, w, ch8, cw)
                return ("crops", crops, n, device_out, (y0, x0, w))
        if hasattr(sliced, "copy_to_host_async"):
            sliced.copy_to_host_async()
        return ("sliced", sliced, n, device_out)
    return ("full", masks, None, device_out)


class WindowMasks(NamedTuple):
    """Survivor masks as bbox crops + placements — the paste-free form
    consumers that only need RLEs (rle.encode_window) work from.
    `crops[i]` rows beyond `height - y0[i]` are padding (byte-row
    alignment) and must be trimmed before use."""

    crops: np.ndarray  # (n, T, ch, cw) bool
    y0: np.ndarray  # (n,) pixel row of each crop's top edge
    x0: np.ndarray  # (n,)
    height: int
    width: int

    @property
    def shape(self):  # len()/shape[0] compatibility with ndarray masks
        return (self.crops.shape[0], self.crops.shape[1],
                self.height, self.width)

    def paste(self) -> np.ndarray:
        """Materialize the full (n, T, H, W) bool canvas."""
        n_, t_, ch, cw = self.crops.shape
        out = np.zeros((n_, t_, self.height, self.width), np.bool_)
        for i in range(n_):
            yp = int(self.y0[i])
            h_i = min(ch, self.height - yp)
            out[i, :, yp: yp + h_i, self.x0[i]: self.x0[i] + cw] = (
                self.crops[i, :, :h_i]
            )
        return out


def finish_kept_masks_read(
    handle,
    keep: np.ndarray,
    timers: Dict[str, float] | None = None,
    as_window: bool = False,
) -> np.ndarray | WindowMasks:
    """Second half: block on the transfer and unpack to bool
    (n_keep, T, H, W) in original (score-sorted) prediction order.

    `as_window=True`: when the crop transport was used, return the
    paste-free `WindowMasks` instead of materializing full canvases —
    RLE-only consumers (the evaluator) then encode straight from the
    crops (rle.encode_window), skipping both the canvas paste and the
    encoder's O(H*W) scan.

    timers: optional dict accumulating "readback_masks" / "unpack" stage
    seconds (the evaluator's attribution table)."""
    import time

    kind, arr, n, device_out, *extra = handle
    t0 = time.perf_counter()
    if kind == "crops":
        crops = np.asarray(arr)[:n]  # (n, T, ch8, cw) uint8
        t1 = time.perf_counter()
        y0, x0, w = extra[0]
        height = int(device_out["mask_height"])
        bits = np.unpackbits(crops, axis=-2).view(np.bool_)
        win = WindowMasks(
            crops=bits, y0=np.asarray(y0) * 8, x0=np.asarray(x0),
            height=height, width=w,
        )
        out = win if as_window else win.paste()
    elif kind == "sliced":
        packed = np.asarray(arr)[:n]
        t1 = time.perf_counter()
        out = unpack_masks(
            {"masks": packed, "mask_height": device_out["mask_height"]}
        )
    else:
        packed = np.asarray(arr)
        t1 = time.perf_counter()
        out = unpack_masks({**device_out, "masks": packed})[keep]
    if timers is not None:
        timers["readback_masks"] += t1 - t0
        timers["unpack"] += time.perf_counter() - t1
    return out


def read_kept_masks(
    device_out: Dict[str, jnp.ndarray],
    keep: np.ndarray,
    timers: Dict[str, float] | None = None,
    boxes: np.ndarray | None = None,
) -> np.ndarray:
    """Transfer + unpack only the NMS survivors (one-shot convenience
    wrapper over the start/finish halves above)."""
    return finish_kept_masks_read(
        start_kept_masks_read(device_out, keep, boxes=boxes), keep,
        timers=timers,
    )


def read_small_bundle(
    device_out: Dict[str, jnp.ndarray]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """(scores f32, labels int, keep bool, boxes int32 or None) in ONE
    device round-trip when the packed "small" bundle is present, else
    separate reads. Boxes are KEPT-FIRST [y0_byte, x0, h_bytes, w] (the
    mask layout); everything else is in original prediction order."""
    if "small" in device_out:
        small = np.asarray(device_out["small"])
        if small.size % 8 == 0 and "boxes" in device_out:
            p = small.size // 8
            boxes = np.rint(small[4 * p:]).astype(np.int32).reshape(4, p).T
        else:  # legacy 4-group bundle
            p = small.size // 4
            boxes = None
        return (
            small[:p],
            small[p: 2 * p].astype(np.int64),
            small[2 * p: 3 * p] > 0.5,
            boxes,
        )
    return (
        np.asarray(device_out["scores"]),
        np.asarray(device_out["labels"]),
        np.asarray(device_out["keep"]),
        None,
    )


def finalize_predictions(device_out: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Apply the NMS keep-mask host-side and return numpy predictions."""
    scores, labels, keep, boxes = read_small_bundle(device_out)
    return {
        "scores": scores[keep],
        "labels": labels[keep],
        "masks": read_kept_masks(device_out, keep, boxes=boxes),
    }
