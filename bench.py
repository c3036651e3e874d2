"""Benchmark: video frames/sec/chip for the flagship R50 video Mask2Former
inference path (eval protocol shapes: MIN_SIZE_TEST=360 -> 360x640 input,
720x1280 output, 50 predictions, mask-IoU NMS 0.75).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is an estimated A100 throughput for the reference PyTorch
whole-video forward at the same protocol (see ESTIMATED_A100_FPS below) so
the ratio is comparable across rounds. The north-star target is >=5x.

Robustness: the remote (axon) TPU backend can be unavailable or hang during
init. The parent process first probes backend init in a SUBPROCESS with a
bounded timeout (retrying), then runs the measurement in a subprocess too;
any failure path still prints one well-formed JSON line and exits 0 so the
driver always records a result instead of an rc=1.
"""
import json
import os
import subprocess
import sys
import time

# Reference protocol throughput on A100 (frames/sec): estimated from the
# reference's single-forward whole-clip demo path (R50 + 6-layer deformable
# encoder + 9-layer video decoder at 360x640, AMP fp16). No published number
# exists in the repo; this constant documents the assumed denominator.
# GROUNDING (round 2): the reference-architecture torch oracle measures
# 0.35-0.38 f/s on one CPU core at these shapes (tools/bench_torch_baseline.py),
# so 25 f/s assumes an ~66x A100-vs-core speedup — see PERFORMANCE.md
# "Baseline denominator grounding" for the sensitivity analysis.
ESTIMATED_A100_FPS = 25.0

# The MFU field (measured forward FLOP/s over the v5e bf16 peak) says how
# much chip headroom remains (VERDICT r3 weak #6); the peak constant lives
# in s2d_tpu.utils.profiling.V5E_PEAK_BF16_FLOPS, shared with
# tools/bench_train_step.py.

T = 8  # frames per clip forward
IN_H, IN_W = 360, 640
OUT_H, OUT_W = 720, 1280

PROBE_TIMEOUT_S = int(os.environ.get("S2D_BENCH_PROBE_TIMEOUT", 300))
PROBE_ATTEMPTS = int(os.environ.get("S2D_BENCH_PROBE_ATTEMPTS", 3))
RUN_TIMEOUT_S = int(os.environ.get("S2D_BENCH_RUN_TIMEOUT", 3000))


def emit(value, vs_baseline, **extra):
    line = {
        "metric": "video_frames_per_sec_per_chip",
        "value": value,
        "unit": "frames/s",
        "vs_baseline": vs_baseline,
    }
    line.update(extra)
    print(json.dumps(line))
    sys.stdout.flush()


def probe_backend():
    """Probe jax backend init in a subprocess; returns (ok, detail).

    Honors S2D_PLATFORM=cpu (local smoke runs must not touch the TPU
    tunnel; this jax build ignores JAX_PLATFORMS)."""
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from s2d_tpu.utils.jax_setup import setup_runtime; setup_runtime(); "
        "import jax; d = jax.devices(); "
        "print('PROBE_OK', jax.default_backend(), len(d))"
        % os.path.dirname(os.path.abspath(__file__))
    )
    last = ""
    for attempt in range(PROBE_ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=PROBE_TIMEOUT_S,
            )
            for ln in r.stdout.splitlines():
                if ln.startswith("PROBE_OK"):
                    return True, ln.strip()
            last = (r.stderr or r.stdout or "").strip()[-300:]
        except subprocess.TimeoutExpired:
            last = f"backend init hang >{PROBE_TIMEOUT_S}s"
        except Exception as e:  # pragma: no cover - defensive
            last = f"{type(e).__name__}: {e}"
        if attempt + 1 < PROBE_ATTEMPTS:
            time.sleep(20)
    return False, last


def run_measurement():
    """Run the real bench (this file with --inner) in a subprocess."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True,
            text=True,
            timeout=RUN_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return None, f"measurement timed out after {RUN_TIMEOUT_S}s"
    for ln in reversed(r.stdout.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                return json.loads(ln), None
            except json.JSONDecodeError:
                pass
    tail = (r.stderr or r.stdout or "").strip()[-500:]
    return None, f"rc={r.returncode}: {tail}"


def inner():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from s2d_tpu.utils.jax_setup import setup_runtime

    setup_runtime()  # S2D_PLATFORM=cpu local smoke; default = TPU + cache

    from s2d_tpu.config import Config
    from s2d_tpu.models import build_model, preprocess_clip
    from s2d_tpu.evaluation.inference import postprocess_video

    cfg = Config()
    # pallas separable-MXU MSDA kernel on TPU; the XLA path remains the
    # CPU/parity reference. Flash cross-attention stays OFF here: at T=8 the
    # XLA decoder attention is ~9 ms/clip faster (flash exists for the
    # O(Q x K_tile) memory bound on long whole-video buckets, where the
    # eval CLI enables it).
    on_tpu = jax.default_backend() == "tpu"
    # S2D_MSDA_IMPL overrides for A/B runs (e.g. pallas_auto = the
    # swapped-orientation kernel)
    # pallas_auto (per-level axis orientation minimizing padded MXU FLOPs)
    # measured 121.2 f/s vs 93.7 for orient=y on v5e (2026-08-19).
    msda = os.environ.get("S2D_MSDA_IMPL") or ("pallas_auto" if on_tpu else None)
    model = build_model(
        cfg, msda_impl=msda
    )  # bf16 compute, fp32 pixel decoder
    rng = jax.random.PRNGKey(0)

    frames = jax.random.uniform(rng, (T, IN_H, IN_W, 3), jnp.float32) * 255.0
    images, (h, w) = preprocess_clip(
        frames, cfg.model.pixel_mean, cfg.model.pixel_std
    )
    variables = jax.jit(model.init)(rng, images[:, :1])

    tcfg = cfg.model.mask_former.test

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images)
        return out["pred_logits"][0], out["pred_masks"][0]

    def make_full(pack_bits):
        def full(variables, images):
            logits, masks = forward(variables, images)
            return postprocess_video(
                logits,
                masks,
                num_predictions=tcfg.num_predictions,
                num_classes=cfg.model.sem_seg_head.num_classes,
                image_size=(h, w),
                output_size=(OUT_H, OUT_W),
                use_nms=tcfg.use_nms,
                nms_thresh=tcfg.nms_thresh,
                pack_bits=pack_bits,
            )

        return full

    # warmup / compile; forced host read (the axon transport's
    # block_until_ready acknowledges enqueue only — a scalar device->host
    # read is the only reliable completion barrier). The packed-mask
    # readback is the production path; if its packbits lowering fails on
    # this backend, fall back to unpacked masks rather than losing the
    # round's number (tools/check_packbits_onchip.py reports the gate).
    full = make_full(True)
    pack_fallback = False
    try:
        out = full(variables, images)
        _ = float(out["scores"][0])
    except Exception:
        # measured on the non-production unpacked readback — tagged in the
        # emitted JSON so rounds stay comparable
        pack_fallback = True
        full = make_full(False)
        out = full(variables, images)
        _ = float(out["scores"][0])

    iters = 10 if on_tpu else 2  # CPU fallback: keep wall-clock bounded
    start = time.perf_counter()
    for _ in range(iters):
        out = full(variables, images)
    checksum = float(out["scores"][0])  # one forced read times ALL iters
    elapsed = time.perf_counter() - start
    assert checksum == checksum  # NaN guard on the forced read

    fps = (iters * T) / elapsed
    extra = {"backend": jax.default_backend()}
    if pack_fallback:
        extra["pack_fallback"] = True

    # MFU: XLA's own cost analysis of the compiled model forward (the same
    # executable the loop above ran) divided by the v5e bf16 peak. The
    # postprocess adds <1 GFLOP and is excluded; this is model-forward MFU.
    from s2d_tpu.utils.profiling import compiled_flops, mfu_vs_v5e

    flops_per_clip = compiled_flops(forward, variables, images)
    if flops_per_clip > 0:
        extra["gflop_per_frame"] = round(flops_per_clip / T / 1e9, 1)
        if on_tpu:
            extra["mfu_vs_v5e_peak"] = round(
                mfu_vs_v5e(flops_per_clip, iters, elapsed), 4
            )

    emit(round(fps, 2), round(fps / ESTIMATED_A100_FPS, 3), **extra)


def last_committed_round_value():
    """(round_tag, frames/s) from the newest BENCH_r*.json with a real
    (>0, tpu-backend) measurement, or (None, None). The regression gate
    compares against this so a silent throughput regression is flagged in
    the output instead of discovered by accident (VERDICT r3 weak #5)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = (None, None)
    best_n = -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            value = float(parsed.get("value", 0.0))
        except Exception:
            continue
        if value > 0 and parsed.get("backend") == "tpu" and int(m.group(1)) > best_n:
            best_n = int(m.group(1))
            best = (f"r{best_n:02d}", value)
    return best


REGRESSION_THRESHOLD = 0.05  # flag drops >5% vs the last committed round


def apply_regression_gate(result):
    """Annotate the result dict with the gate verdict; stderr gets a
    human-readable PASS/REGRESSED line (stdout stays one JSON line)."""
    prev_tag, prev_value = last_committed_round_value()
    if prev_value is None:
        return result
    value = float(result.get("value", 0.0))
    result["prev_round"] = prev_tag
    result["prev_value"] = prev_value
    if value < (1.0 - REGRESSION_THRESHOLD) * prev_value:
        result["gate"] = "REGRESSED"
        print(
            f"GATE REGRESSED: {value} frames/s < 95% of {prev_tag}'s "
            f"{prev_value} frames/s",
            file=sys.stderr,
        )
    else:
        result["gate"] = "PASS"
        print(
            f"GATE PASS: {value} frames/s vs {prev_tag}'s {prev_value} frames/s",
            file=sys.stderr,
        )
    return result


def main():
    ok, detail = probe_backend()
    if not ok:
        emit(0.0, 0.0, error=f"jax backend unavailable: {detail}")
        return
    result, err = run_measurement()
    if result is None:
        emit(0.0, 0.0, error=f"bench failed: {err}", probe=detail)
        return
    if result.get("backend") == "tpu":
        result = apply_regression_gate(result)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        main()
