"""Single source of truth for the production train-build knobs.

tools/train_net_video.py AND tools/bench_train_step.py --cli-defaults both
call these, so the benchmarked "default path" can never silently diverge
from what the CLI actually runs (the round-2 measurement burned a chip-run
on exactly that divergence).
"""
from __future__ import annotations


def production_msda_impl(cfg) -> str | None:
    """msda_impl for the training student/teacher builds.

    The pallas separable-MXU kernel (with its transposed-kernel custom
    VJP) runs under the same AMP gate the reference's fp16 autocast
    provides (reference engine/train_loop.py:681); the exact XLA path is
    kept for AMP-off runs and non-TPU backends.
    """
    import jax

    if jax.default_backend() == "tpu" and cfg.solver.amp.enabled:
        return "pallas_auto"
    return None
