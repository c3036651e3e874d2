"""Runtime setup helpers.

This environment's jax build ignores configuration ENV VARS (JAX_PLATFORMS,
JAX_COMPILATION_CACHE_DIR, ...); only `jax.config.update` takes effect, and
only before backend initialization. Call `enable_compilation_cache()` first
thing in every entry point — remote-TPU (axon) compiles are minutes-long and
server-side, so persistent caching across processes matters enormously.
"""
from __future__ import annotations

import jax


def enable_compilation_cache(path: str = "/tmp/jax_cache") -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # backends already initialized; cache flags are best-effort


def _host_cpu_fingerprint() -> str:
    """Digest of the host's CPU feature flags, to key the XLA:CPU cache."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


def maybe_init_distributed() -> bool:
    """Multi-HOST bring-up: call ``jax.distributed.initialize`` so every
    process sees the GLOBAL device set and `jax.process_count()/index()`
    reflect the pod, not just this host (the reference's multi-machine
    launch, `/root/reference/model_training/mask2former_video/engine/
    defaults.py:123-147` + `train_net_video.py:437-444`, is torch
    `init_process_group`; on TPU the coordination service replaces it).

    Must run BEFORE the first backend touch (any jax.devices()/jit call).
    Gating (off by default — single-host jobs must not block on a
    coordinator):

      * ``S2D_MULTIHOST=1`` alone: TPU-pod auto-detection (the TPU
        metadata env carries coordinator/worker-id; jax fills all args).
      * ``S2D_COORDINATOR=host:port`` + ``S2D_NUM_PROCESSES`` +
        ``S2D_PROCESS_ID``: explicit bring-up, e.g. CPU/GPU clusters or
        the 2-process localhost smoke (tests/test_multihost.py — gloo
        backs cross-process CPU collectives in this jax build).

    Launch procedure (one process per host, same command on each):
      S2D_MULTIHOST=1 python tools/train_net_video.py --config ...   # pod
      S2D_MULTIHOST=1 S2D_COORDINATOR=host0:8476 S2D_NUM_PROCESSES=4 \\
        S2D_PROCESS_ID=$RANK python tools/train_net_video.py ...     # other

    Returns True iff initialize() was called.
    """
    import os

    if os.environ.get("S2D_MULTIHOST", "0") != "1":
        return False
    kwargs = {}
    coord = os.environ.get("S2D_COORDINATOR")
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["S2D_NUM_PROCESSES"]),
            process_id=int(os.environ["S2D_PROCESS_ID"]),
        )
        ids = os.environ.get("S2D_LOCAL_DEVICE_IDS")
        if ids:
            kwargs["local_device_ids"] = [int(x) for x in ids.split(",")]
    jax.distributed.initialize(**kwargs)
    return True


def setup_runtime(cache_path: str = "/tmp/jax_cache") -> None:
    """Entry-point runtime setup for every CLI.

    Honors ``S2D_PLATFORM=cpu`` (read by OUR code, so it works even though
    this jax build ignores JAX_PLATFORMS): local verification drives the
    CLIs on XLA:CPU without touching the remote TPU tunnel. Any other
    value (or unset) keeps the default backend + shared TPU cache.
    """
    import os

    on_cpu = os.environ.get("S2D_PLATFORM", "").lower() == "cpu"
    if on_cpu:
        force_cpu()  # platform choice must precede distributed init
    maybe_init_distributed()

    if on_cpu:
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    else:
        enable_compilation_cache(cache_path)


def force_cpu() -> None:
    try:
        jax.config.update("jax_platforms", "cpu")
        # CPU runs use their OWN cache dir: XLA:CPU persists AOT-compiled
        # machine code keyed without the host's CPU feature set, and this
        # fleet migrates between hosts with different avx512 subsets —
        # loading an entry compiled on the other host intermittently
        # SIGSEGVs/SIGILLs (the cpu_aot_loader warning says exactly this).
        # Keying the dir by the host's own flag set makes a migrated host
        # start a fresh cache instead of loading foreign machine code.
        # The TPU cache (serialized HLO, host-independent) stays shared.
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/jax_cache_cpu_{_host_cpu_fingerprint()}",
        )
    except Exception:
        pass


def multihost_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Cross-process barrier over the COORDINATION SERVICE (no-op
    single-process).

    Why not `multihost_utils.sync_global_devices`: that executes a psum,
    and on the CPU/gloo smoke backend the FIRST collective creates the
    gloo context with a hard-coded 30 s key-exchange timeout — two
    processes that reach it more than 30 s apart (one-core hosts, skewed
    jit compiles, shards finishing eval at different times) kill the job
    with "Gloo context initialization failed". The coordination-service
    barrier takes an explicit (generous) timeout and moves no tensor
    data, so processes align HERE and then enter the first real
    collective within milliseconds of each other. On TPU pods
    (ICI collectives) it is simply a clean barrier."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
