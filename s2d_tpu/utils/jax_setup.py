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


def force_cpu() -> None:
    try:
        jax.config.update("jax_platforms", "cpu")
        # CPU runs use their OWN cache dir: XLA:CPU persists AOT-compiled
        # machine code keyed without the host's CPU feature set, and this
        # fleet migrates between hosts with different avx512 subsets —
        # loading an entry compiled on the other host intermittently
        # SIGSEGVs/SIGILLs (the cpu_aot_loader warning says exactly this).
        # The TPU cache (serialized HLO, host-independent) stays shared.
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    except Exception:
        pass
