"""Root conftest: force tests onto a virtual 8-device CPU mesh.

Must run before jax initializes its backends, hence env mutation at import
time of the root conftest (pytest imports this before any test module).
The real-TPU benchmark path never imports this file.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the box presets JAX_PLATFORMS=axon
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: this box has one CPU core, so XLA compiles
# dominate test wall-time; the cache makes re-runs cheap. CPU-SPECIFIC dir:
# XLA:CPU caches AOT machine code that is not keyed on the host's CPU
# feature set, and this fleet migrates between hosts with different avx512
# subsets — entries from the other host intermittently SIGSEGV on load
# (the cpu_aot_loader warning). The TPU cache (serialized, host-independent)
# keeps /tmp/jax_cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# This jax build ignores config env vars (JAX_PLATFORMS and the compilation
# cache family); jax.config.update is authoritative. Must run before any
# backend initialization. force_cpu() keys the cache dir on this host's own
# CPU-flag fingerprint so a migrated host never loads foreign machine code.
import jax  # noqa: E402

from s2d_tpu.utils import jax_setup  # noqa: E402

jax_setup.force_cpu()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
