"""Test harness: force an 8-device CPU platform BEFORE jax initializes.

SURVEY.md §4 "distributed without a cluster": pjit/mesh code paths are
exercised on a virtual 8-device CPU mesh; the single real TPU chip is only
used by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# This environment's sitecustomize imports jax at interpreter startup (to
# register the axon TPU plugin), so the env vars above are read too late —
# override via jax.config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Persistent compilation cache: Inception-v3 takes minutes to compile on CPU;
# cache across pytest runs so only the first-ever run pays it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_pytest_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
