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
