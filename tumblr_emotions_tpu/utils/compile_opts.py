"""Per-compile TPU compiler options (round-3 sweep, docs/PERFORMANCE.md).

The XLA_FLAGS environment cannot carry TPU flags in every runtime (some
reject client env flags outright), but ``jax.jit(fn, compiler_options=...)``
forwards proto-backed xla_* flags through the compile path itself.  The
measured winners for this framework's conv-heavy programs:

- ``xla_tpu_scoped_vmem_limit_kib=65536``: the 16M default starves the
  big stem conv fusions (+~3% on the int8 serving engine, v5e).
- ``xla_tpu_scavenge_vmem_for_fusions=true``: small additional win.

``tpu_jit`` applies them with a plain-jit fallback, because non-TPU
backends (the CPU test mesh) reject TPU flags at compile time — the
fallback is decided lazily on the first call, where compilation happens.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax

DEFAULT_TPU_COMPILER_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
    "xla_tpu_scavenge_vmem_for_fusions": "true",
}


def tpu_jit(fn: Callable, *, compiler_options: Optional[Dict[str, str]] = None,
            **jit_kwargs: Any) -> Callable:
    """``jax.jit`` with the tuned TPU compiler options and a safe fallback.

    Returns a wrapper that compiles with the options on first call and
    silently falls back to an unflagged jit if the backend rejects them
    (CPU, or a runtime whose compile helper refuses the flags).
    """
    opts = (DEFAULT_TPU_COMPILER_OPTIONS if compiler_options is None
            else compiler_options)
    flagged = jax.jit(fn, compiler_options=dict(opts), **jit_kwargs)
    plain = jax.jit(fn, **jit_kwargs)
    state = {"use": None}

    def call(*args, **kwargs):
        if state["use"] is None:
            try:
                out = flagged(*args, **kwargs)
                state["use"] = flagged
                return out
            except Exception:  # noqa: BLE001 — backend rejected the flags
                state["use"] = plain
        return state["use"](*args, **kwargs)

    def _cache_size():
        active = state["use"] if state["use"] is not None else flagged
        return active._cache_size()

    call._flagged = flagged  # introspection/tests
    call._plain = plain
    call._cache_size = _cache_size
    return call
