"""Per-compile TPU compiler options (round-3 sweep, docs/PERFORMANCE.md).

The XLA_FLAGS environment cannot carry TPU flags in every runtime (some
reject client env flags outright), but ``jax.jit(fn, compiler_options=...)``
forwards proto-backed xla_* flags through the compile path itself.  The
measured winners for this framework's conv-heavy programs:

- ``xla_tpu_scoped_vmem_limit_kib=65536``: the 16M default starves the
  big stem conv fusions (+~3% on the int8 serving engine, v5e).
- ``xla_tpu_scavenge_vmem_for_fusions=true``: small additional win.
- ``xla_tpu_allow_conv_input_fusion_with_downcast_convert=true``: lets
  the conv emitter fuse the requant downcast (f32/s32 -> int8) into the
  consuming conv's input pipeline instead of materializing the int8
  tensor separately — +5.5% on the int8 shift engine (9,583 -> 10,110
  img/s, bit-identical logits; round-3 sweep).

``tpu_jit`` applies them with a plain-jit fallback, because non-TPU
backends (the CPU test mesh) reject TPU flags at compile time — the
fallback is decided lazily on the first call, where compilation happens.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax

DEFAULT_TPU_COMPILER_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
    "xla_tpu_scavenge_vmem_for_fusions": "true",
    "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true",
}

# The ladder `autotune` walks by default: the empty dict (whatever the
# runtime's own flags are) plus scoped-vmem sizes around the measured
# winner, each with and without the two fusion flags.  Candidates a
# backend rejects (e.g. TPU flags on CPU) are skipped, so the ladder is
# safe to evaluate anywhere.
_FUSION_FLAGS = {
    "xla_tpu_scavenge_vmem_for_fusions": "true",
    "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true",
}
DEFAULT_AUTOTUNE_CANDIDATES: List[Dict[str, str]] = [{}] + [
    {"xla_tpu_scoped_vmem_limit_kib": str(kib), **fus}
    for kib in (32768, 49152, 65536, 81920)
    for fus in ({}, _FUSION_FLAGS)
]


# The train step wants a DIFFERENT flag set than serving: the full
# serving trio costs it ~4% (vmem scavenging hurts the backward+optimizer
# program), but 64M scoped vmem ALONE wins ~+4% (post-preprocess-fix
# interleaved sweep, B=256 joint fine-tune: plain 1,617 / vmem64 1,681 /
# vmem64+scavenge 1,600 / serving trio 1,601 img/s — docs/PERFORMANCE.md).
# Override via TET_TRAIN_COMPILER_OPTIONS.
DEFAULT_TRAIN_COMPILER_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}


def default_options() -> Dict[str, str]:
    """The compiler options ``tpu_jit`` applies when none are passed.

    ``TET_COMPILER_OPTIONS`` (a JSON object of flag->value strings, e.g.
    the winner printed by ``cli tune``) overrides the built-in defaults
    for every ``tpu_jit`` call site — serving, trainer, bench — without
    code changes.  An empty JSON object (``{}``) disables the flags.
    """
    return _options_from_env("TET_COMPILER_OPTIONS",
                             DEFAULT_TPU_COMPILER_OPTIONS)


def train_default_options() -> Dict[str, str]:
    """Compiler options for TRAIN-step compiles (64M scoped vmem, the
    measured +4%; see `DEFAULT_TRAIN_COMPILER_OPTIONS` — deliberately NOT
    the serving set).  Override: TET_TRAIN_COMPILER_OPTIONS."""
    return _options_from_env("TET_TRAIN_COMPILER_OPTIONS",
                             DEFAULT_TRAIN_COMPILER_OPTIONS)


def _options_from_env(var: str, default: Dict[str, str]) -> Dict[str, str]:
    env = os.environ.get(var)
    if env is None:
        return dict(default)
    try:
        opts = json.loads(env)
    except ValueError as e:
        raise ValueError(f"{var} is not valid JSON: {env!r}") from e
    if not isinstance(opts, dict):
        raise ValueError(f"{var} must be a JSON object, got: {env!r}")
    return {str(k): str(v) for k, v in opts.items()}


_PROBE_CACHE: Dict[frozenset, bool] = {}


def options_accepted(opts: Dict[str, str]) -> bool:
    """Whether this backend accepts ``opts`` — probed once per option set
    with a trivial compile (flag-name rejection is program-independent),
    cached for the process.  Keeping the probe separate from the real
    program means a flagged call that fails at RUN time (OOM, transient
    remote error) propagates loudly instead of being silently retried —
    retrying with donated args would poke deleted buffers, and silently
    dropping tuned flags hides a measured ~8% (docs/PERFORMANCE.md).
    """
    key = frozenset(opts.items())
    if key not in _PROBE_CACHE:
        try:
            jax.jit(lambda: jax.numpy.zeros(()),
                    compiler_options=dict(opts))()
            _PROBE_CACHE[key] = True
        except Exception:  # noqa: BLE001 — backend rejected the flags
            _PROBE_CACHE[key] = False
    return _PROBE_CACHE[key]


def _donation_consumed(donate_argnums, args) -> bool:
    """True iff any donated ``jax.Array`` leaf was deleted — i.e. the failed
    call got past compilation into execution (donation only consumes
    buffers when the executable actually runs)."""
    if not donate_argnums:
        return False
    nums = ((donate_argnums,) if isinstance(donate_argnums, int)
            else tuple(donate_argnums))
    for i in nums:
        if i >= len(args):
            continue
        for leaf in jax.tree_util.tree_leaves(args[i]):
            if getattr(leaf, "is_deleted", None) and leaf.is_deleted():
                return True
    return False


def tpu_jit(fn: Callable, *, compiler_options: Optional[Dict[str, str]] = None,
            **jit_kwargs: Any) -> Callable:
    """``jax.jit`` with the tuned TPU compiler options and a safe fallback.

    Returns a wrapper that, on first call, probes whether the backend
    accepts the options by NAME (see :func:`options_accepted`) and compiles
    with them if so; otherwise it uses an unflagged jit (CPU, or a runtime
    whose compile helper refuses the flags).

    The probe uses a trivial program, so a flag set can still be rejected
    for the REAL program at its first compile (program-dependent
    rejection).  That first flagged call is therefore guarded: if it fails
    before any donated buffer was consumed (compilation precedes
    execution, so donated args are still live — checked directly), the
    wrapper logs a warning and falls back to the plain jit instead of
    hard-failing.  A failure AFTER donation is a genuine run-time error on
    a consumed state and re-raises — retrying would poke deleted buffers.
    (For non-donating programs this means a transient first-call run-time
    error gets one plain-jit retry with a logged warning; later calls
    fail loudly as before.)
    """
    import logging

    opts = (default_options() if compiler_options is None
            else compiler_options)
    plain = jax.jit(fn, **jit_kwargs)
    flagged = (jax.jit(fn, compiler_options=dict(opts), **jit_kwargs)
               if opts else plain)
    state = {"use": None}

    def call(*args, **kwargs):
        if state["use"] is not None:
            return state["use"](*args, **kwargs)
        if not (opts and options_accepted(opts)):
            state["use"] = plain
            return plain(*args, **kwargs)
        try:
            out = flagged(*args, **kwargs)
            state["use"] = flagged
            return out
        except Exception as e:  # noqa: BLE001 — see docstring contract
            if _donation_consumed(jit_kwargs.get("donate_argnums"), args):
                raise
            logging.getLogger("tumblr_emotions_tpu").warning(
                "compiler options %s rejected for this program (%s: %s); "
                "falling back to an unflagged jit", dict(opts),
                type(e).__name__, e)
            state["use"] = plain
            return plain(*args, **kwargs)

    def _cache_size():
        active = state["use"] if state["use"] is not None else flagged
        return active._cache_size()

    call._flagged = flagged  # introspection/tests
    call._plain = plain
    call._cache_size = _cache_size
    return call


def _readback(out: Any) -> None:
    """Force execution to finish by fetching one element to the host.

    ``block_until_ready`` is not synchronous through every remote-TPU
    runtime (docs/PERFORMANCE.md measurement methodology); a host
    readback of a value that depends on the program's output is.
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.numpy.ravel(leaf)[0])


def autotune(fn: Callable, example_args: Sequence[Any], *,
             candidates: Optional[Sequence[Dict[str, str]]] = None,
             steps: int = 8, repeats: int = 3,
             cache_path: Optional[str] = None,
             key: Optional[str] = None,
             on_result: Optional[Callable[[Dict[str, str], float], None]]
             = None) -> Dict[str, str]:
    """Measure candidate compiler-option sets for ``fn`` and return the best.

    Walks ``candidates`` (default: `DEFAULT_AUTOTUNE_CANDIDATES`), compiling
    ``fn`` with each and timing ``steps`` calls over ``example_args``
    (median of ``repeats`` windows, each ended by a host readback so remote
    runtimes can't overlap past the timer).  Candidates the backend rejects
    at compile/first-run time are skipped.  Returns the winning options
    dict — pass it to :func:`tpu_jit` via ``compiler_options=``.

    With ``cache_path`` set, results are persisted to a JSON file keyed by
    ``key`` (default: the function's name + abstract arg signature), so
    production jobs pay the sweep once per program shape.  ``on_result``
    (if given) is called with each surviving candidate's options dict and
    its median wall-clock seconds for the ``steps``-call window.
    """
    cands = list(DEFAULT_AUTOTUNE_CANDIDATES if candidates is None
                 else candidates)
    if key is None:
        sig = ",".join(
            f"{getattr(a, 'dtype', type(a).__name__)}{list(getattr(a, 'shape', []))}"
            for a in example_args)
        key = f"{getattr(fn, '__name__', 'fn')}({sig})"
    # A custom candidate list must not be served a winner cached from a
    # DIFFERENT sweep under the same program key.
    if candidates is not None:
        import hashlib

        digest = hashlib.md5(
            json.dumps(cands, sort_keys=True).encode()).hexdigest()[:10]
        key = f"{key}#cands={digest}"

    cache: Dict[str, Dict[str, str]] = {}
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            cache = {}
        if key in cache:
            return dict(cache[key])

    best: Optional[Dict[str, str]] = None
    best_t = float("inf")
    for opts in cands:
        compiled = (jax.jit(fn, compiler_options=dict(opts)) if opts
                    else jax.jit(fn))
        try:
            _readback(compiled(*example_args))  # compile + warmup
        except Exception:  # noqa: BLE001 — backend rejected these flags
            continue
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(steps):
                out = compiled(*example_args)
            _readback(out)
            times.append(time.perf_counter() - t0)
        t = sorted(times)[len(times) // 2]
        if on_result is not None:
            on_result(dict(opts), t)
        if t < best_t:
            best, best_t = dict(opts), t
    if best is None:
        raise RuntimeError("autotune: every candidate failed to compile")

    if cache_path:
        cache[key] = best
        tmp = f"{cache_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, cache_path)
    return best
