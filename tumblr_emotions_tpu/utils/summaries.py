"""Metric writers + profiler hooks (SURVEY.md §5 tracing/observability).

The reference's observability is tf.summary scalars to TensorBoard plus
(unused) RunMetadata timelines.  TPU-native equivalents:

* scalar metrics through ``clu.metric_writers`` (TensorBoard-compatible
  event files + stdout logging), created lazily so clu stays optional;
* ``jax.profiler`` trace capture for a configurable step window — the
  traces open in TensorBoard/Perfetto and show the XLA op timeline, the
  real replacement for TF1 timelines.
"""

from __future__ import annotations

import logging
from typing import Dict

log = logging.getLogger("tumblr_emotions_tpu")


class SummaryWriter:
    """Thin wrapper: write_scalars(step, dict) -> TensorBoard + log."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._writer = None
        if logdir:
            try:
                from clu import metric_writers

                self._writer = metric_writers.create_default_writer(
                    logdir, just_logging=False)
            except Exception as e:  # clu or TB backend unavailable
                log.warning("metric writer unavailable (%s); logging only", e)

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        if self._writer is not None:
            self._writer.write_scalars(step, scalars)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, logdir: str, start_step: int = 0, num_steps: int = 3):
        self.logdir = logdir
        self.start_step = start_step
        self.num_steps = num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if (self.logdir and self.start_step > 0 and not self._active
                and step == self.start_step):
            import jax

            jax.profiler.start_trace(self.logdir)
            self._active = True
            log.info("profiler trace started at step %d -> %s", step,
                     self.logdir)

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.start_step + self.num_steps:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            log.info("profiler trace stopped at step %d", step)

    def stop_if_active(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
