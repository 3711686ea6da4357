"""Multi-host initialization (SURVEY.md §2c: DCN across hosts, ICI within).

The reference's TF1 gRPC parameter-server machinery goes unused; the
TPU-native story is ``jax.distributed.initialize`` (DCN coordination),
after which ``jax.devices()`` spans all hosts and the same pjit programs
run SPMD.  Each host feeds its own shard of the input (grain sharding via
``host_shard_options``).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

log = logging.getLogger("tumblr_emotions_tpu")


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    With no arguments, relies on the TPU environment's auto-detection; on a
    single host this is skipped entirely.  Returns True iff distributed mode
    is active (process_count > 1).
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        elif jax.process_count() == 1:
            # Auto-init only helps under a real multi-host TPU runtime.
            pass
    except RuntimeError as e:  # already initialized
        log.debug("jax.distributed: %s", e)
    active = jax.process_count() > 1
    if active:
        log.info("distributed: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return active


def host_shard_options() -> Tuple[int, int]:
    """(shard_index, shard_count) for this host's input pipeline slice."""
    return jax.process_index(), jax.process_count()
