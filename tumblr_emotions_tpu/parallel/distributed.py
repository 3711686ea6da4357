"""Multi-host initialization (SURVEY.md §2c: DCN across hosts, ICI within).

The reference's TF1 gRPC parameter-server machinery goes unused; the
TPU-native story is ``jax.distributed.initialize`` (DCN coordination),
after which ``jax.devices()`` spans all hosts and the same pjit programs
run SPMD.  Each host feeds its own shard of the input (grain sharding via
``host_shard_options``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

log = logging.getLogger("tumblr_emotions_tpu")

# Environment markers that indicate a multi-host run where
# ``jax.distributed.initialize()`` can auto-detect its coordination config
# (Cloud TPU pod slice metadata, an explicit coordinator, or a cluster
# scheduler).  Single-host runs have none of these, and calling
# initialize() there would hang waiting for peers.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",        # explicit jax.distributed coordinator
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice runtime
    "TPU_WORKER_HOSTNAMES",           # Cloud TPU pod slice (GCE metadata env)
    "CLOUD_TPU_CLUSTER_CONFIG",       # this framework's own launcher
)


def detect_cluster_env() -> Optional[str]:
    """Name of the first cluster-environment marker present, else None.

    ``TPU_WORKER_HOSTNAMES`` only counts when it lists more than one host —
    a single-host v5e-8 VM also sets it.
    """
    for var in _CLUSTER_ENV_VARS:
        val = os.environ.get(var)
        if not val:
            continue
        if var == "TPU_WORKER_HOSTNAMES" and len(val.split(",")) <= 1:
            continue
        return var
    return None


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    With explicit arguments, initializes against that coordinator.  With no
    arguments, initializes iff a cluster environment is detected
    (:func:`detect_cluster_env`) so that single-host runs — including unit
    tests and the CPU mesh — never block on a nonexistent coordinator.
    Returns True iff distributed mode is active (process_count > 1).
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            marker = detect_cluster_env()
            if marker is not None:
                log.info("distributed: auto-initializing (detected %s)",
                         marker)
                # No-arg initialize auto-detects coordinator/process count
                # from the TPU/cluster environment.
                jax.distributed.initialize()
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
