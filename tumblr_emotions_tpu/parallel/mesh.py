"""Device mesh + sharding helpers for pjit data parallelism.

SURVEY.md §2c: the reference is single-machine TF1 whose only latent
parallelism is slim's in-graph replication; the rebuild's contract is
first-class DP over an ICI mesh (BASELINE config 5).  Everything here is
plain ``jax.sharding``: pick a mesh, annotate shardings, let XLA insert the
gradient all-reduce over ICI.  A "model" axis is declared so tensor
parallelism could be added without API churn, but stays size 1 for this
24M-param model.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
(DCN between hosts, ICI within) — ``jax.devices()`` then spans all hosts and
per-host data loading uses ``process_index`` sharding in the input pipeline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tumblr_emotions_tpu.config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = cfg.data if cfg.data > 0 else n // cfg.model
    if data * cfg.model != n:
        raise ValueError(
            f"mesh {data}x{cfg.model} != {n} devices; set MeshConfig.data")
    arr = np.asarray(devices).reshape(data, cfg.model)
    return Mesh(arr, axis_names=cfg.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ("batch") sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0.

    Uses ``jax.device_put`` with a NamedSharding — the host->device copy is
    async, which is what the double-buffered pipeline relies on.

    Multi-host meshes (``jax.process_count() > 1``): each process holds
    only ITS slice of the global batch (per-host input sharding,
    ``distributed.host_shard_options``), so the global array is assembled
    from process-local data — the leading axis of the result is
    ``process_count *`` the local batch.  Leaves that are already global
    jax.Arrays (a re-shard of a prefetched batch) pass through.
    """
    if mesh.devices.size == 1:
        # Uncommitted placement: committing arrays to an explicit device (or
        # a 1-device NamedSharding) trips a ~200x slow path in this
        # environment's remote-TPU runtime (measured 22 s vs 0.12 s/step).
        return jax.tree_util.tree_map(jax.device_put, batch)
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def place(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.tree_util.tree_map(place, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
