"""Data-parallel serving: shard the fused inference engines over a mesh.

BASELINE config 4 runs the fused decode->preprocess->forward path "on
v5e-8": each chip serves its slice of the batch (pure data parallelism —
the 24M-param tower replicates; no collectives are needed in the forward,
so throughput scales linearly with chips over ICI).  This wraps any
engine whose ``__call__`` maps preprocessed images -> (logits, feature)
— ``ops.quant.QuantizedInceptionV3`` (int8 serving mode) or
``ops.inference.FusedInceptionV3`` (bf16) — into one pjit program with
the batch sharded on the mesh's "data" axis and the weights (embedded
constants) replicated by XLA.

The driver-facing multi-chip validation runs this on the virtual CPU mesh
(tests/test_serving.py); on hardware, pass ``create_mesh()`` over the real
chips and batches whose leading dimension divides the data axis.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tumblr_emotions_tpu.parallel import mesh as mesh_lib


def data_parallel_server(engine, mesh,
                         preprocess_dtype=jnp.bfloat16
                         ) -> Callable[[jax.Array], Tuple[jax.Array, jax.Array]]:
    """jitted [B, H, W, 3] uint8 -> (probs [B, C], feature [B, 2048]),
    batch-sharded over the mesh's data axis.

    B must be a multiple of the data-axis size.  Decoded uint8 batches can
    be produced per-host by the grain pipeline (host sharding) and placed
    with ``parallel.shard_batch``.
    """
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    def _checked(logits, feature):
        if logits is None:  # trace-time: engine built from a headless ckpt
            raise ValueError(
                "engine has no Logits head (checkpoint lacks "
                "Logits/Conv2d_1c_1x1); build the server from a classifier "
                "checkpoint, or call the engine directly for features")
        return (jax.nn.softmax(logits.astype(jnp.float32), axis=-1), feature)

    if mesh.devices.size == 1:
        # Single device: plain jit, uncommitted inputs (see
        # mesh.shard_batch for the remote-runtime placement gotcha).
        @jax.jit
        def fn1(raw_u8):
            x = preprocess_for_eval(raw_u8, dtype=preprocess_dtype)
            return _checked(*engine(x))

        return fn1

    data = mesh_lib.batch_sharding(mesh)

    @functools.partial(jax.jit, in_shardings=(data,),
                       out_shardings=(data, data))
    def fn(raw_u8):
        x = preprocess_for_eval(raw_u8, dtype=preprocess_dtype)
        return _checked(*engine(x))

    return fn
