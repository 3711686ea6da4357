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

Two program shapes (VERDICT r2 next-step #6):

- ``data_parallel_server``: image tower only.  ``from_uint8=True`` serves
  the all-int8 front half (``QuantizedInceptionV3.forward_from_uint8``:
  central crop, int8-GEMM TF1 resize, input quantization fused — no float
  image tensor in HBM).
- ``joint_data_parallel_server``: ONE program carrying the image tower,
  the text branch, and the fusion head (``DeepSentimentModel.fuse``), so
  joint serving needs no second jit call.

The driver-facing multi-chip validation runs this on the virtual CPU mesh
(tests/test_serving.py); on hardware, pass ``create_mesh()`` over the real
chips and batches whose leading dimension divides the data axis.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tumblr_emotions_tpu.parallel import mesh as mesh_lib
from tumblr_emotions_tpu.utils.compile_opts import tpu_jit


def _forward(engine, raw_u8, from_uint8: bool, preprocess_dtype,
             image_size: int = 299, central_fraction: float = 0.875,
             resize_method: str = "tf1"):
    from tumblr_emotions_tpu.data.preprocessing import (
        preprocess_for_eval, preprocess_for_eval_s2d)

    if from_uint8:
        if not hasattr(engine, "forward_from_uint8"):
            raise ValueError(
                f"{type(engine).__name__} has no forward_from_uint8; "
                "from_uint8 serving needs the int8 engine "
                "(ops.quant.QuantizedInceptionV3)")
        if resize_method != "tf1":
            raise ValueError(
                "the int8-GEMM preprocess implements the TF1 resize only; "
                f"resize_method={resize_method!r} needs from_uint8=False")
        if getattr(engine, "stem_s2d", False) == "pre":
            raise ValueError(
                'from_uint8 serving feeds the normal [H,W,3] layout; an '
                'engine built with stem_s2d="pre" expects the '
                'space-to-depth layout (use from_uint8=False)')
        return engine.forward_from_uint8(
            raw_u8, height=image_size, width=image_size,
            central_fraction=central_fraction)
    if getattr(engine, "stem_s2d", False) == "pre":
        # The benchmarked headline config (bench.py, docs/PERFORMANCE.md
        # round 4): the resize einsums emit the 2x2 space-to-depth layout
        # at zero extra cost and conv1a runs as the K=12 stride-1 rewrite
        # (+0.9% whole-engine vs the normal layout, measured interleaved).
        x = preprocess_for_eval_s2d(raw_u8, image_size, image_size,
                                    central_fraction=central_fraction,
                                    resize_method=resize_method,
                                    dtype=preprocess_dtype)
        return engine(x)
    x = preprocess_for_eval(raw_u8, image_size, image_size,
                            central_fraction=central_fraction,
                            resize_method=resize_method,
                            dtype=preprocess_dtype)
    return engine(x)


def _checked(logits, feature):
    if logits is None:  # trace-time: engine built from a headless ckpt
        raise ValueError(
            "engine has no Logits head (checkpoint lacks "
            "Logits/Conv2d_1c_1x1); build the server from a classifier "
            "checkpoint, or call the engine directly for features")
    return (jax.nn.softmax(logits.astype(jnp.float32), axis=-1), feature)


def data_parallel_server(engine, mesh,
                         preprocess_dtype=jnp.bfloat16,
                         from_uint8: bool = False,
                         image_size: int = 299,
                         central_fraction: float = 0.875,
                         resize_method: str = "tf1"
                         ) -> Callable[[jax.Array], Tuple[jax.Array, jax.Array]]:
    """jitted [B, H, W, 3] uint8 -> (probs [B, C], feature [B, 2048]),
    batch-sharded over the mesh's data axis.

    B must be a multiple of the data-axis size.  Decoded uint8 batches can
    be produced per-host by the grain pipeline (host sharding) and placed
    with ``parallel.shard_batch``.  ``from_uint8=True`` uses the engine's
    all-int8 preprocess (uint8 in, no float image tensor in HBM; TF1
    resize only).  The preprocess knobs must match the model's eval
    config (``build_forward`` threads them from ``cfg``).
    """
    def body(raw_u8):
        return _checked(*_forward(engine, raw_u8, from_uint8,
                                  preprocess_dtype, image_size,
                                  central_fraction, resize_method))

    if mesh.devices.size == 1:
        # Single device: plain jit, uncommitted inputs (see
        # mesh.shard_batch for the remote-runtime placement gotcha).
        return tpu_jit(body)

    data = mesh_lib.batch_sharding(mesh)
    return tpu_jit(body, in_shardings=(data,), out_shardings=(data, data))


def build_forward(cfg, trainer, variables, mesh, engine: str = "int8",
                  calib_images=None, front: str = "s2d") -> Callable:
    """One constructor for every served program shape.

    Returns ``runner(image_u8, tokens, lengths) -> probs [B, C]`` over the
    model described by ``cfg`` (image / joint / text) and the chosen
    ``engine`` ("int8" quantized, "bf16" BN-folded, "parity" f32 Flax) —
    shared by ``cli infer``, ``cli serve`` and
    :class:`tumblr_emotions_tpu.server.BatchedPredictor`.  Unused inputs
    are passed as None.  ``calib_images`` (f32, preprocessed, [N,299,299,3])
    calibrates the int8 engine's activation scales.

    ``front`` picks the int8 engine's preprocess front (ignored for
    bf16/parity, which always run the float preprocess):

    - ``"s2d"`` (default): bf16 preprocess emitting the space-to-depth
      layout + the stem_s2d="pre" conv rewrite — the exact program
      ``bench.py`` benchmarks (10,162 img/s headline, docs/PERFORMANCE.md
      round 4; the uint8 front measured 0.5% slower, the normal-layout
      float front 0.9% slower).
    - ``"uint8"``: all-int8 front half (central crop, int8-GEMM TF1
      resize, fused input quantization — no float image tensor in HBM;
      TF1 resize only).  Lowest HBM footprint.
    - ``"float"``: normal-layout bf16 preprocess (round-3 default).
    """
    if front not in ("s2d", "uint8", "float"):
        raise ValueError(f"unknown front {front!r}; expected s2d|uint8|float")
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    if cfg.model == "text" or engine == "parity":
        size = cfg.image.image_size

        def body(image, tokens, lengths):
            batch = {}
            if image is not None:
                batch["image"] = preprocess_for_eval(
                    image, size, size,
                    central_fraction=cfg.data.eval_central_crop,
                    resize_method=cfg.data.resize_method,
                    dtype=jnp.float32)
            if tokens is not None:
                batch["tokens"] = tokens
                if lengths is None:
                    lengths = jnp.sum(
                        (tokens != cfg.text.pad_id).astype(jnp.int32), -1)
                batch["lengths"] = lengths
            _, ep = trainer.forward(variables, batch, train=False)
            return ep["Predictions"]

        return tpu_jit(body)

    tower_vars = variables if cfg.model == "image" else {
        "params": variables["params"]["InceptionV3"],
        "batch_stats": variables["batch_stats"]["InceptionV3"]}
    pp = dict(image_size=cfg.image.image_size,
              central_fraction=cfg.data.eval_central_crop,
              resize_method=cfg.data.resize_method)
    if engine == "int8":
        from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3

        if calib_images is None:
            raise ValueError("int8 serving needs calib_images (a "
                             "preprocessed f32 calibration batch)")
        # The all-int8 uint8 front implements the TF1 resize only; a
        # non-default resize_method falls back to the float preprocess
        # feeding the same int8 tower (numerics identical to eval).
        from_uint8 = (front == "uint8" and cfg.data.resize_method == "tf1")
        eng = QuantizedInceptionV3(
            tower_vars, calib_images, epilogue="shift",
            stem_s2d="pre" if front == "s2d" else False)
    elif engine == "bf16":
        from tumblr_emotions_tpu.ops.inference import FusedInceptionV3

        eng = FusedInceptionV3(tower_vars, dtype=jnp.bfloat16,
                               use_pallas=False)
        from_uint8 = False
    else:
        raise ValueError(f"unknown engine {engine!r}; "
                         "expected int8|bf16|parity")

    if cfg.model == "joint":
        server = joint_data_parallel_server(eng, trainer.model, variables,
                                            mesh, from_uint8=from_uint8,
                                            **pp)

        def runner(image, tokens, lengths):
            if lengths is None:
                lengths = jnp.sum(
                    (tokens != cfg.text.pad_id).astype(jnp.int32), -1)
            return server(image, tokens, lengths)

        return runner

    img_server = data_parallel_server(eng, mesh, from_uint8=from_uint8, **pp)
    return lambda image, tokens, lengths: img_server(image)[0]


def joint_data_parallel_server(engine, model, variables, mesh,
                               preprocess_dtype=jnp.bfloat16,
                               from_uint8: bool = False,
                               image_size: int = 299,
                               central_fraction: float = 0.875,
                               resize_method: str = "tf1"
                               ) -> Callable[..., jax.Array]:
    """One served program for the joint Deep Sentiment model:
    jitted (raw_u8 [B,H,W,3], tokens [B,T], lengths [B]) -> probs [B, C].

    The image tower runs in ``engine`` (int8 or bf16); its 2048-d feature
    feeds ``DeepSentimentModel.fuse`` (text embedding lookup, aggregator,
    concat fusion, joint softmax) inside the SAME XLA program — no second
    dispatch, and with ``from_uint8=True`` no float image tensor in HBM.
    ``variables`` is the joint model's {"params", "batch_stats"} tree.
    """
    def body(raw_u8, tokens, lengths):
        _, feature = _forward(engine, raw_u8, from_uint8, preprocess_dtype,
                              image_size, central_fraction, resize_method)
        _, ep = model.apply(variables, feature.astype(jnp.float32),
                            tokens, lengths, method="fuse")
        return ep["Predictions"]

    if mesh.devices.size == 1:
        return tpu_jit(body)

    data = mesh_lib.batch_sharding(mesh)
    return tpu_jit(body, in_shardings=(data, data, data),
                   out_shardings=data)
