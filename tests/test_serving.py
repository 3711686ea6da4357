"""Data-parallel serving path (BASELINE config 4's v5e-8 aspect) on the
8-device virtual CPU mesh: batch sharded over "data", engine weights
replicated, outputs identical to the single-device engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.models import DeepSentimentModel, InceptionV3
from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
from tumblr_emotions_tpu.ops.serving import (data_parallel_server,
                                             joint_data_parallel_server)
from tumblr_emotions_tpu.parallel import create_mesh, shard_batch

pytestmark = pytest.mark.heavy  # full-tower CPU compiles


def test_data_parallel_server_matches_single_device():
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (8, 330, 340, 3), dtype=np.uint8)

    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    calib = preprocess_for_eval(jnp.asarray(raw), dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, calib[:1],
                           train=False)
    engine = QuantizedInceptionV3(variables, calib)

    mesh = create_mesh()
    assert mesh.devices.size == 8
    server = data_parallel_server(engine, mesh)
    sharded = shard_batch(mesh, {"image": np.asarray(raw)})["image"]
    probs, feature = server(sharded)
    assert probs.shape == (8, 7) and feature.shape[0] == 8

    # The sharded outputs live on the data axis.
    assert probs.sharding.spec == jax.sharding.PartitionSpec("data")

    # Matches the single-device engine (same math, modulo bf16 fusion drift).
    logits1, feat1 = jax.jit(lambda im: engine(im))(
        preprocess_for_eval(jnp.asarray(raw), dtype=jnp.bfloat16))
    p1 = jax.nn.softmax(np.asarray(logits1, np.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(probs), p1, atol=2e-4)
    # bf16 preprocess rounds differently under the sharded fusion context;
    # the int8 tower then quantizes, so allow a few quant steps of drift.
    np.testing.assert_allclose(np.asarray(feature), np.asarray(feat1),
                               rtol=5e-3, atol=5e-3)


def test_from_uint8_server_matches_float_preprocess():
    """The all-int8 front half (uint8 in, int8-GEMM resize, no float image
    tensor in HBM) served data-parallel must track the float-preprocess
    server closely (VERDICT r2 next-step #6)."""
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 256, (8, 330, 340, 3), dtype=np.uint8)

    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    calib = preprocess_for_eval(jnp.asarray(raw), dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, calib[:1],
                           train=False)
    engine = QuantizedInceptionV3(variables, calib)

    mesh = create_mesh()
    sharded = shard_batch(mesh, {"image": np.asarray(raw)})["image"]
    p_f, _ = data_parallel_server(engine, mesh)(sharded)
    p_u8, feat = data_parallel_server(engine, mesh, from_uint8=True)(sharded)
    assert p_u8.sharding.spec == jax.sharding.PartitionSpec("data")
    assert (np.asarray(p_f).argmax(1) == np.asarray(p_u8).argmax(1)).all()
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_u8), atol=0.03)


def _joint_fixture(rng, n=8):
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    raw = rng.randint(0, 256, (n, 330, 340, 3), dtype=np.uint8)
    tokens = rng.randint(0, 50, (n, 10)).astype(np.int32)
    lengths = rng.randint(1, 10, (n,)).astype(np.int32)
    model = DeepSentimentModel(vocab_size=50, embed_dim=16, num_classes=7,
                               depth_multiplier=0.25, min_depth=8,
                               create_aux_logits=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        jnp.zeros((1, 299, 299, 3), jnp.float32), tokens[:1], lengths[:1],
        train=False)
    calib = preprocess_for_eval(jnp.asarray(raw), dtype=jnp.float32)
    tower_vars = {"params": variables["params"]["InceptionV3"],
                  "batch_stats": variables["batch_stats"]["InceptionV3"]}
    engine = QuantizedInceptionV3(tower_vars, calib)
    return model, variables, engine, raw, tokens, lengths


@pytest.mark.parametrize("n_devices", [1, 8])
def test_joint_server_single_program(n_devices):
    """Joint serving in ONE jit program (image tower + text branch + fusion
    head), on both a single device and the 8-device DP mesh, matching the
    two-stage reference path (engine then model.fuse)."""
    rng = np.random.RandomState(4)
    model, variables, engine, raw, tokens, lengths = _joint_fixture(rng)

    devices = jax.devices()[:n_devices]
    mesh = create_mesh(devices=devices)
    server = joint_data_parallel_server(engine, model, variables, mesh,
                                        from_uint8=True)
    batch = shard_batch(mesh, {"image": raw, "tokens": tokens,
                               "lengths": lengths})
    probs = server(batch["image"], batch["tokens"], batch["lengths"])
    assert probs.shape == (8, 7)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, atol=1e-5)

    # Two-stage reference: engine feature -> model.fuse as a second call.
    _, feat = jax.jit(lambda r: engine.forward_from_uint8(r))(jnp.asarray(raw))
    _, ep = model.apply(variables, feat.astype(jnp.float32),
                        jnp.asarray(tokens), jnp.asarray(lengths),
                        method="fuse")
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(ep["Predictions"]), atol=2e-4)


# ---------------------------------------------------------------------------
# The shipped headline config (VERDICT r4 #1): serving must run the exact
# program bench.py measures — s2d-emitting preprocess + stem_s2d="pre".
# ---------------------------------------------------------------------------

def _image_fixture(rng, n=8, num_classes=7):
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    model = InceptionV3(num_classes=num_classes, depth_multiplier=0.25,
                        min_depth=8, create_aux_logits=False)
    raw = rng.randint(0, 256, (n, 330, 340, 3), dtype=np.uint8)
    calib = preprocess_for_eval(jnp.asarray(raw), dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, calib[:1],
                           train=False)
    return model, variables, raw, calib


def test_s2d_server_matches_bench_program_bitwise():
    """data_parallel_server over a stem_s2d="pre" engine must compute the
    SAME program bench.py measures: s2d preprocess -> s2d stem -> tower.
    Same ops, same order => bit-identical probs on the same device."""
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval_s2d
    from tumblr_emotions_tpu.parallel import mesh as mesh_lib

    rng = np.random.RandomState(7)
    _, variables, raw, calib = _image_fixture(rng)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift",
                                  stem_s2d="pre")
    mesh = create_mesh(devices=jax.devices()[:1])
    server = data_parallel_server(engine, mesh)
    probs, feat = server(jnp.asarray(raw))

    def bench_style(r):
        logits, f = engine(preprocess_for_eval_s2d(r, dtype=jnp.bfloat16))
        return jax.nn.softmax(logits.astype(jnp.float32), -1), f

    p_ref, f_ref = jax.jit(bench_style)(jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(probs), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(f_ref))


def test_s2d_server_agrees_with_float_front():
    """The shipped s2d front vs the normal-layout float front: identical
    int8 tower, only the preprocess einsum association differs (bf16), so
    top-1 must match and probs stay within the engine's own quantization
    envelope (same contract as tests/test_quant.py's engine-level test)."""
    rng = np.random.RandomState(8)
    _, variables, raw, calib = _image_fixture(rng)
    mesh = create_mesh(devices=jax.devices()[:1])
    base = QuantizedInceptionV3(variables, calib, epilogue="shift")
    s2d = QuantizedInceptionV3(variables, calib, epilogue="shift",
                               stem_s2d="pre")
    p0, _ = data_parallel_server(base, mesh)(jnp.asarray(raw))
    p1, _ = data_parallel_server(s2d, mesh)(jnp.asarray(raw))
    p0, p1 = np.asarray(p0), np.asarray(p1)
    assert (p0.argmax(1) == p1.argmax(1)).all()
    assert np.abs(p0 - p1).max() < 5e-3


def test_s2d_server_data_parallel_matches_single_device():
    """The headline config sharded over the 8-device mesh equals the
    single-device run (weights replicated, batch split on "data")."""
    rng = np.random.RandomState(9)
    _, variables, raw, calib = _image_fixture(rng)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift",
                                  stem_s2d="pre")
    mesh = create_mesh()
    assert mesh.devices.size == 8
    sharded = shard_batch(mesh, {"image": raw})["image"]
    probs, _ = data_parallel_server(engine, mesh)(sharded)
    assert probs.sharding.spec == jax.sharding.PartitionSpec("data")
    p1, _ = data_parallel_server(
        engine, create_mesh(devices=jax.devices()[:1]))(jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(p1), atol=2e-4)


def test_s2d_engine_rejects_from_uint8():
    """from_uint8 feeds the normal layout; an s2d-pre engine must refuse it
    loudly rather than silently misinterpret the tensor."""
    rng = np.random.RandomState(10)
    _, variables, raw, calib = _image_fixture(rng, n=2)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift",
                                  stem_s2d="pre")
    mesh = create_mesh(devices=jax.devices()[:1])
    server = data_parallel_server(engine, mesh, from_uint8=True)
    with pytest.raises(ValueError, match="s2d"):
        server(jnp.asarray(raw))


def test_build_forward_ships_s2d_front():
    """cli serve/infer construct the served program via build_forward; its
    default front must be the benchmarked s2d config, and the uint8/float
    fronts must stay reachable."""
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.ops import serving as serving_lib
    from tumblr_emotions_tpu.train import Trainer

    import dataclasses

    cfg = get_preset("image_frozen")
    cfg = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, depth_multiplier=0.25,
                                       min_depth=8,
                                       create_aux_logits=False,
                                       num_classes=7))
    trainer = Trainer(cfg)
    rng = np.random.RandomState(11)
    _, variables, raw, calib = _image_fixture(rng, n=2)
    mesh = create_mesh(devices=jax.devices()[:1])
    outs = {}
    for front in ("s2d", "uint8", "float"):
        runner = serving_lib.build_forward(cfg, trainer, variables, mesh,
                                           engine="int8",
                                           calib_images=calib, front=front)
        outs[front] = np.asarray(runner(jnp.asarray(raw), None, None))
    # All fronts drive the same int8 tower: top-1 agreement.
    assert (outs["s2d"].argmax(1) == outs["float"].argmax(1)).all()
    assert (outs["s2d"].argmax(1) == outs["uint8"].argmax(1)).all()
    # And the default IS s2d.
    runner = serving_lib.build_forward(cfg, trainer, variables, mesh,
                                       engine="int8", calib_images=calib)
    np.testing.assert_array_equal(
        np.asarray(runner(jnp.asarray(raw), None, None)), outs["s2d"])
    with pytest.raises(ValueError, match="front"):
        serving_lib.build_forward(cfg, trainer, variables, mesh,
                                  engine="int8", calib_images=calib,
                                  front="bogus")
