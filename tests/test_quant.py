"""int8 quantized serving engine (ops/quant.py) vs the f32 Flax reference.

The int8 engine is the perf-mode path (VERDICT.md round-1 next-step #1);
these tests pin its numerics: calibrated static scales, per-channel weight
quantization, and end-to-end agreement with the float model on a small
tower with live batch stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tumblr_emotions_tpu.models import InceptionV3
from tumblr_emotions_tpu.ops.quant import (QuantizedInceptionV3,
                                           quantize_weights,
                                           quantization_delta)

pytestmark = pytest.mark.heavy  # full-tower CPU compiles (x3 interpretations)


@pytest.fixture(scope="module")
def live_model():
    """Small tower with 'live' BN stats: means near 0, variances near 1, so
    activations survive folding (large random means relu-kill the net and
    make every engine agree vacuously on all-zero outputs)."""
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 299, 299, 3) * 2 - 1,
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    rng = np.random.RandomState(2)
    flat = traverse_util.flatten_dict(variables["batch_stats"])
    newflat = {
        k: jnp.asarray(rng.uniform(0.8, 1.2, v.shape)
                       if k[-1] == "moving_variance"
                       else rng.uniform(-0.05, 0.05, v.shape), v.dtype)
        for k, v in flat.items()}
    variables = {"params": variables["params"],
                 "batch_stats": traverse_util.unflatten_dict(newflat)}
    return model, variables, x


def test_weight_quantization_roundtrip():
    folded = {"conv": (np.random.RandomState(0).randn(3, 3, 8, 16)
                       .astype(np.float32),
                       np.zeros(16, np.float32))}
    wq = quantize_weights(folded)
    w_q, s_w, _ = wq["conv"]
    assert w_q.dtype == np.int8
    # Per-channel: every channel's max must map to +-127.
    assert np.all(np.abs(w_q).max(axis=(0, 1, 2)) == 127)
    recon = w_q.astype(np.float32) * s_w
    err = np.abs(recon - folded["conv"][0]).max()
    assert err <= s_w.max() / 2 + 1e-6  # half a quant step


def test_quantized_engine_agrees_with_flax(live_model):
    model, variables, x = live_model
    want_logits, ep = model.apply(variables, x, train=False)
    eng = QuantizedInceptionV3(variables, calibration_images=x)
    logits, feat = jax.jit(lambda im: eng(im))(x)

    wf = np.asarray(ep["PreLogits"]).reshape(4, -1)
    qf = np.asarray(feat)
    assert np.linalg.norm(wf, axis=1).min() > 0, "degenerate fixture"
    cos = (wf * qf).sum(1) / (np.linalg.norm(wf, axis=1)
                              * np.linalg.norm(qf, axis=1))
    assert cos.min() > 0.995, f"feature cosine too low: {cos}"
    agree = (np.asarray(want_logits).argmax(1)
             == np.asarray(logits).argmax(1)).mean()
    assert agree == 1.0


def test_stem_s2d_is_bit_exact():
    """The space-to-depth stride-2 stem rewrite (conv_s2d) must equal the
    plain stride-2 conv bit for bit in both epilogue modes — the kernel is
    rearranged after int8 quantization, so there is no numeric freedom."""
    from tumblr_emotions_tpu.ops.quant import _Int8Ops

    rng = np.random.RandomState(0)
    folded = {"Conv2d_1a_3x3": ((rng.randn(3, 3, 3, 32) * 0.1)
                                .astype(np.float32),
                                (rng.randn(32) * 0.01).astype(np.float32))}
    scales = {"input": 0.011, "Conv2d_1a_3x3": 0.02}
    q = jnp.asarray(rng.randint(-127, 128, (2, 299, 299, 3)).astype(np.int8))
    for epi in ("f32", "shift"):
        ops = _Int8Ops(folded, scales, epilogue=epi)
        t = (q, scales["input"])
        y0, s0 = ops.conv(t, "Conv2d_1a_3x3", strides=(2, 2))
        y1, s1 = ops.conv_s2d(t, "Conv2d_1a_3x3")
        assert s0 == s1
        assert y1.shape == (2, 149, 149, 32)
        assert np.array_equal(np.asarray(y0), np.asarray(y1)), epi


def test_quantization_delta_harness(live_model):
    _, variables, x = live_model
    d = quantization_delta(variables, x)
    assert d["top1_agreement"] == 1.0
    assert d["mean_prob_delta"] < 0.01
    assert d["max_prob_delta"] < 0.05


def test_activations_stay_int8(live_model):
    """Every inter-block tensor must flow as (int8, scale) — the engine's
    whole point is 1-byte activations in HBM."""
    from tumblr_emotions_tpu.ops import quant

    _, variables, x = live_model
    eng = QuantizedInceptionV3(variables, calibration_images=x)
    for stop in ("stem", "Mixed_5d", "Mixed_6a", "Mixed_6e", "Mixed_7a"):
        q, _ = jax.eval_shape(
            lambda im, stop=stop: quant._tower(
                quant._Int8Ops(eng.folded, eng.scales,
                               epilogue=eng.epilogue), im, stop_at=stop), x)
        assert q.dtype == jnp.int8, f"{stop} is {q.dtype}"


def test_percentile_calibration(live_model):
    """Quantile calibration must produce scales <= max-based ones and keep
    end-to-end agreement (on smooth random data the two are close)."""
    model, variables, x = live_model
    want_logits, _ = model.apply(variables, x, train=False)
    eng_max = QuantizedInceptionV3(variables, x)
    eng_q = QuantizedInceptionV3(variables, x, calibration_quantile=0.999)
    for key, s in eng_q.scales.items():
        assert s <= eng_max.scales[key] * 1.0000001, key
    logits, _ = jax.jit(lambda im: eng_q(im))(x)
    agree = (np.asarray(want_logits).argmax(1)
             == np.asarray(logits).argmax(1)).mean()
    assert agree == 1.0


def test_uint8_preprocess_path_agrees(live_model):
    """forward_from_uint8 (central crop -> int8-GEMM TF1 resize ->
    normalization+quantization fused) must agree with the float-preprocess
    path: the resize-matrix quantization adds less than the engine's own
    input quantization step."""
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    model, variables, _ = live_model
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randint(0, 256, (4, 345, 351, 3), dtype=np.uint8))
    x = preprocess_for_eval(raw, dtype=jnp.float32)
    eng = QuantizedInceptionV3(variables, calibration_images=x)
    l_f, f_f = jax.jit(lambda im: eng(im))(x)
    l_q, f_q = jax.jit(lambda r: eng.forward_from_uint8(r))(raw)
    agree = (np.asarray(l_f).argmax(1) == np.asarray(l_q).argmax(1)).mean()
    assert agree == 1.0
    a, b = np.asarray(f_f), np.asarray(f_q)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1) + 1e-9)
    assert cos.min() > 0.999, cos


def test_preprocess_s2d_layout_matches_relayout():
    """preprocess_for_eval_s2d must equal
    space_to_depth_2x2(preprocess_for_eval(x)) on every real lane (the
    odd-size padded parity lanes hold -1 vs 0 — inert, the s2d kernel's
    padded taps are zero; see the function docstrings)."""
    from tumblr_emotions_tpu.data.preprocessing import (
        preprocess_for_eval, preprocess_for_eval_s2d)
    from tumblr_emotions_tpu.ops.quant import _space_to_depth_2x2

    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (2, 347, 341, 3), dtype=np.uint8))
    ref = np.asarray(_space_to_depth_2x2(
        preprocess_for_eval(u8, dtype=jnp.float32)))
    got = np.asarray(preprocess_for_eval_s2d(u8, dtype=jnp.float32))
    assert got.shape == (2, 150, 150, 12)
    # Padded lanes: last row's dy=1 lanes (6..11), last col's dx=1 lanes
    # (3..5 and 9..11) — channel order (dy, dx, c).
    valid = np.ones(got.shape, bool)
    valid[:, -1, :, 6:] = False
    valid[:, :, -1, 3:6] = False
    valid[:, :, -1, 9:] = False
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-6, rtol=0)
    assert np.abs(ref[~valid]).max() == 0.0
    assert (np.asarray(got)[~valid] == -1.0).all()


def test_stem_s2d_pre_is_bit_exact():
    """stem_s2d="pre" (caller supplies the s2d layout) must match the
    plain stride-2 conv bit for bit, like stem_s2d=True does."""
    from tumblr_emotions_tpu.ops.quant import _Int8Ops, _space_to_depth_2x2

    rng = np.random.RandomState(0)
    folded = {"Conv2d_1a_3x3": ((rng.randn(3, 3, 3, 32) * 0.1)
                                .astype(np.float32),
                                (rng.randn(32) * 0.01).astype(np.float32))}
    scales = {"input": 0.011, "Conv2d_1a_3x3": 0.02}
    q = jnp.asarray(rng.randint(-127, 128, (2, 299, 299, 3)).astype(np.int8))
    for epi in ("f32", "shift"):
        y0, _ = _Int8Ops(folded, scales, epilogue=epi).conv(
            (q, scales["input"]), "Conv2d_1a_3x3", strides=(2, 2))
        y1, _ = _Int8Ops(folded, scales, epilogue=epi, stem_s2d="pre"
                         ).conv_s2d((_space_to_depth_2x2(q),
                                     scales["input"]), "Conv2d_1a_3x3")
        assert np.array_equal(np.asarray(y0), np.asarray(y1)), epi


def test_s2d_pre_whole_engine_agrees(live_model):
    """The s2d-direct serving front (preprocess_for_eval_s2d +
    stem_s2d="pre") agrees with the normal-layout engine end to end."""
    from tumblr_emotions_tpu.data.preprocessing import (
        preprocess_for_eval, preprocess_for_eval_s2d)

    model, variables, x = live_model
    rng = np.random.RandomState(5)
    raw = jnp.asarray(rng.randint(0, 256, (4, 347, 347, 3), dtype=np.uint8))
    base = QuantizedInceptionV3(variables, calibration_images=x)
    eng = QuantizedInceptionV3(variables, calibration_images=x,
                               stem_s2d="pre")
    l0, _ = jax.jit(lambda r: base(preprocess_for_eval(
        r, dtype=jnp.bfloat16)))(raw)
    l1, _ = jax.jit(lambda r: eng(preprocess_for_eval_s2d(
        r, dtype=jnp.bfloat16)))(raw)
    p0 = np.asarray(jax.nn.softmax(l0.astype(jnp.float32), -1))
    p1 = np.asarray(jax.nn.softmax(l1.astype(jnp.float32), -1))
    assert (p0.argmax(1) == p1.argmax(1)).all()
    # Only bf16 einsum association order differs between the two fronts.
    assert np.abs(p0 - p1).max() < 5e-3


def test_int8_pool_mode_agrees(live_model):
    """pool_mode="int8" (pre-pool requant, 1-byte pool input) stays within
    the engine's own quantization-noise envelope of the f32-pool engine."""
    model, variables, x = live_model
    base = QuantizedInceptionV3(variables, calibration_images=x)
    eng = QuantizedInceptionV3(variables, calibration_images=x,
                               pool_mode="int8")
    assert sum(k.endswith(":poolpre") for k in eng.scales) == 8
    l0, _ = jax.jit(lambda v: base(v))(x)
    l1, _ = jax.jit(lambda v: eng(v))(x)
    p0 = np.asarray(jax.nn.softmax(l0.astype(jnp.float32), -1))
    p1 = np.asarray(jax.nn.softmax(l1.astype(jnp.float32), -1))
    assert (p0.argmax(1) == p1.argmax(1)).all()
    assert np.abs(p0 - p1).max() < 5e-3
