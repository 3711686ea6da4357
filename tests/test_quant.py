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
