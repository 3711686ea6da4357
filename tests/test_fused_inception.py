"""Fused Pallas Inception blocks vs the Flax reference (interpret mode).

The fused kernels must reproduce the XLA path bit-for-bit-ish (f32 atol
1e-4) including SAME zero padding, count_include_pad=False pooling, BN
folding, and the Mixed_5c naming quirk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.models import InceptionV3
from tumblr_emotions_tpu.ops import (fold_batchnorm, fused_inception_a,
                                     fused_inception_b)

pytestmark = pytest.mark.heavy  # multi-minute full-tower CPU compiles


@pytest.fixture(scope="module")
def model_and_endpoints():
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 299, 299, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    # Random BN stats so folding is actually exercised (fresh init has
    # mean=0/var=1 which would hide mean/var mistakes).
    rng = np.random.RandomState(2)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    _, ep = model.apply(variables, x, train=False)
    folded = fold_batchnorm(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]))
    return variables, ep, folded


def test_fold_batchnorm_covers_all_convs(model_and_endpoints):
    _, _, folded = model_and_endpoints
    assert "Conv2d_1a_3x3" in folded
    assert "Mixed_5b/Branch_0/Conv2d_0a_1x1" in folded
    assert "Logits/Conv2d_1c_1x1" in folded  # bias passthrough, no BN
    w, b = folded["Mixed_5b/Branch_0/Conv2d_0a_1x1"]
    assert w.ndim == 4 and b.shape == (w.shape[-1],)


def test_fused_a_matches_flax(model_and_endpoints):
    _, ep, folded = model_and_endpoints
    x = ep["MaxPool_5a_3x3"]
    got = fused_inception_a(x, folded, "Mixed_5b", interpret=True)
    want = ep["Mixed_5b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_a_quirky_5c(model_and_endpoints):
    _, ep, folded = model_and_endpoints
    got = fused_inception_a(ep["Mixed_5b"], folded, "Mixed_5c",
                            quirky_5c=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ep["Mixed_5c"]),
                               atol=1e-4, rtol=1e-4)


def test_fused_b_matches_flax(model_and_endpoints):
    _, ep, folded = model_and_endpoints
    got = fused_inception_b(ep["Mixed_6a"], folded, "Mixed_6b", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ep["Mixed_6b"]),
                               atol=1e-4, rtol=1e-4)


def test_fused_tower_matches_flax(model_and_endpoints):
    from tumblr_emotions_tpu.ops.inference import FusedInceptionV3

    variables, ep, _ = model_and_endpoints
    x = jnp.asarray(np.random.RandomState(5).rand(1, 299, 299, 3), jnp.float32)
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    want_logits, want_ep = model.apply(variables, x, train=False)
    eng = FusedInceptionV3(variables, dtype=jnp.float32, interpret=True)
    logits, feature = eng(x)
    np.testing.assert_allclose(
        np.asarray(feature),
        np.asarray(want_ep["PreLogits"]).reshape(1, -1), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_logits),
                               atol=1e-4, rtol=1e-4)


def test_fused_tower_xla_ablation_matches(model_and_endpoints):
    from tumblr_emotions_tpu.ops.inference import FusedInceptionV3

    variables, _, _ = model_and_endpoints
    x = jnp.asarray(np.random.RandomState(6).rand(1, 299, 299, 3), jnp.float32)
    eng = FusedInceptionV3(variables, dtype=jnp.float32, use_pallas=False)
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    want_logits, _ = model.apply(variables, x, train=False)
    logits, _ = eng(x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_logits),
                               atol=1e-4, rtol=1e-4)


def test_pallas_valid_conv_int8_matches_xla():
    """ops/pallas_conv.py (the round-2 VALID/int8 plane-shift ablation —
    measured slower than XLA on-chip, kept as a negative result) must stay
    bit-exact vs the XLA int8 conv + shift epilogue."""
    from tumblr_emotions_tpu.ops.pallas_conv import valid_conv3x3_int8_shift

    rng = np.random.RandomState(0)
    B, H, W, Ci, Co = 2, 19, 17, 16, 32
    x = rng.randint(-127, 128, (B, H, W, Ci)).astype(np.int8)
    w = rng.randint(-127, 128, (3, 3, Ci, Co)).astype(np.int8)
    b = rng.randint(0, 5000, Co).astype(np.int32)
    k = rng.randint(6, 12, Co).astype(np.int32)
    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y_ref = jnp.clip((y_ref + b[None, None, None, :])
                     >> k[None, None, None, :], 0, 127).astype(jnp.int8)
    y = valid_conv3x3_int8_shift(x, w, b, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
