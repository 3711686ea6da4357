"""Inception-v3 tower tests, mirroring upstream slim's inception_v3_test
cases (SURVEY.md §4: endpoint shapes, param structure, train/eval modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tumblr_emotions_tpu.models import InceptionV3

pytestmark = pytest.mark.heavy  # full-tower CPU compiles (several minutes)


def _init(model, shape=(2, 299, 299, 3), train=False):
    x = jnp.ones(shape, jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=train)
    return variables, x


def test_endpoint_shapes_299():
    model = InceptionV3(num_classes=15)
    variables, x = _init(model)
    logits, end_points = model.apply(variables, x, train=False)
    assert logits.shape == (2, 15)
    expected = {
        "Conv2d_1a_3x3": (2, 149, 149, 32),
        "Conv2d_2a_3x3": (2, 147, 147, 32),
        "Conv2d_2b_3x3": (2, 147, 147, 64),
        "MaxPool_3a_3x3": (2, 73, 73, 64),
        "Conv2d_3b_1x1": (2, 73, 73, 80),
        "Conv2d_4a_3x3": (2, 71, 71, 192),
        "MaxPool_5a_3x3": (2, 35, 35, 192),
        "Mixed_5b": (2, 35, 35, 256),
        "Mixed_5c": (2, 35, 35, 288),
        "Mixed_5d": (2, 35, 35, 288),
        "Mixed_6a": (2, 17, 17, 768),
        "Mixed_6b": (2, 17, 17, 768),
        "Mixed_6c": (2, 17, 17, 768),
        "Mixed_6d": (2, 17, 17, 768),
        "Mixed_6e": (2, 17, 17, 768),
        "Mixed_7a": (2, 8, 8, 1280),
        "Mixed_7b": (2, 8, 8, 2048),
        "Mixed_7c": (2, 8, 8, 2048),
        "AuxLogits": (2, 15),
        "PreLogits": (2, 1, 1, 2048),
        "Logits": (2, 15),
        "Predictions": (2, 15),
    }
    for name, shape in expected.items():
        assert end_points[name].shape == shape, (
            f"{name}: {end_points[name].shape} != {shape}")


def test_param_count_matches_canonical_inception_v3():
    """With 1000 classes and no aux head, total variables (params + BN moving
    stats) must equal the canonical Inception-v3 count of 23,851,784 —
    cross-checked against tf_keras.applications.InceptionV3 (SURVEY.md §7a)."""
    model = InceptionV3(num_classes=1000, create_aux_logits=False)
    variables, _ = _init(model, shape=(1, 299, 299, 3))
    n = sum(int(np.prod(v.shape))
            for leaf in ["params", "batch_stats"]
            for v in jax.tree_util.tree_leaves(variables[leaf]))
    assert n == 23_851_784, n


def test_slim_variable_names():
    """Flax param paths joined with '/' must reproduce slim variable names,
    including the historical scope quirks the converter depends on."""
    model = InceptionV3(num_classes=15)
    variables, _ = _init(model)
    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    stats = traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    for key in [
        "Conv2d_1a_3x3/weights",
        "Mixed_5b/Branch_1/Conv2d_0a_1x1/weights",
        "Mixed_5c/Branch_1/Conv_1_0c_5x5/weights",      # 5c naming quirk
        "Mixed_6a/Branch_0/Conv2d_1a_1x1/weights",      # 3x3 conv named 1x1
        "Mixed_7b/Branch_1/Conv2d_0b_3x1/weights",      # 7b doubled 0b scope
        "Mixed_7c/Branch_1/Conv2d_0c_3x1/weights",      # 7c uses 0c
        "AuxLogits/Conv2d_2a_5x5/weights",
        "AuxLogits/Conv2d_2b_1x1/biases",
        "Logits/Conv2d_1c_1x1/weights",
        "Logits/Conv2d_1c_1x1/biases",
        "Mixed_5b/Branch_0/Conv2d_0a_1x1/BatchNorm/beta",
    ]:
        assert key in flat, f"missing param {key}"
    for key in [
        "Mixed_5b/Branch_0/Conv2d_0a_1x1/BatchNorm/moving_mean",
        "Mixed_5b/Branch_0/Conv2d_0a_1x1/BatchNorm/moving_variance",
    ]:
        assert key in stats, f"missing batch stat {key}"
    # slim scale=False: no gamma anywhere.
    assert not any(k.endswith("gamma") for k in flat)


def test_train_mode_updates_batch_stats():
    model = InceptionV3(num_classes=15)
    variables, x = _init(model, shape=(2, 299, 299, 3))
    (logits, _), updates = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert logits.shape == (2, 15)
    old = variables["batch_stats"]["Conv2d_1a_3x3"]["BatchNorm"]["moving_mean"]
    new = updates["batch_stats"]["Conv2d_1a_3x3"]["BatchNorm"]["moving_mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_no_aux_when_disabled():
    model = InceptionV3(num_classes=15, create_aux_logits=False)
    variables, x = _init(model)
    _, end_points = model.apply(variables, x, train=False)
    assert "AuxLogits" not in end_points


def test_smaller_input_resizes_pool_kernels():
    # slim reduces the final pool kernel for small inputs; 150x150 should work.
    model = InceptionV3(num_classes=15, create_aux_logits=False)
    x = jnp.ones((1, 150, 150, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    logits, end_points = model.apply(variables, x, train=False)
    assert logits.shape == (1, 15)
    assert end_points["PreLogits"].shape[-1] == 2048
