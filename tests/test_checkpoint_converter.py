"""slim-checkpoint converter round-trip tests (SURVEY.md §7 step 3).

No original ImageNet slim checkpoint exists offline (SURVEY.md §7a), so the
contract is proven by round-trip: flax variables -> TF1 name-based ckpt
(via save_as_slim_checkpoint, which writes exactly the slim naming) ->
load_slim_checkpoint -> identical logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.models import InceptionV3
from tumblr_emotions_tpu.utils import checkpoint as ckpt_lib

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def small_inception():
    """depth_multiplier=0.25 keeps the test fast while exercising every scope
    (all Mixed blocks, aux head, logits)."""
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 299, 299, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    return model, variables, x


def test_roundtrip_exact(small_inception, tmp_path):
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)

    loaded = ckpt_lib.load_slim_checkpoint(path)
    fresh = model.init({"params": jax.random.PRNGKey(99)}, x, train=False)
    merged = ckpt_lib.merge_pretrained(fresh, loaded)

    ref_logits, _ = model.apply(variables, x, train=False)
    got_logits, _ = model.apply(merged, x, train=False)
    np.testing.assert_array_equal(np.asarray(ref_logits), np.asarray(got_logits))


def test_exclude_scopes(small_inception, tmp_path):
    """Reference warm-start semantics: exclude Logits/AuxLogits, keep tower."""
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)

    loaded = ckpt_lib.load_slim_checkpoint(
        path, exclude_scopes=("Logits", "AuxLogits"))
    flat = jax.tree_util.tree_leaves(loaded["params"])
    assert flat, "tower params must survive"
    from flax import traverse_util
    keys = traverse_util.flatten_dict(loaded["params"])
    assert not any(p[0] in ("Logits", "AuxLogits") for p in keys)
    assert ("Conv2d_1a_3x3", "weights") in keys

    fresh = model.init({"params": jax.random.PRNGKey(5)}, x, train=False)
    head_before = np.asarray(fresh["params"]["Logits/Conv2d_1c_1x1"]["weights"])
    merged = ckpt_lib.merge_pretrained(fresh, loaded)
    # Tower restored...
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["Conv2d_1a_3x3"]["weights"]),
        np.asarray(variables["params"]["Conv2d_1a_3x3"]["weights"]))
    # ...head untouched.
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["Logits/Conv2d_1c_1x1"]["weights"]),
        head_before)


def test_exclude_scopes_segment_boundaries(small_inception, tmp_path):
    """Excluding 'Logits' must NOT also drop 'AuxLogits' (slim matches scope
    prefixes on path-segment boundaries, not substrings)."""
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)

    from flax import traverse_util
    loaded = ckpt_lib.load_slim_checkpoint(path, exclude_scopes=("Logits",))
    keys = traverse_util.flatten_dict(loaded["params"])
    assert not any(p[0] == "Logits" for p in keys)
    assert any(p[0] == "AuxLogits" for p in keys), \
        "AuxLogits wrongly excluded by substring match"


def test_merge_into_joint_model_subtree(small_inception, tmp_path):
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)
    loaded = ckpt_lib.load_slim_checkpoint(
        path, exclude_scopes=("Logits", "AuxLogits"))

    fake_joint = {
        "params": {"InceptionV3": jax.device_get(variables["params"]),
                   "JointLogits": {"kernel": np.zeros((4, 7), np.float32)}},
        "batch_stats": {"InceptionV3": jax.device_get(variables["batch_stats"])},
    }
    merged = ckpt_lib.merge_pretrained(fake_joint, loaded, subtree="InceptionV3")
    np.testing.assert_array_equal(
        merged["params"]["InceptionV3"]["Conv2d_1a_3x3"]["weights"],
        np.asarray(variables["params"]["Conv2d_1a_3x3"]["weights"]))


def test_shape_mismatch_raises(small_inception, tmp_path):
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)
    loaded = ckpt_lib.load_slim_checkpoint(path)
    other = InceptionV3(num_classes=3, depth_multiplier=0.25, min_depth=8)
    fresh = other.init({"params": jax.random.PRNGKey(0)},
                       jnp.ones((1, 299, 299, 3)), train=False)
    with pytest.raises(ValueError, match="shape"):
        ckpt_lib.merge_pretrained(fresh, loaded)


def test_unmatched_leaf_raises(small_inception, tmp_path):
    model, variables, x = small_inception
    path = str(tmp_path / "model.ckpt")
    ckpt_lib.save_as_slim_checkpoint(variables, path)
    loaded = ckpt_lib.load_slim_checkpoint(path)
    loaded["params"]["NotAScope"] = {"weights": np.zeros((1, 1, 1, 1), np.float32)}
    fresh = small_inception[0].init({"params": jax.random.PRNGKey(0)}, x,
                                    train=False)
    with pytest.raises(ValueError, match="matched no model"):
        ckpt_lib.merge_pretrained(fresh, loaded)
