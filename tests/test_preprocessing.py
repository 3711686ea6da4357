"""Golden tests: preprocessing vs TensorFlow 2.21 reference ops.

SURVEY.md §7 "hard parts": TF1 resize_bilinear corner semantics must be
reproduced or the 1e-4 logit budget is blown.  TF is installed in this
environment purely as a test oracle (it is NOT a runtime dependency).
"""

import numpy as np
import pytest

from tumblr_emotions_tpu.data import preprocessing as pp

tf = pytest.importorskip("tensorflow")


def _rand_images(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("hw", [(299, 299), (256, 341), (480, 320), (64, 100)])
def test_resize_bilinear_tf1_semantics(hw):
    h, w = hw
    imgs = _rand_images(2, h, w).astype(np.float32) / 255.0
    ours = np.asarray(pp.resize_bilinear(imgs, 299, 299, method="tf1"))
    theirs = tf.compat.v1.image.resize_bilinear(
        tf.constant(imgs), (299, 299), align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=0)


def test_resize_bilinear_half_pixel_semantics():
    imgs = _rand_images(2, 200, 300).astype(np.float32) / 255.0
    ours = np.asarray(pp.resize_bilinear(imgs, 299, 299, method="half_pixel"))
    theirs = tf.image.resize(tf.constant(imgs), (299, 299), method="bilinear").numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=0)


def test_central_crop_matches_tf():
    imgs = _rand_images(1, 345, 517).astype(np.float32) / 255.0
    oh, ow, ch, cw = pp.central_crop_sizes(345, 517, 0.875)
    ours = imgs[:, oh:oh + ch, ow:ow + cw, :]
    theirs = tf.image.central_crop(tf.constant(imgs[0]), 0.875).numpy()
    assert ours.shape[1:] == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours[0], theirs, atol=0)


@pytest.mark.parametrize("hw", [(345, 517), (299, 299), (150, 150)])
def test_preprocess_for_eval_end_to_end_vs_tf(hw):
    """Full eval pipeline (uint8 -> [-1,1] 299x299) vs the exact TF op chain
    slim's preprocess_for_eval runs (SURVEY.md §2a #4)."""
    h, w = hw
    imgs = _rand_images(3, h, w, seed=7)
    ours = np.asarray(pp.preprocess_for_eval(imgs))

    x = tf.image.convert_image_dtype(tf.constant(imgs), tf.float32)
    x = tf.stack([tf.image.central_crop(x[i], 0.875) for i in range(3)])
    x = tf.compat.v1.image.resize_bilinear(x, (299, 299), align_corners=False)
    x = (x - 0.5) * 2.0
    theirs = x.numpy()

    assert ours.shape == (3, 299, 299, 3)
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=0)


def test_preprocess_for_train_shapes_and_range():
    import jax

    imgs = _rand_images(4, 240, 320)
    out = np.asarray(pp.preprocess_for_train(jax.random.PRNGKey(0), imgs))
    assert out.shape == (4, 299, 299, 3)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # Distortions must differ across batch elements (independent rngs).
    assert not np.allclose(out[0], out[1])


def test_preprocess_for_train_is_jittable():
    import jax

    imgs = _rand_images(2, 120, 160)
    f = jax.jit(lambda r, x: pp.preprocess_for_train(r, x, height=128, width=128))
    out = f(jax.random.PRNGKey(1), imgs)
    assert out.shape == (2, 128, 128, 3)


def test_hsv_color_ops_match_tf():
    """Saturation/hue adjustments use exact HSV math (tf.image semantics)."""
    import jax
    import jax.numpy as jnp

    img = _rand_images(1, 48, 64, seed=3)[0].astype(np.float32) / 255.0
    ours_hsv = np.asarray(pp.rgb_to_hsv(jnp.asarray(img)))
    np.testing.assert_allclose(
        ours_hsv, tf.image.rgb_to_hsv(tf.constant(img)).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pp.hsv_to_rgb(jnp.asarray(ours_hsv))), img, atol=1e-6)

    hsv = pp.rgb_to_hsv(jnp.asarray(img))
    sat = np.asarray(pp.hsv_to_rgb(
        hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * 0.7, 0, 1))))
    np.testing.assert_allclose(
        sat, tf.image.adjust_saturation(tf.constant(img), 0.7).numpy(),
        atol=2e-6)
    hue = np.asarray(pp.hsv_to_rgb(hsv.at[..., 0].set((hsv[..., 0] + 0.13) % 1.0)))
    np.testing.assert_allclose(
        hue, tf.image.adjust_hue(tf.constant(img), 0.13).numpy(), atol=2e-6)
