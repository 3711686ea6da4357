"""Golden tests: preprocessing vs TensorFlow 2.21 reference ops.

SURVEY.md §7 "hard parts": TF1 resize_bilinear corner semantics must be
reproduced or the 1e-4 logit budget is blown.  TF is installed in this
environment purely as a test oracle (it is NOT a runtime dependency).
"""

import jax.numpy as jnp
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


@pytest.mark.parametrize("method,tf_method,tol", [
    ("tf1", "BILINEAR", 1e-5),
    ("nearest", "NEAREST_NEIGHBOR", 0.0),
    ("bicubic", "BICUBIC", 3e-3),   # TF quantizes coeffs via a 1024-entry LUT
    ("area", "AREA", 1e-4),
])
@pytest.mark.parametrize("crop", [(17, 33, 180, 250),   # downscale to 299
                                  (5, 9, 120, 100)])    # upscale to 299
def test_crop_resize_methods_match_tf(method, tf_method, tol, crop):
    """The dynamic crop+resize against TF's resize of the same crop, for all
    4 methods slim's apply_with_random_selector rotates through."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    img = rng.rand(240, 320, 3).astype(np.float32)
    oy, ox, ch, cw = crop
    ours = np.asarray(pp._crop_resize_one(
        jnp.asarray(img), jnp.int32(oy), jnp.int32(ox), jnp.int32(ch),
        jnp.int32(cw), 299, 299, method))
    theirs = tf.compat.v1.image.resize_images(
        tf.constant(img[oy:oy + ch, ox:ox + cw][None]), (299, 299),
        method=getattr(tf.image.ResizeMethod, tf_method),
        align_corners=False).numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=max(tol, 1e-12), rtol=0)


def test_crop_sampler_matches_tf_distribution():
    """Oracle test for distorted_bounding_box_crop vs
    tf.image.sample_distorted_bounding_box (whole-image bbox, slim defaults):
    hard bounds (min_object_covered actually enforced, aspect in range) and
    first/second moments of the area/aspect distributions."""
    import jax

    H, W = 240, 320
    N = 1200
    f = jax.jit(jax.vmap(
        lambda k: jnp.stack(pp.distorted_bounding_box_crop(k, (H, W)))))
    ours = np.asarray(f(jax.random.split(jax.random.PRNGKey(0), N)))
    o_area = ours[:, 2] * ours[:, 3] / (H * W)
    o_ar = ours[:, 3] / ours[:, 2]

    bbox = tf.constant([[[0.0, 0.0, 1.0, 1.0]]])
    shape = tf.constant([H, W, 3])
    sizes = np.array([
        tf.image.sample_distorted_bounding_box(
            shape, bounding_boxes=bbox, seed=i + 1, min_object_covered=0.1,
            aspect_ratio_range=(0.75, 1.333), area_range=(0.05, 1.0),
            max_attempts=100, use_image_if_no_bounding_boxes=True)[1].numpy()
        for i in range(N)])
    t_area = sizes[:, 0] * sizes[:, 1] / (H * W)
    t_ar = sizes[:, 1] / sizes[:, 0]

    # Hard bounds: coverage constraint enforced (the round-1 sampler accepted
    # 5%-area crops; TF rejects anything below min_object_covered=0.1).
    assert o_area.min() >= 0.1 - 1e-6
    assert o_area.max() <= 1.0 + 1e-6
    # Aspect ratio in range, ± integer-rounding slop on small crops.
    assert o_ar.min() >= 0.75 - 0.02 and o_ar.max() <= 1.333 + 0.02
    # Distribution moments match TF's sampler.
    assert abs(o_area.mean() - t_area.mean()) < 0.03
    assert abs(o_area.std() - t_area.std()) < 0.03
    assert abs(o_ar.mean() - t_ar.mean()) < 0.02
    assert abs(o_ar.std() - t_ar.std()) < 0.02


def test_preprocess_for_train_full_mode_jits():
    """fast_mode=False exercises the 4-way random resize selection and the
    4 color-distortion orderings under one jit."""
    import jax

    imgs = _rand_images(3, 120, 160)
    f = jax.jit(lambda r, x: pp.preprocess_for_train(
        r, x, height=128, width=128, fast_mode=False))
    out = np.asarray(f(jax.random.PRNGKey(2), imgs))
    assert out.shape == (3, 128, 128, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    assert not np.allclose(out[0], out[1])


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


@pytest.mark.parametrize("method", ["tf1", "nearest", "bicubic", "area"])
def test_crop_resize_batch_matches_per_image_taps(method):
    """The batched dense-matrix crop+resize (MXU path) against the
    TF-verified per-image tap form, per-image crops + folded flip."""
    import jax

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(4, 120, 150, 3).astype(np.float32))
    oy = jnp.asarray([0, 10, 3, 40], jnp.int32)
    ox = jnp.asarray([0, 7, 90, 20], jnp.int32)
    ch = jnp.asarray([120, 100, 64, 33], jnp.int32)
    cw = jnp.asarray([150, 80, 60, 47], jnp.int32)
    flip = jnp.asarray([False, True, False, True])

    batch = np.asarray(pp._crop_resize_batch(
        imgs, oy, ox, ch, cw, 99, 111, method, flip=flip))
    ref = np.asarray(jax.vmap(lambda im, a, b, c, d: pp._crop_resize_one(
        im, a, b, c, d, 99, 111, method))(imgs, oy, ox, ch, cw))
    ref = np.where(np.asarray(flip)[:, None, None, None],
                   ref[:, :, ::-1, :], ref)
    np.testing.assert_allclose(batch, ref, atol=2e-5, rtol=0)


def test_crop_resize_batch_uint8_scale_fold():
    """in_scale folds the /255 into the matrix; equals dividing first."""
    rng = np.random.RandomState(2)
    raw = jnp.asarray(rng.randint(0, 256, (3, 90, 90, 3), dtype=np.uint8))
    oy = ox = jnp.zeros((3,), jnp.int32)
    ch = cw = jnp.asarray([90, 70, 45], jnp.int32)
    a = np.asarray(pp._crop_resize_batch(raw, oy, ox, ch, cw, 64, 64,
                                         "tf1", in_scale=1.0 / 255.0))
    b = np.asarray(pp._crop_resize_batch(
        raw.astype(jnp.float32) / 255.0, oy, ox, ch, cw, 64, 64, "tf1"))
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


@pytest.mark.parametrize("factor", [0.5, 0.7, 1.0, 1.3, 2.5])
def test_elementwise_saturation_matches_tf(factor):
    """_saturate (no HSV round trip) vs tf.image.adjust_saturation,
    including the s*f > 1 clipping regime (factor 2.5)."""
    rng = np.random.RandomState(3)
    img = rng.rand(31, 17, 3).astype(np.float32)
    img[0, 0] = [0.5, 0.5, 0.5]   # gray: d == 0 edge
    img[0, 1] = [0.0, 0.0, 0.0]   # black
    img[0, 2] = [1.0, 0.0, 0.0]   # fully saturated
    ours = np.asarray(pp._saturate(jnp.asarray(img), jnp.float32(factor)))
    theirs = tf.image.adjust_saturation(tf.constant(img), factor).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=0)


def test_preprocess_for_train_fast_mode_brightness_saturation_ranges():
    """Fast-mode color distortion stays within the slim envelope: output in
    [-1, 1] and images differ across the batch (random crops + colors)."""
    import jax

    out = np.asarray(pp.preprocess_for_train(
        jax.random.PRNGKey(7), jnp.asarray(_rand_images(6, 96, 128, 5)),
        64, 64))
    assert out.shape == (6, 64, 64, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    assert len({float(out[i].mean()) for i in range(6)}) == 6
