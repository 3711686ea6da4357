"""Image preprocessing with TF/slim ``inception_preprocessing`` semantics.

Rebuilds SURVEY.md §2a #4 — the parity-critical math:

  eval:  decode -> central_crop(0.875) -> resize_bilinear(299, 299,
         align_corners=False, half_pixel_centers=False)  -> x*2 - 1
  train: distorted bounding-box crop -> resize (one of the bilinear family)
         -> random horizontal flip -> color distortion -> x*2 - 1

Design (TPU-first, not a port): TF1's ``resize_bilinear`` is re-expressed as
two separable 1-D interpolations, each a dense [out, in] matrix contraction —
so on TPU the whole resize is two MXU matmuls per image batch instead of a
gather soup, and it fuses with the crop + normalize under one jit.  The
interpolation matrices are computed at trace time from static shapes.

Both TF1 legacy grid semantics (``src = dst * in/out`` — what slim actually
ran; default here for the 1e-4 parity budget) and half-pixel-centers
semantics are provided.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(out_size: int, in_size: int, method: str) -> np.ndarray:
    """Dense [out_size, in_size] bilinear interpolation matrix (f32).

    method: "tf1"        — legacy TF1 resize_bilinear (align_corners=False,
                            half_pixel_centers=False): src = dst * in/out
            "half_pixel" — TF2/jax.image semantics: src = (dst+0.5)*in/out - 0.5
    """
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    # TF's kernels compute the source grid in float32; matching that rounding
    # is required for the 1e-4 parity budget (verified: float64 grid drifts to
    # ~2e-5 vs TF, float32 grid to ~2e-7).
    scale = np.float32(in_size) / np.float32(out_size)
    for o in range(out_size):
        if method == "tf1":
            src = float(np.float32(o) * scale)
        elif method == "half_pixel":
            src = float((np.float32(o) + np.float32(0.5)) * scale - np.float32(0.5))
        else:
            raise ValueError(f"unknown resize method {method!r}")
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[o, lo] += 1.0 - frac
        m[o, hi] += frac
    return m


@functools.lru_cache(maxsize=64)
def _interp_matrix_cached(out_size: int, in_size: int, method: str) -> np.ndarray:
    return _interp_matrix(out_size, in_size, method)


def resize_bilinear(images: jax.Array, out_h: int, out_w: int,
                    method: str = "tf1",
                    dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Batched bilinear resize as two MXU matmuls.

    images: [N, H, W, C] (any float/int dtype; promoted to ``dtype``).
    Exactly reproduces tf.compat.v1.image.resize_bilinear for method="tf1"
    and tf.image.resize(..., 'bilinear') for method="half_pixel".
    """
    n, h, w, c = images.shape
    rh = jnp.asarray(_interp_matrix_cached(out_h, h, method), dtype)
    rw = jnp.asarray(_interp_matrix_cached(out_w, w, method), dtype)
    x = images.astype(dtype)
    # HIGHEST precision (true-f32 MXU passes) is what meets the 1e-4 parity
    # budget in f32 mode; in bf16 perf mode the rest of the model rounds to
    # bf16 anyway, so the fast path is used.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # [oh,h] x [n,h,w,c] -> [n,oh,w,c]; then [ow,w] contraction on axis 2.
    x = jnp.einsum("oh,nhwc->nowc", rh, x, precision=prec)
    x = jnp.einsum("pw,nowc->nopc", rw, x, precision=prec)
    return x


def central_crop_sizes(h: int, w: int, fraction: float) -> Tuple[int, int, int, int]:
    """TF tf.image.central_crop offsets/sizes (matches its int arithmetic)."""
    # tf.image.central_crop: offset = int((dim - dim*fraction) / 2) via
    # floor((d - d*f)/2); crop size = d - 2*offset.
    off_h = int((h - h * fraction) / 2.0)
    off_w = int((w - w * fraction) / 2.0)
    return off_h, off_w, h - 2 * off_h, w - 2 * off_w


def preprocess_for_eval(images: jax.Array, height: int = 299, width: int = 299,
                        central_fraction: float = 0.875,
                        resize_method: str = "tf1",
                        dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """slim inception_preprocessing.preprocess_for_eval on a uint8/float batch.

    images: [N, H, W, C] uint8 (0..255) or float already in [0, 1].
    Returns [N, height, width, C] in [-1, 1].
    """
    n, h, w, c = images.shape
    x = images.astype(dtype)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / jnp.asarray(255.0, dtype)  # tf.image.convert_image_dtype
    if central_fraction and central_fraction < 1.0:
        oh, ow, ch, cw = central_crop_sizes(h, w, central_fraction)
        x = jax.lax.slice(x, (0, oh, ow, 0), (n, oh + ch, ow + cw, c))
    x = resize_bilinear(x, height, width, method=resize_method, dtype=dtype)
    return x * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Training-time distortions (slim preprocess_for_train).
# ---------------------------------------------------------------------------

def distorted_bounding_box_crop(
        rng: jax.Array, image_hw: Tuple[int, int],
        min_object_covered: float = 0.1,
        aspect_ratio_range: Tuple[float, float] = (0.75, 1.333),
        area_range: Tuple[float, float] = (0.05, 1.0),
        max_attempts: int = 100) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample a crop window like tf.image.sample_distorted_bounding_box.

    Returns (offset_y, offset_x, crop_h, crop_w) as traced int32 scalars.
    Implemented as a fixed-trip rejection sampler under ``lax`` control flow
    (static shapes; no data-dependent Python branching — XLA-friendly).
    """
    h, w = image_hw
    area = float(h * w)

    def attempt(rng):
        r_ar, r_area, r_y, r_x = jax.random.split(rng, 4)
        log_lo, log_hi = np.log(aspect_ratio_range[0]), np.log(aspect_ratio_range[1])
        ar = jnp.exp(jax.random.uniform(r_ar, (), minval=log_lo, maxval=log_hi))
        target_area = jax.random.uniform(
            r_area, (), minval=area_range[0], maxval=area_range[1]) * area
        cw = jnp.sqrt(target_area * ar)
        ch = jnp.sqrt(target_area / ar)
        cw = jnp.clip(jnp.round(cw), 1, w).astype(jnp.int32)
        ch = jnp.clip(jnp.round(ch), 1, h).astype(jnp.int32)
        ok = (cw <= w) & (ch <= h) & ((ch * cw).astype(jnp.float32) / area
                                      >= min_object_covered * 0.0 + area_range[0] * 0.0)
        oy = jax.random.randint(r_y, (), 0, jnp.maximum(h - ch + 1, 1))
        ox = jax.random.randint(r_x, (), 0, jnp.maximum(w - cw + 1, 1))
        return ok, (oy, ox, ch, cw)

    def body(carry, rng_i):
        found, best = carry
        ok, cand = attempt(rng_i)
        take = ok & ~found
        best = jax.tree_util.tree_map(
            lambda c, b: jnp.where(take, c, b), cand, best)
        return (found | ok, best), None

    rngs = jax.random.split(rng, max_attempts)
    init = (jnp.asarray(False),
            (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(h, jnp.int32), jnp.asarray(w, jnp.int32)))
    (found, best), _ = jax.lax.scan(body, init, rngs)
    return best


def _crop_resize_one(image: jax.Array, oy, ox, ch, cw, height: int, width: int,
                     method: str) -> jax.Array:
    """Dynamic crop + resize for one [H,W,C] image with traced crop params.

    Dynamic crop sizes can't change the traced shape, so the crop+resize pair
    is expressed as a single dynamic interpolation: for output row o we sample
    source row oy + o*(ch/out_h) (TF1 grid).  Gathers of 2 neighbor rows/cols
    + lerp; static output shape [height, width, C].
    """
    h, w, c = image.shape
    x = image

    def axis_index(out_size, off, size, in_size):
        scale = size.astype(jnp.float32) / out_size
        src = jnp.arange(out_size, dtype=jnp.float32) * scale
        if method == "half_pixel":
            src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, size.astype(jnp.float32) - 1.0)
        src = src + off.astype(jnp.float32)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, off + size - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yfrac = axis_index(height, oy, ch, h)
    xlo, xhi, xfrac = axis_index(width, ox, cw, w)

    top = jnp.take(x, ylo, axis=0)
    bot = jnp.take(x, yhi, axis=0)
    rows = top + (bot - top) * yfrac[:, None, None]
    left = jnp.take(rows, xlo, axis=1)
    right = jnp.take(rows, xhi, axis=1)
    return left + (right - left) * xfrac[None, :, None]


def preprocess_for_train(rng: jax.Array, images: jax.Array,
                         height: int = 299, width: int = 299,
                         resize_method: str = "tf1",
                         fast_mode: bool = True,
                         dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """slim preprocess_for_train over a batch: distorted crop, resize,
    random flip, color distortion, scale to [-1, 1].

    ``fast_mode`` (slim's default for train throughput) restricts color
    distortion to brightness+saturation orderings.
    """
    n, h, w, c = images.shape
    x = images.astype(dtype)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / jnp.asarray(255.0, dtype)

    def one(rng, img):
        r_crop, r_flip, r_color, r_order = jax.random.split(rng, 4)
        oy, ox, ch, cw = distorted_bounding_box_crop(r_crop, (h, w))
        img = _crop_resize_one(img, oy, ox, ch, cw, height, width, resize_method)
        img = jnp.where(jax.random.bernoulli(r_flip), img[:, ::-1, :], img)
        img = distort_color(r_color, r_order, img, fast_mode=fast_mode)
        return jnp.clip(img, 0.0, 1.0) * 2.0 - 1.0

    return jax.vmap(one)(jax.random.split(rng, n), x)


def rgb_to_hsv(img: jax.Array) -> jax.Array:
    """RGB [..., 3] in [0,1] -> HSV, matching tf.image.rgb_to_hsv."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h_r = ((g - b) / safe_d) % 6.0
    h_g = (b - r) / safe_d + 2.0
    h_b = (r - g) / safe_d + 4.0
    h = jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b)) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(img: jax.Array) -> jax.Array:
    """HSV [..., 3] -> RGB, matching tf.image.hsv_to_rgb."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    c = s * v
    m = v - c
    dh = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(dh % 2.0 - 1.0))
    idx = dh.astype(jnp.int32) % 6
    r = jnp.choose(idx, [c, x, jnp.zeros_like(c), jnp.zeros_like(c), x, c],
                   mode="clip")
    g = jnp.choose(idx, [x, c, c, x, jnp.zeros_like(c), jnp.zeros_like(c)],
                   mode="clip")
    b = jnp.choose(idx, [jnp.zeros_like(c), jnp.zeros_like(c), x, c, c, x],
                   mode="clip")
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def _adjust_brightness(img, delta):
    return img + delta


def _adjust_saturation(rng, img, lower=0.5, upper=1.5):
    # Exact HSV scaling, same as tf.image.adjust_saturation (a linear luma
    # lerp drifts up to ~0.26 on saturated colors — measured vs TF).
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    return hsv_to_rgb(hsv)


def _adjust_hue(rng, img, max_delta=0.2):
    # Exact HSV hue rotation, same as tf.image.adjust_hue.
    delta = jax.random.uniform(rng, (), minval=-max_delta, maxval=max_delta)
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return hsv_to_rgb(hsv)


def _adjust_contrast(rng, img, lower=0.5, upper=1.5):
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return mean + (img - mean) * factor


def distort_color(rng: jax.Array, order_rng: jax.Array, img: jax.Array,
                  fast_mode: bool = True) -> jax.Array:
    """slim distort_color: one of 2 (fast) / 4 orderings of brightness /
    saturation / hue / contrast adjustments, chosen at random per image."""
    r = jax.random.split(rng, 4)
    bright = lambda im: _adjust_brightness(
        im, jax.random.uniform(r[0], (), minval=-32.0 / 255.0, maxval=32.0 / 255.0))
    sat = lambda im: _adjust_saturation(r[1], im)
    hue = lambda im: _adjust_hue(r[2], im)
    contrast = lambda im: _adjust_contrast(r[3], im)

    if fast_mode:
        branches = [
            lambda im: sat(bright(im)),
            lambda im: bright(sat(im)),
        ]
    else:
        branches = [
            lambda im: contrast(hue(sat(bright(im)))),
            lambda im: hue(contrast(bright(sat(im)))),
            lambda im: bright(sat(contrast(hue(im)))),
            lambda im: sat(bright(contrast(hue(im)))),
        ]
    idx = jax.random.randint(order_rng, (), 0, len(branches))
    return jax.lax.switch(idx, branches, img)
