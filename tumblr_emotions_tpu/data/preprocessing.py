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


def preprocess_for_eval_s2d(images: jax.Array, height: int = 299,
                            width: int = 299,
                            central_fraction: float = 0.875,
                            resize_method: str = "tf1",
                            dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """`preprocess_for_eval` emitting the 2x2 space-to-depth layout directly.

    Returns [N, ceil(height/2), ceil(width/2), 4C] such that
    ``space_to_depth_2x2(preprocess_for_eval(images))`` holds (channel
    order (dy, dx, c); odd height/width zero-padded at the end) — the
    input layout of the quantized engine's ``stem_s2d`` conv.  Instead of
    resizing then relayouting (the relayout measured ~0.7 ms at B=768,
    docs/PERFORMANCE.md round 3), the row/col interpolation matrices are
    reshaped to [out/2, 2, in] so the two resize einsums PRODUCE the
    (dy, dx) parity planes as separate minor output dims and the final
    merge [2, 2, C] -> 4C is a free minor-dim reshape.  Same FLOPs, same
    math (einsum contraction order differs, so bf16/f32 rounding can
    differ by ~1 ulp from the non-s2d path).  Serving/bench path only;
    the parity path keeps ``preprocess_for_eval``.
    """
    n, h, w, c = images.shape
    x = images.astype(dtype)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / jnp.asarray(255.0, dtype)
    if central_fraction and central_fraction < 1.0:
        oh, ow, ch, cw = central_crop_sizes(h, w, central_fraction)
        x = jax.lax.slice(x, (0, oh, ow, 0), (n, oh + ch, ow + cw, c))
        h, w = ch, cw
    rh = _interp_matrix_cached(height, h, resize_method)
    rw = _interp_matrix_cached(width, w, resize_method)
    ph, pw = -height % 2, -width % 2
    rh3 = jnp.asarray(np.pad(rh, ((0, ph), (0, 0)))
                      .reshape((height + ph) // 2, 2, h), dtype)
    rw3 = jnp.asarray(np.pad(rw, ((0, pw), (0, 0)))
                      .reshape((width + pw) // 2, 2, w), dtype)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.einsum("idh,nhwc->nidwc", rh3, x, precision=prec)
    z = jnp.einsum("jew,nidwc->nijdec", rw3, y, precision=prec)
    z = z.reshape(n, (height + ph) // 2, (width + pw) // 2, 4 * c)
    # Note on the odd-size zero pad: space_to_depth_2x2 pads with 0.0
    # while the (x*2 - 1) epilogue here turns the padded parity plane
    # into -1.0.  That plane is INERT — the s2d-rearranged kernel's
    # padded taps are exactly zero (int8 zero after quantization), so
    # conv results are bit-identical either way; only a direct tensor
    # comparison against space_to_depth_2x2(preprocess_for_eval(x)) must
    # skip the padded lanes (tests/test_quant.py does).
    return z * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Training-time distortions (slim preprocess_for_train).
# ---------------------------------------------------------------------------

def distorted_bounding_box_crop(
        rng: jax.Array, image_hw: Tuple[int, int],
        min_object_covered: float = 0.1,
        aspect_ratio_range: Tuple[float, float] = (0.75, 1.333),
        area_range: Tuple[float, float] = (0.05, 1.0),
        max_attempts: int = 100) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample a crop window with tf.image.sample_distorted_bounding_box
    semantics (slim's train crop passes the whole image as the bbox).

    Faithful to TF's C++ sampler: aspect ratio drawn UNIFORMLY over the
    range, integer crop height drawn uniformly over the band of heights
    whose round-half-even width keeps the crop area inside ``area_range``,
    ±1-row corrections for rounding drift, and the ``min_object_covered``
    overlap constraint — with the full-image bbox this is
    crop_area / image_area >= min_object_covered, so with the slim defaults
    (covered=0.1, area_range=(0.05, 1.0)) sub-10%-area crops are REJECTED.
    Falls back to the whole image when no attempt satisfies the
    constraints, exactly like TF.

    Returns (offset_y, offset_x, crop_h, crop_w) as traced int32 scalars.
    Implemented as a fixed-trip rejection sampler under ``lax`` control flow
    (static shapes; no data-dependent Python branching — XLA-friendly).
    """
    h, w = image_hw
    area = float(h * w)
    min_area = area_range[0] * area
    max_area = area_range[1] * area

    def attempt(rng):
        r_ar, r_h, r_y, r_x = jax.random.split(rng, 4)
        ar = jax.random.uniform(r_ar, (), minval=aspect_ratio_range[0],
                                maxval=aspect_ratio_range[1])

        def rw(height):  # round-half-even width, like TF's lrintf
            return jnp.round(height.astype(jnp.float32) * ar).astype(jnp.int32)

        ch = jnp.round(jnp.sqrt(min_area / ar)).astype(jnp.int32)
        max_h = jnp.round(jnp.sqrt(max_area / ar)).astype(jnp.int32)
        # Shrink max_h until its rounded width fits inside the image.
        alt = jnp.floor((w + 0.5 - 1e-7) / ar).astype(jnp.int32)
        alt = jnp.where(rw(alt) > w, alt - 1, alt)
        max_h = jnp.where(rw(max_h) > w, alt, max_h)
        max_h = jnp.minimum(max_h, h)
        ch = jnp.minimum(ch, max_h)
        ch = ch + jax.random.randint(r_h, (), 0, jnp.maximum(max_h - ch + 1, 1))
        cw = rw(ch)
        # ±1-row area corrections, then the validity test (TF order).
        low = (cw * ch).astype(jnp.float32) < min_area
        ch = jnp.where(low, ch + 1, ch)
        cw = jnp.where(low, rw(ch), cw)
        high = (cw * ch).astype(jnp.float32) > max_area
        ch = jnp.where(high, ch - 1, ch)
        cw = jnp.where(high, rw(ch), cw)
        crop_area = (cw * ch).astype(jnp.float32)
        generated = ((crop_area >= min_area) & (crop_area <= max_area)
                     & (cw <= w) & (ch <= h) & (cw > 0) & (ch > 0))
        # Overlap constraint against the (whole-image) bounding box.
        ok = generated & (crop_area / area >= min_object_covered)
        # TF places offsets with Uniform(H - h) — the crop never starts at
        # the very last admissible row unless h == H (quirk retained).
        oy = jnp.where(ch < h,
                       jax.random.randint(r_y, (), 0, jnp.maximum(h - ch, 1)),
                       0)
        ox = jnp.where(cw < w,
                       jax.random.randint(r_x, (), 0, jnp.maximum(w - cw, 1)),
                       0)
        return ok, (oy, ox, jnp.clip(ch, 1, h), jnp.clip(cw, 1, w))

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


def _axis_taps(out_size: int, off, size, in_size: int, method: str):
    """Per-axis gather indices + weights for a dynamic crop-and-resize.

    Returns (idx [out, K] int32 absolute input coords, w [out, K] f32) such
    that output[o] = sum_k w[o, k] * input[idx[o, k]].  ``off``/``size`` are
    traced crop parameters; ``in_size`` is the static full-image extent,
    which bounds the tap count K for the "area" method.
    """
    scale = size.astype(jnp.float32) / out_size
    o = jnp.arange(out_size, dtype=jnp.float32)

    if method == "nearest":
        # TF1 legacy ResizeNearestNeighbor: in = min(floor(o*scale), size-1).
        src = o * scale
        idx = jnp.minimum(jnp.floor(src), size.astype(jnp.float32) - 1)
        idx = idx.astype(jnp.int32) + off
        return idx[:, None], jnp.ones((out_size, 1), jnp.float32)

    if method in ("tf1", "half_pixel", "bilinear"):
        src = o * scale
        if method == "half_pixel":
            src = (o + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, size.astype(jnp.float32) - 1.0)
        lo = jnp.floor(src)
        frac = src - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        idx = jnp.stack([lo, hi], axis=-1) + off
        wts = jnp.stack([1.0 - frac, frac], axis=-1)
        return idx, wts

    if method == "bicubic":
        # TF1 legacy ResizeBicubic: Keys kernel A=-0.75, 4 taps at
        # floor(src)-1..+2, each clamped to the valid range.  (TF quantizes
        # coefficients through a 1024-entry table; analytic weights here
        # agree to ~1e-3 — test tolerance reflects that.)
        a = -0.75
        src = o * scale
        p = jnp.floor(src)
        t = src - p
        p = p.astype(jnp.int32)

        def edge(s):   # 1 < |s| <= 2
            return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

        def center(s):  # |s| <= 1
            return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

        wts = jnp.stack([edge(1.0 + t), center(t), center(1.0 - t),
                         edge(2.0 - t)], axis=-1)
        taps = jnp.stack([p - 1, p, p + 1, p + 2], axis=-1)
        idx = jnp.clip(taps, 0, size - 1) + off
        return idx, wts

    if method == "area":
        # TF1 ResizeArea: output cell o averages input cells overlapping
        # [o*scale, (o+1)*scale), weighted by overlap length, normalized by
        # 1/scale per axis.  K is bounded by the worst-case (full-image
        # crop) downscale factor — static, so shapes stay static.
        k_taps = int(np.ceil(in_size / out_size)) + 2
        start = o * scale
        end = (o + 1.0) * scale
        base = jnp.floor(start)
        i = base[:, None] + jnp.arange(k_taps, dtype=jnp.float32)[None, :]
        wts = jnp.clip(jnp.minimum(i + 1.0, end[:, None])
                       - jnp.maximum(i, start[:, None]), 0.0, None)
        wts = wts / scale
        idx = jnp.clip(i.astype(jnp.int32), 0, size - 1) + off
        return idx, wts

    raise ValueError(f"unknown resize method {method!r}")


def _crop_resize_one(image: jax.Array, oy, ox, ch, cw, height: int, width: int,
                     method: str) -> jax.Array:
    """Dynamic crop + resize for one [H,W,C] image with traced crop params.

    Dynamic crop sizes can't change the traced shape, so the crop+resize pair
    is expressed as a single dynamic interpolation: for output row o we sample
    source row oy + o*(ch/out_h) (TF1 grid) with the method's tap weights;
    static output shape [height, width, C].  Methods: "tf1" (legacy
    bilinear), "half_pixel" (TF2 bilinear), "nearest", "bicubic", "area" —
    the four cases slim's apply_with_random_selector rotates through.
    """
    h, w, c = image.shape
    yidx, yw = _axis_taps(height, oy, ch, h, method)
    xidx, xw = _axis_taps(width, ox, cw, w, method)
    # [out_h, Ky, W, C] gather -> weighted sum over Ky -> [out_h, W, C]
    rows = jnp.take(image, yidx, axis=0)
    rows = jnp.einsum("okwc,ok->owc", rows, yw)
    # [out_h, out_w, Kx, C] gather -> weighted sum over Kx.
    cols = jnp.take(rows, xidx, axis=1)
    return jnp.einsum("opkc,pk->opc", cols, xw)


def _crop_resize_matrix(out_size: int, off: jax.Array, size: jax.Array,
                        in_size: int, method: str) -> jax.Array:
    """Dense [N, out_size, in_size] interpolation matrices for per-image
    dynamic crop+resize — the linear-operator form of ``_axis_taps``.

    TPU-first: gathers with per-image indices don't touch the MXU and
    measured ~15x slower than the whole fwd+bwd pass; expressing the SAME
    taps as dense matrices built elementwise (bilinear weight at column i
    is just ``relu(1 - |i - src(o)|)``) turns the resize into two batched
    MXU matmuls.  ``off``/``size`` are [N] traced crop params; weights are
    identical to the tap form (same f32 grid math), so the method-vs-TF
    parity tests transfer.
    """
    n = off.shape[0]
    scale = size.astype(jnp.float32) / out_size                    # [N]
    o = jnp.arange(out_size, dtype=jnp.float32)                    # [out]
    i = jnp.arange(in_size, dtype=jnp.float32)                     # [in]
    offf = off.astype(jnp.float32)

    if method in ("tf1", "half_pixel", "bilinear"):
        src = o[None, :] * scale[:, None]
        if method == "half_pixel":
            src = (o[None, :] + 0.5) * scale[:, None] - 0.5
        src = jnp.clip(src, 0.0, size.astype(jnp.float32)[:, None] - 1.0)
        src = src + offf[:, None]                                  # [N,out]
        return jnp.maximum(0.0, 1.0 - jnp.abs(i[None, None, :]
                                              - src[:, :, None]))

    if method == "nearest":
        idx = jnp.minimum(jnp.floor(o[None, :] * scale[:, None]),
                          size.astype(jnp.float32)[:, None] - 1)
        idx = idx + offf[:, None]
        return (i[None, None, :] == idx[:, :, None]).astype(jnp.float32)

    if method == "bicubic":
        a = -0.75
        src = o[None, :] * scale[:, None]                          # [N,out]
        p = jnp.floor(src)
        t = src - p

        def edge(s):
            return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

        def center(s):
            return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

        wts = [edge(1.0 + t), center(t), center(1.0 - t), edge(2.0 - t)]
        hi = size.astype(jnp.float32)[:, None] - 1.0
        m = jnp.zeros((n, out_size, in_size), jnp.float32)
        for k in range(4):  # accumulate [N,out,in] per tap: no K axis in HBM
            tap = jnp.clip(p + (k - 1), 0.0, hi) + offf[:, None]
            m = m + wts[k][:, :, None] * (
                i[None, None, :] == tap[:, :, None]).astype(jnp.float32)
        return m

    if method == "area":
        start = o[None, :] * scale[:, None]                        # [N,out]
        end = (o[None, :] + 1.0) * scale[:, None]
        i_rel = i[None, None, :] - offf[:, None, None]             # [N,1,in]
        overlap = (jnp.minimum(i_rel + 1.0, end[:, :, None])
                   - jnp.maximum(i_rel, start[:, :, None]))
        return jnp.clip(overlap, 0.0, None) / scale[:, None, None]

    raise ValueError(f"unknown resize method {method!r}")


def _crop_resize_batch(images: jax.Array, oy, ox, ch, cw,
                       height: int, width: int, method: str,
                       flip: jax.Array = None, in_scale: float = 1.0,
                       dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Batched dynamic crop+resize as two MXU einsums; [N,H,W,C] ->
    [N,height,width,C].  ``flip`` ([N] bool) reverses output columns by
    row-reversing the width matrix (a permutation — bitwise-identical to
    flipping afterwards, but free).  ``in_scale`` folds the uint8 ->
    [0,1] division into the row matrix, saving a full-resolution
    elementwise pass."""
    n, h, w, c = images.shape
    my = _crop_resize_matrix(height, oy, ch, h, method)
    mx = _crop_resize_matrix(width, ox, cw, w, method)
    if flip is not None:
        mx = jnp.where(flip[:, None, None], mx[:, ::-1, :], mx)
    if in_scale != 1.0:
        my = my * jnp.float32(in_scale)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = images.astype(dtype)
    x = jnp.einsum("noh,nhwc->nowc", my.astype(dtype), x, precision=prec)
    x = jnp.einsum("npw,nowc->nopc", mx.astype(dtype), x, precision=prec)
    return x


def preprocess_for_train(rng: jax.Array, images: jax.Array,
                         height: int = 299, width: int = 299,
                         resize_method: str = "tf1",
                         fast_mode: bool = True,
                         dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """slim preprocess_for_train over a batch: distorted crop, resize,
    random flip, color distortion, scale to [-1, 1].

    ``fast_mode`` (slim's default for train throughput) restricts color
    distortion to brightness+saturation orderings and resizes with a single
    method; full mode rotates the resize through slim's 4
    ``apply_with_random_selector`` cases (bilinear / nearest / bicubic /
    area) chosen uniformly per image.

    All stages are batched and elementwise/MXU (no per-image gathers, no
    HSV round trips in fast mode) — measured 15x faster fused into the
    train step than the per-image gather form (docs/PERFORMANCE.md).
    """
    n, h, w, c = images.shape
    r_crop, r_resize, r_flip, r_color = jax.random.split(rng, 4)

    oy, ox, ch, cw = jax.vmap(
        lambda k: distorted_bounding_box_crop(k, (h, w)))(
            jax.random.split(r_crop, n))
    flip = jax.random.bernoulli(r_flip, shape=(n,))
    in_scale = (1.0 / 255.0
                if jnp.issubdtype(images.dtype, jnp.integer) else 1.0)

    resize_cases = ([resize_method] if fast_mode
                    else [resize_method, "nearest", "bicubic", "area"])
    if len(resize_cases) == 1:
        x = _crop_resize_batch(images, oy, ox, ch, cw, height, width,
                               resize_cases[0], flip=flip,
                               in_scale=in_scale, dtype=dtype)
    else:
        # Per-image method choice selects between the (cheap) [N,out,in]
        # MATRICES, not between 4 resized outputs.
        case = jax.random.randint(r_resize, (n,), 0, len(resize_cases))
        mys, mxs = [], []
        for m in resize_cases:
            mys.append(_crop_resize_matrix(height, oy, ch, h, m))
            mxs.append(_crop_resize_matrix(width, ox, cw, w, m))
        sel = lambda ms: jnp.select(
            [case[:, None, None] == k for k in range(len(ms))], ms)
        my, mx = sel(mys), sel(mxs)
        mx = jnp.where(flip[:, None, None], mx[:, ::-1, :], mx)
        my = my * jnp.float32(in_scale)
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        x = images.astype(dtype)
        x = jnp.einsum("noh,nhwc->nowc", my.astype(dtype), x,
                       precision=prec)
        x = jnp.einsum("npw,nowc->nopc", mx.astype(dtype), x,
                       precision=prec)

    if fast_mode:
        x = _distort_color_fast_batch(r_color, x)
    else:
        x = _distort_color_full_batch(r_color, x)
    return jnp.clip(x, 0.0, 1.0) * 2.0 - 1.0


def _saturate(img: jax.Array, factor: jax.Array) -> jax.Array:
    """tf.image.adjust_saturation as pure elementwise math (no HSV round
    trip): scaling s by f in HSV keeps value mx and hue fixed, so every
    channel moves toward mx by the chroma ratio min(f, mx/d) (the min is
    the s<=1 clip).  Exact — see the TF-match test."""
    im = jnp.clip(img, 0.0, 1.0)
    mx = jnp.max(im, axis=-1, keepdims=True)
    d = mx - jnp.min(im, axis=-1, keepdims=True)
    ratio = jnp.minimum(factor, mx / jnp.where(d > 0, d, 1.0))
    return jnp.where(d > 0, mx - ratio * (mx - im), im)


def _distort_color_fast_batch(rng: jax.Array, x: jax.Array) -> jax.Array:
    """Batched slim fast-mode color distortion: per-image random
    brightness delta + saturation factor, in one of the two orders."""
    n = x.shape[0]
    r_b, r_s, r_o = jax.random.split(rng, 3)
    delta = jax.random.uniform(r_b, (n, 1, 1, 1), minval=-32.0 / 255.0,
                               maxval=32.0 / 255.0).astype(x.dtype)
    factor = jax.random.uniform(r_s, (n, 1, 1, 1), minval=0.5,
                                maxval=1.5).astype(x.dtype)
    order = jax.random.bernoulli(r_o, shape=(n, 1, 1, 1))
    a = _saturate(x + delta, factor)           # bright then saturate
    b = _saturate(x, factor) + delta           # saturate then bright
    return jnp.where(order, a, b)


def _hue_rotate(img: jax.Array, delta: jax.Array) -> jax.Array:
    """tf.image.adjust_hue with a per-image [N,1,1] delta, elementwise."""
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + delta) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def _contrast(img: jax.Array, factor: jax.Array) -> jax.Array:
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return mean + (img - mean) * factor


def _distort_color_full_batch(rng: jax.Array, x: jax.Array) -> jax.Array:
    """Batched slim full-mode color distortion: brightness / saturation /
    hue / contrast in one of 4 orders per image.  All four order chains
    are computed elementwise and selected — under vmap+switch all branches
    execute anyway, but the per-image HSV/scatter form measured ~8 s/batch
    where this takes milliseconds (docs/PERFORMANCE.md)."""
    n = x.shape[0]
    r_b, r_s, r_h, r_c, r_o = jax.random.split(rng, 5)
    delta = jax.random.uniform(r_b, (n, 1, 1, 1), minval=-32.0 / 255.0,
                               maxval=32.0 / 255.0).astype(x.dtype)
    sat_f = jax.random.uniform(r_s, (n, 1, 1, 1), minval=0.5,
                               maxval=1.5).astype(x.dtype)
    hue_d = jax.random.uniform(r_h, (n, 1, 1), minval=-0.2,
                               maxval=0.2).astype(x.dtype)
    con_f = jax.random.uniform(r_c, (n, 1, 1, 1), minval=0.5,
                               maxval=1.5).astype(x.dtype)
    case = jax.random.randint(r_o, (n, 1, 1, 1), 0, 4)

    bright = lambda im: im + delta
    sat = lambda im: _saturate(im, sat_f)
    hue = lambda im: _hue_rotate(im, hue_d)
    con = lambda im: _contrast(im, con_f)

    chains = [con(hue(sat(bright(x)))),
              hue(con(bright(sat(x)))),
              bright(sat(con(hue(x)))),
              sat(bright(con(hue(x))))]
    return jnp.select([case == k for k in range(3)], chains[:3], chains[3])


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
    """HSV [..., 3] -> RGB, matching tf.image.hsv_to_rgb.

    Select chains, not ``jnp.choose`` — choose lowers to a gather, which
    is catastrophically slow on TPU inside a vmapped/batched pipeline."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    c = s * v
    m = v - c
    dh = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(dh % 2.0 - 1.0))
    idx = dh.astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    sectors = [idx == k for k in range(5)]  # sector 5 is each select's default
    r = jnp.select(sectors, [c, x, z, z, x], c)
    g = jnp.select(sectors, [x, c, c, x, z], z)
    b = jnp.select(sectors, [z, z, x, c, c], x)
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
