"""int8 post-training-quantized Inception-v3 serving engine.

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate, and int8
activations halve HBM traffic (the measured bottleneck of the bf16 engine:
chained-conv microbenchmarks reach 100-160 TF/s while the full tower
sustained ~45 TF/s, i.e. the tower is bandwidth/epilogue-bound).  This
engine quantizes every conv:

- **Weights**: per-output-channel symmetric int8 over the BN-folded kernels
  (``w_q[..., c] = round(w[..., c] / s_w[c])``, ``s_w[c] = max|w[..., c]|/127``).
- **Activations**: per-tensor symmetric int8 with STATIC scales from a
  one-shot calibration pass (max |activation| at every conv input site over
  a user-supplied batch).  Static scales let the requantization fuse into
  the conv epilogue, so each activation is written to HBM once, as int8.
- **Epilogue** (fused by XLA into the conv): ``q = clip(round(max(y_i32 *
  m[c] + b[c], 0)))`` where ``m = s_x * s_w / s_out`` — one VPU
  multiply-add chain, no separate dequant/requant passes.

The tower topology is written ONCE (``_tower``) against an abstract op set
and interpreted twice: ``_CalibOps`` (bf16 compute, records per-site maxima)
and ``_Int8Ops`` (quantized compute).  Branch packing follows
ops/inference.py: the 3-4 parallel 1x1 convs opening each Inception block
run as one conv, and the avg-pool branch pools the pre-activation slice
(1x1 conv + bias commutes with count_include_pad=False average pooling).

This is the bf16-beating serving mode; the parity contract (1e-4 vs the
slim reference graph, SURVEY.md §6) is still owned by the f32 Flax model —
use the accuracy-delta harness (``quantization_delta``) to validate int8
against bf16 on real data before serving with it.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tumblr_emotions_tpu.ops.fused_inception import fold_batchnorm

_INT8_MIN, _INT8_MAX = -127.0, 127.0

# Sentinel for ``out_key``: requantize to the conv's own scope key.  An
# explicit ``None`` means "dequantize to the float dtype" (final block).
_SELF = "_SELF"


def _channel_quantize(w: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: (w_q, s_w) with
    s_w[c] = max|w[..., c]|/127 (zero channels get scale 1)."""
    w = np.asarray(w, np.float32)
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = np.where(s_w == 0.0, 1.0, s_w).astype(np.float32)
    w_q = np.clip(np.round(w / s_w), _INT8_MIN, _INT8_MAX).astype(np.int8)
    return w_q, s_w


def quantize_weights(folded: Dict[str, Tuple[np.ndarray, np.ndarray]]
                     ) -> Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-output-channel symmetric int8 quantization of folded conv kernels.

    Returns {scope: (w_q int8 [kh,kw,Cin,Cout], s_w f32 [Cout], b f32 [Cout])}.
    """
    out = {}
    for scope, (w, b) in folded.items():
        w_q, s_w = _channel_quantize(w)
        out[scope] = (w_q, s_w, np.asarray(b, np.float32))
    return out


def _conv_raw(x, w, strides, padding, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def _space_to_depth_2x2(x):
    """[B,H,W,C] -> [B,ceil(H/2),ceil(W/2),4C]; odd H/W zero-pad at the end.

    MLPerf-style input transform for the stride-2 stem conv: a kxk stride-2
    conv over [H,W,C] equals a ceil(k/2) x ceil(k/2) stride-1 conv over the
    2x2-space-to-depth layout with the kernel rearranged by
    ``_s2d_kernel`` — exact math (the padded row/col only meets zero
    kernel taps).  Merged channel order is (dy, dx, c).
    """
    b, h, w, c = x.shape
    ph, pw = -h % 2, -w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    x = x.reshape(b, (h + ph) // 2, 2, (w + pw) // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h + ph) // 2, (w + pw) // 2, 4 * c)


def _s2d_kernel(w: np.ndarray) -> np.ndarray:
    """Rearrange a [kh,kw,C,O] stride-2 kernel for the space-to-depth
    input layout: [ceil(kh/2), ceil(kw/2), 4C, O], channel order
    (dy, dx, c), padded taps zero.  Applied to the already-quantized int8
    kernel so the transform is bit-exact (zeros are exactly
    representable)."""
    kh, kw, c, o = w.shape
    ph, pw = -kh % 2, -kw % 2
    wp = np.zeros((kh + ph, kw + pw, c, o), w.dtype)
    wp[:kh, :kw] = w
    w2 = wp.reshape((kh + ph) // 2, 2, (kw + pw) // 2, 2, c, o)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape((kh + ph) // 2, (kw + pw) // 2, 4 * c, o)


def _maxpool(x, window=(3, 3), strides=(2, 2), padding="VALID"):
    # (Measured: casting int8 -> bf16 for the pool wins ~0.6 ms in
    # isolation but is a wash inside the full engine program — XLA already
    # schedules the int8 reduce_window well in context.  Keep the direct
    # form.)
    init = np.asarray(jnp.iinfo(x.dtype).min, x.dtype) \
        if jnp.issubdtype(x.dtype, jnp.integer) else np.asarray(-np.inf, x.dtype)
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1,) + window + (1,), (1,) + strides + (1,),
        padding)


def _avgpool_3x3_same(x):
    """3x3 stride-1 SAME average pool, count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    s = jax.lax.reduce_window(x, jnp.asarray(0, x.dtype), jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    n = jax.lax.reduce_window(ones, jnp.asarray(0, x.dtype), jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / n


class _CalibOps:
    """bf16 interpretation that records per-site activation ranges.

    ``quantile=None`` records the exact max |activation| (safe: nothing
    clips).  A quantile like 0.9995 records that quantile of |activation|
    over a strided subsample instead — standard PTQ outlier clipping:
    rare spikes stop inflating the scale (so typical values keep more of
    the 7-bit range) and the epilogue's clamp saturates the outliers.
    """

    def __init__(self, folded, dtype=jnp.bfloat16, quantile=None):
        self.folded = folded
        self.dtype = dtype
        self.quantile = quantile
        self.maxima: Dict[str, jax.Array] = {}

    def _record(self, key: str, t: jax.Array) -> None:
        a = jnp.abs(t.astype(jnp.float32))
        if self.quantile is None:
            m = jnp.max(a)
        else:
            # Strided subsample bounds the sort cost on the big stem
            # tensors; calibration runs once so exactness is not critical.
            flat = a.ravel()
            m = jnp.quantile(flat[:: max(1, flat.size // 1_000_000)],
                             self.quantile)
        self.maxima[key] = jnp.maximum(self.maxima[key], m) \
            if key in self.maxima else m

    def stem_in(self, x):
        x = x.astype(self.dtype)
        self._record("input", x)
        return x

    def conv(self, t, scope, out_key=_SELF, strides=(1, 1), padding="VALID"):
        w, b = self.folded[scope]
        y = _conv_raw(t.astype(self.dtype), jnp.asarray(w, self.dtype),
                      strides, padding, jnp.float32)
        y = jnp.maximum(y + jnp.asarray(b, jnp.float32), 0.0)
        key = scope if out_key is _SELF else out_key
        if key is not None:
            self._record(key, y)
        return y.astype(self.dtype)

    def packed(self, t, scopes: Sequence[str],
               out_keys: Optional[Sequence[Optional[str]]] = None):
        ws = [self.folded[s][0] for s in scopes]
        w = np.concatenate(ws, axis=-1)
        b = np.concatenate([self.folded[s][1] for s in scopes])
        y = _conv_raw(t.astype(self.dtype), jnp.asarray(w, self.dtype),
                      (1, 1), "SAME", jnp.float32)
        y = y + jnp.asarray(b, jnp.float32)
        outs, off = [], 0
        for wi in ws:
            outs.append(y[..., off:off + wi.shape[-1]])
            off += wi.shape[-1]
        return outs

    def act(self, pre, out_key):
        y = jnp.maximum(pre, 0.0)
        if out_key is not None:
            self._record(out_key, y)
        return y.astype(self.dtype)

    def pool_act(self, pre, out_key):
        if out_key is not None:
            # Signed PRE-pool range: lets _Int8Ops requantize the pool
            # branch to int8 before the average (pool_mode="int8"), so
            # the conv->pool edge is 1 byte instead of 4.
            self._record(f"{out_key}:poolpre", pre)
        y = jnp.maximum(_avgpool_3x3_same(pre), 0.0)
        if out_key is not None:
            self._record(out_key, y)
        return y.astype(self.dtype)

    def maxpool(self, t, out_key=None, window=(3, 3), strides=(2, 2)):
        y = _maxpool(t, window, strides)
        if out_key is not None:
            self._record(out_key, y)
        return y

    def concat(self, ts, out_key=None):
        y = jnp.concatenate(ts, axis=-1)
        if out_key is not None:
            self._record(out_key, y)
        return y

    def finish(self, t):
        return t.astype(jnp.float32)


class _Int8Ops:
    """int8 interpretation: tensors flow as (q int8, scale float).

    Weight quantization happens lazily at trace time because the requant
    epilogue depends on the calibrated (s_x, s_out) pair of each conv site:

    - ``epilogue="f32"``: per-channel ideal weight scales; requant is
      ``clip(y_i32 * m + b', 0, 127)`` in f32 (m = s_x*s_w/s_out; +0.5
      rides the bias so the final truncating convert rounds).
    - ``epilogue="shift"``: weight scales are constrained per channel to
      make m an exact power of two (s_w' in [s_w, 2*s_w) — costs <= 1 bit
      of weight precision), so the requant is fully integer:
      ``clamp((y + b_i) >> k_c, 0, 127)`` — measured ~0.5 ms cheaper per
      large-tensor conv than the f32 form.  Channels where the constraint
      would need a left shift (m > 1) fall back to f32 per conv.
    """

    def __init__(self, folded, scales: Dict[str, float], dtype=jnp.bfloat16,
                 epilogue: str = "f32", stem_s2d=False,
                 pool_mode: str = "f32"):
        self.folded = folded
        self.scales = scales
        self.dtype = dtype  # dtype of dequantized (non-int8) outputs
        self.epilogue = epilogue
        self.stem_s2d = stem_s2d
        self.pool_mode = pool_mode
        # scope -> epilogue kind actually chosen at trace time ("shift" |
        # "f32" | "dequant").  The shift constraint (0 <= k <= 24 on every
        # channel) depends on the WEIGHT distribution, so the fallback rate
        # on trained weights can differ from random-init towers — the
        # quantization_delta harness reports it (VERDICT r4 weak #3).
        self.epilogue_kinds: Dict[str, str] = {}

    def _quantize(self, y_f32, out_key):
        # Signed values: keep an explicit round (cheap only on the stem
        # input, the single signed tensor in the network).
        s = self.scales[out_key]
        q = jnp.clip(jnp.round(y_f32 * (1.0 / s)), _INT8_MIN, _INT8_MAX)
        return q.astype(jnp.int8), s

    def stem_in(self, x):
        if isinstance(x, tuple):  # already quantized (int8 preprocess path)
            return x
        return self._quantize(x.astype(jnp.float32), "input")

    def _weights(self, scope, s_x, out_key):
        """(w_q int8, epilogue constants) for one conv site (numpy, traced
        as constants)."""
        w, b = self.folded[scope]
        w = np.asarray(w, np.float32)
        w_q, s_w = _channel_quantize(w)
        if out_key is None:
            self.epilogue_kinds[scope] = "dequant"
            return w_q, ("dequant", s_x * s_w, np.asarray(b, np.float32))
        s_out = self.scales[out_key]
        m = s_x * s_w / s_out
        k = np.floor(-np.log2(np.maximum(m, 1e-30))).astype(np.int32)
        # Shift mode needs 0 <= k <= 24: k < 0 would be a left shift
        # (m > 1), and large k risks overflowing the int32 bias term
        # (b_i ~ (b/s_out + 0.5) * 2^k).  Out-of-range channels fall the
        # whole conv back to the f32 epilogue.
        if self.epilogue == "shift" and np.all((k >= 0) & (k <= 24)):
            s_w2 = np.exp2(-k.astype(np.float64)) * s_out / s_x
            w_q = np.clip(np.round(w / s_w2), _INT8_MIN, _INT8_MAX
                          ).astype(np.int8)
            b_i = np.round((np.asarray(b, np.float64) / s_out + 0.5)
                           * np.exp2(k.astype(np.float64)))
            if np.all(np.abs(b_i) < 2**31):
                self.epilogue_kinds[scope] = "shift"
                return w_q, ("shift", b_i.astype(np.int32), k)
        w_q = np.clip(np.round(w / s_w), _INT8_MIN, _INT8_MAX).astype(np.int8)
        self.epilogue_kinds[scope] = "f32"
        return w_q, ("f32", (s_x * s_w / s_out).astype(np.float32),
                     (np.asarray(b, np.float32) / s_out + 0.5)
                     .astype(np.float32))

    def _apply_epilogue(self, y_i32, const, s_out):
        kind = const[0]
        if kind == "shift":
            _, b_i, k = const
            yq = jnp.clip((y_i32 + jnp.asarray(b_i)) >> jnp.asarray(k),
                          0, 127)
            return yq.astype(jnp.int8), s_out
        if kind == "f32":
            _, m, bq = const
            yq = jnp.clip(y_i32.astype(jnp.float32) * jnp.asarray(m)
                          + jnp.asarray(bq), 0.0, _INT8_MAX)
            return yq.astype(jnp.int8), s_out
        _, m, b = const  # dequant
        yf = jnp.maximum(y_i32.astype(jnp.float32) * jnp.asarray(m)
                         + jnp.asarray(b), 0.0)
        return yf.astype(self.dtype)

    def conv(self, t, scope, out_key=_SELF, strides=(1, 1), padding="VALID"):
        q, s_x = t
        out_key = scope if out_key is _SELF else out_key
        w_q, const = self._weights(scope, s_x, out_key)
        y = _conv_raw(q, jnp.asarray(w_q), strides, padding, jnp.int32)
        s_out = self.scales[out_key] if out_key is not None else None
        return self._apply_epilogue(y, const, s_out)

    def conv_s2d(self, t, scope, out_key=_SELF):
        """Stride-2 VALID conv via the 2x2 space-to-depth input layout
        (VERDICT r2 weak #1: attacks the stem's C=3 lane waste by feeding
        the MXU K=12 instead of K=3).  Bit-exact vs ``conv``: the int8
        kernel is rearranged after quantization.

        ``stem_s2d="pre"``: the input arrives ALREADY in s2d layout
        (preprocess_for_eval_s2d emits it straight from the resize
        einsums) so the on-device relayout — the ~0.7 ms that made
        stem_s2d=True a net loss in round 3 — disappears."""
        q, s_x = t
        out_key = scope if out_key is _SELF else out_key
        w_q, const = self._weights(scope, s_x, out_key)
        if self.stem_s2d != "pre":
            q = _space_to_depth_2x2(q)
        y = _conv_raw(q, jnp.asarray(_s2d_kernel(w_q)),
                      (1, 1), "VALID", jnp.int32)
        s_out = self.scales[out_key] if out_key is not None else None
        return self._apply_epilogue(y, const, s_out)

    def packed(self, t, scopes: Sequence[str],
               out_keys: Optional[Sequence[Optional[str]]] = None):
        """One wide 1x1 conv for the parallel branch openers.

        ``out_keys[i]`` is slice i's requant target ("pool" = leave as a
        pre-activation for pool_act; None = dequantize).  Per-slice weight
        quantization means shift-mode constraints apply per branch.
        """
        q, s_x = t
        if out_keys is None:
            out_keys = ["pool"] * len(scopes)
        w_parts, consts = [], []
        for scope, key in zip(scopes, out_keys):
            if key == "pool":
                w, b = self.folded[scope]
                w_q, s_w = _channel_quantize(w)
                consts.append(("pre", (s_x * s_w).astype(np.float32),
                               np.asarray(b, np.float32)))
            else:
                w_q, const = self._weights(scope, s_x, key)
                consts.append(const)
            w_parts.append(w_q)
        y = _conv_raw(q, jnp.asarray(np.concatenate(w_parts, axis=-1)),
                      (1, 1), "SAME", jnp.int32)
        outs, off = [], 0
        for w_q, const, key in zip(w_parts, consts, out_keys):
            n = w_q.shape[-1]
            ys = y[..., off:off + n]
            off += n
            if const[0] == "pre":
                outs.append(("pre", ys, const[1], const[2]))
            else:
                s_out = self.scales[key] if key is not None else None
                outs.append(self._apply_epilogue(ys, const, s_out))
        return outs

    def act(self, pre, out_key):
        if not (isinstance(pre, tuple) and len(pre) == 4 and pre[0] == "pre"):
            return pre  # packed() already applied the epilogue
        _, y, m, b = pre
        if out_key is not None:
            s_out = self.scales[out_key]
            yf = y.astype(jnp.float32) * jnp.asarray(m / s_out) \
                + jnp.asarray(b / s_out + 0.5)
            yq = jnp.clip(yf, 0.0, _INT8_MAX)
            return yq.astype(jnp.int8), s_out
        yf = y.astype(jnp.float32) * jnp.asarray(m) + jnp.asarray(b)
        return jnp.maximum(yf, 0.0).astype(self.dtype)

    def pool_act(self, pre, out_key):
        _, y, m, b = pre
        s_q = (self.scales.get(f"{out_key}:poolpre")
               if out_key is not None else None)
        if out_key is not None and self.pool_mode == "int8" \
                and s_q is not None:
            s_out = self.scales[out_key]
            # Requantize the pre-activation to SIGNED int8 at its own
            # calibrated scale INSIDE the conv epilogue (the downcast
            # fuses into the packed conv), average-pool 1-byte data with
            # an s32 accumulator, then rescale to the block scale with
            # the count_include_pad=False divisor folded in.  One extra
            # rounding vs the f32 pool — covered by quantization_delta.
            yq = jnp.clip(jnp.round(y.astype(jnp.float32)
                                    * jnp.asarray(m / s_q)
                                    + jnp.asarray(b / s_q)),
                          _INT8_MIN, _INT8_MAX).astype(jnp.int8)
            ssum = jax.lax.reduce_window(
                yq.astype(jnp.int32), np.int32(0), jax.lax.add,
                (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
            ones = jnp.ones(yq.shape[1:3], jnp.float32)[None, :, :, None]
            n = jax.lax.reduce_window(ones, np.float32(0), jax.lax.add,
                                      (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
            yf = ssum.astype(jnp.float32) * (jnp.asarray(s_q / s_out) / n) \
                + 0.5
            return jnp.clip(yf, 0.0, _INT8_MAX).astype(jnp.int8), s_out
        if out_key is not None:
            s_out = self.scales[out_key]
            # Pool the pre-activation: 1x1 conv + bias commutes with the
            # count_include_pad=False average; +0.5 is window-invariant.
            yf = y.astype(jnp.float32) * jnp.asarray(m / s_out) \
                + jnp.asarray(b / s_out + 0.5)
            yf = _avgpool_3x3_same(yf)
            yq = jnp.clip(yf, 0.0, _INT8_MAX)
            return yq.astype(jnp.int8), s_out
        yf = y.astype(jnp.float32) * jnp.asarray(m) + jnp.asarray(b)
        yf = _avgpool_3x3_same(yf)
        return jnp.maximum(yf, 0.0).astype(self.dtype)

    def maxpool(self, t, out_key=None, window=(3, 3), strides=(2, 2)):
        q, s = t
        y = _maxpool(q, window, strides)
        if out_key is not None and self.scales[out_key] != s:
            s_out = self.scales[out_key]
            # Values are post-relu (>= 0): trunc(x + 0.5) rounds.
            y = jnp.clip(y.astype(jnp.float32) * (s / s_out) + 0.5,
                         0.0, _INT8_MAX).astype(jnp.int8)
            return y, s_out
        return y, s

    def concat(self, ts, out_key=None):
        if all(isinstance(t, tuple) for t in ts):
            s = ts[0][1]
            assert all(t[1] == s for t in ts), \
                "concat branches must share a requant scale"
            return jnp.concatenate([t[0] for t in ts], axis=-1), s
        return jnp.concatenate(ts, axis=-1)

    def finish(self, t):
        if isinstance(t, tuple):
            return t[0].astype(jnp.float32) * t[1]
        return t.astype(jnp.float32)


def _tower(ops, x, stop_at: Optional[str] = None):
    """Inception-v3 inference topology over an abstract op set.

    Block structure per models/inception_v3.py (slim-scope contract);
    branch-packing per ops/inference.py.  ``stop_at`` returns the
    intermediate tensor after the named stage (profiling hook).
    """
    t = ops.stem_in(x)
    if getattr(ops, "stem_s2d", False):
        t = ops.conv_s2d(t, "Conv2d_1a_3x3")
    else:
        t = ops.conv(t, "Conv2d_1a_3x3", strides=(2, 2))
    t = ops.conv(t, "Conv2d_2a_3x3")
    t = ops.conv(t, "Conv2d_2b_3x3", padding="SAME")
    t = ops.maxpool(t)
    t = ops.conv(t, "Conv2d_3b_1x1")
    t = ops.conv(t, "Conv2d_4a_3x3")
    t = ops.maxpool(t)
    if stop_at == "stem":
        return t

    def inception_a(t, scope, quirky):
        b1n = ("Conv2d_0b_1x1", "Conv_1_0c_5x5") if quirky else \
            ("Conv2d_0a_1x1", "Conv2d_0b_5x5")
        out = f"{scope}/out"
        p0, p1, p2, p3 = ops.packed(t, [
            f"{scope}/Branch_0/Conv2d_0a_1x1",
            f"{scope}/Branch_1/{b1n[0]}",
            f"{scope}/Branch_2/Conv2d_0a_1x1",
            f"{scope}/Branch_3/Conv2d_0b_1x1"],
            out_keys=[out, f"{scope}/b1", f"{scope}/b2", "pool"])
        b0 = ops.act(p0, out)
        b1 = ops.conv(ops.act(p1, f"{scope}/b1"),
                      f"{scope}/Branch_1/{b1n[1]}", out_key=out,
                      padding="SAME")
        b2 = ops.conv(ops.act(p2, f"{scope}/b2"),
                      f"{scope}/Branch_2/Conv2d_0b_3x3", padding="SAME")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0c_3x3", out_key=out,
                      padding="SAME")
        b3 = ops.pool_act(p3, out)
        return ops.concat([b0, b1, b2, b3], out)

    t = inception_a(t, "Mixed_5b", False)
    t = inception_a(t, "Mixed_5c", True)
    t = inception_a(t, "Mixed_5d", False)
    if stop_at == "Mixed_5d":
        return t

    # Mixed_6a reduction
    out = "Mixed_6a/out"
    b0 = ops.conv(t, "Mixed_6a/Branch_0/Conv2d_1a_1x1", out_key=out,
                  strides=(2, 2))
    b1 = ops.conv(t, "Mixed_6a/Branch_1/Conv2d_0a_1x1", padding="SAME")
    b1 = ops.conv(b1, "Mixed_6a/Branch_1/Conv2d_0b_3x3", padding="SAME")
    b1 = ops.conv(b1, "Mixed_6a/Branch_1/Conv2d_1a_1x1", out_key=out,
                  strides=(2, 2))
    b2 = ops.maxpool(t, out_key=out)
    t = ops.concat([b0, b1, b2], out)
    if stop_at == "Mixed_6a":
        return t

    def inception_b(t, scope):
        out = f"{scope}/out"
        p0, p1, p2, p3 = ops.packed(t, [
            f"{scope}/Branch_0/Conv2d_0a_1x1",
            f"{scope}/Branch_1/Conv2d_0a_1x1",
            f"{scope}/Branch_2/Conv2d_0a_1x1",
            f"{scope}/Branch_3/Conv2d_0b_1x1"],
            out_keys=[out, f"{scope}/b1", f"{scope}/b2", "pool"])
        b0 = ops.act(p0, out)
        b1 = ops.act(p1, f"{scope}/b1")
        b1 = ops.conv(b1, f"{scope}/Branch_1/Conv2d_0b_1x7", padding="SAME")
        b1 = ops.conv(b1, f"{scope}/Branch_1/Conv2d_0c_7x1", out_key=out,
                      padding="SAME")
        b2 = ops.act(p2, f"{scope}/b2")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0b_7x1", padding="SAME")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0c_1x7", padding="SAME")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0d_7x1", padding="SAME")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0e_1x7", out_key=out,
                      padding="SAME")
        b3 = ops.pool_act(p3, out)
        return ops.concat([b0, b1, b2, b3], out)

    for scope in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        t = inception_b(t, scope)
    if stop_at == "Mixed_6e":
        return t

    # Mixed_7a reduction
    out = "Mixed_7a/out"
    p0, p1 = ops.packed(t, ["Mixed_7a/Branch_0/Conv2d_0a_1x1",
                            "Mixed_7a/Branch_1/Conv2d_0a_1x1"],
                        out_keys=["Mixed_7a/b0", "Mixed_7a/b1"])
    b0 = ops.conv(ops.act(p0, "Mixed_7a/b0"),
                  "Mixed_7a/Branch_0/Conv2d_1a_3x3", out_key=out,
                  strides=(2, 2))
    b1 = ops.act(p1, "Mixed_7a/b1")
    b1 = ops.conv(b1, "Mixed_7a/Branch_1/Conv2d_0b_1x7", padding="SAME")
    b1 = ops.conv(b1, "Mixed_7a/Branch_1/Conv2d_0c_7x1", padding="SAME")
    b1 = ops.conv(b1, "Mixed_7a/Branch_1/Conv2d_1a_3x3", out_key=out,
                  strides=(2, 2))
    b2 = ops.maxpool(t, out_key=out)
    t = ops.concat([b0, b1, b2], out)
    if stop_at == "Mixed_7a":
        return t

    def inception_c(t, scope, quirky_7c, last):
        out = None if last else f"{scope}/out"
        n31 = "Conv2d_0c_3x1" if quirky_7c else "Conv2d_0b_3x1"
        p0, p1, p2, p3 = ops.packed(t, [
            f"{scope}/Branch_0/Conv2d_0a_1x1",
            f"{scope}/Branch_1/Conv2d_0a_1x1",
            f"{scope}/Branch_2/Conv2d_0a_1x1",
            f"{scope}/Branch_3/Conv2d_0b_1x1"],
            out_keys=[out, f"{scope}/b1", f"{scope}/b2", "pool"])
        b0 = ops.act(p0, out)
        b1 = ops.act(p1, f"{scope}/b1")
        b1 = ops.concat([
            ops.conv(b1, f"{scope}/Branch_1/Conv2d_0b_1x3", out_key=out,
                     padding="SAME"),
            ops.conv(b1, f"{scope}/Branch_1/{n31}", out_key=out,
                     padding="SAME")])
        b2 = ops.act(p2, f"{scope}/b2")
        b2 = ops.conv(b2, f"{scope}/Branch_2/Conv2d_0b_3x3", padding="SAME")
        b2 = ops.concat([
            ops.conv(b2, f"{scope}/Branch_2/Conv2d_0c_1x3", out_key=out,
                     padding="SAME"),
            ops.conv(b2, f"{scope}/Branch_2/Conv2d_0d_3x1", out_key=out,
                     padding="SAME")])
        b3 = ops.pool_act(p3, out)
        return ops.concat([b0, b1, b2, b3], out)

    t = inception_c(t, "Mixed_7b", False, last=False)
    t = inception_c(t, "Mixed_7c", True, last=True)
    return ops.finish(t)


def _quantized_interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """TF1 bilinear interpolation matrix quantized to int8 with EXACT row
    sums of 127, so the resize is an s8 x s8 -> s32 MXU matmul whose output
    divides by exactly 127 per stage (no per-row scale vector)."""
    from tumblr_emotions_tpu.data.preprocessing import _interp_matrix_cached

    m = _interp_matrix_cached(out_size, in_size, "tf1")
    q = np.round(m * 127.0)
    # Each row has <= 2 taps summing to 1.0; force the quantized sum to 127
    # by adjusting the largest tap (error <= half a step).
    for o in range(q.shape[0]):
        idx = np.nonzero(q[o])[0]
        if idx.size == 0:  # degenerate (frac rounded to zero on both taps)
            q[o, np.argmax(m[o])] = 127.0
            idx = np.nonzero(q[o])[0]
        q[o, idx[np.argmax(q[o, idx])]] += 127.0 - q[o].sum()
    assert (q.sum(axis=1) == 127.0).all()
    return q.astype(np.int8)


def preprocess_for_eval_int8(images_u8: jax.Array, input_scale: float,
                             height: int = 299, width: int = 299,
                             central_fraction: float = 0.875
                             ) -> jax.Array:
    """int8-domain slim eval preprocessing for the quantized engine.

    uint8 [N,H,W,C] -> central crop 0.875 -> TF1 bilinear resize as two
    s8 GEMMs -> requantize into the engine's calibrated input scale.  The
    whole pipeline moves 1-byte tensors; the float epilogue folds the
    [0,255] -> [-1,1] normalization AND the input quantization into one
    affine over the final i32 resize output:

        real = (2*pixel/255 - 1), pixel = centered/1 + 128,
        centered_resized = i32 / 127^2
        q_in = round(real / input_scale)

    Resize-matrix quantization adds <= ~1 uint8 level of error — below the
    engine's own input quantization step.  Serving-path only; the f32
    parity path keeps data/preprocessing.py.
    """
    from tumblr_emotions_tpu.data.preprocessing import central_crop_sizes

    n, h, w, c = images_u8.shape
    assert images_u8.dtype == jnp.uint8
    if central_fraction and central_fraction < 1.0:
        oh, ow, ch, cw = central_crop_sizes(h, w, central_fraction)
        images_u8 = jax.lax.slice(images_u8, (0, oh, ow, 0),
                                  (n, oh + ch, ow + cw, c))
    else:
        ch, cw = h, w
    # Center into int8: u8 - 128 fits [-128, 127].
    x = (images_u8.astype(jnp.int16) - 128).astype(jnp.int8)
    rh = jnp.asarray(_quantized_interp_matrix(height, ch))
    rw = jnp.asarray(_quantized_interp_matrix(width, cw))
    y = jnp.einsum("oh,nhwc->nowc", rh, x,
                   preferred_element_type=jnp.int32)
    # Requantize the row-resized intermediate back to int8 (value/127;
    # range [-128, 127] -> clip; signed, so round via sign-aware offset).
    y = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / 127.0)),
                 _INT8_MIN, _INT8_MAX).astype(jnp.int8)
    z = jnp.einsum("pw,nowc->nopc", rw, y,
                   preferred_element_type=jnp.int32)
    # z/127 = centered pixel value in [-128, 127]; real = (2*(z/127+128)/255)-1.
    a = 2.0 / (127.0 * 255.0 * input_scale)
    b = (2.0 * 128.0 / 255.0 - 1.0) / input_scale
    q = jnp.clip(jnp.round(z.astype(jnp.float32) * a + b),
                 _INT8_MIN, _INT8_MAX).astype(jnp.int8)
    return q


class QuantizedInceptionV3:
    """int8-serving Inception-v3 over BN-folded, per-channel-quantized weights.

    Parameters
    ----------
    variables: the Flax model's {"params", "batch_stats"} (image tower at
        the root, as for FusedInceptionV3).
    calibration_images: preprocessed [N, 299, 299, 3] batch (output of
        preprocess_for_eval) used once to fix the static activation scales.
        Serving accuracy depends on it being representative.
    calibration_quantile: None (default) calibrates to the exact max
        |activation|; a value like 0.9995 clips outliers PTQ-style (rare
        spikes saturate instead of inflating every scale).
    stem_s2d: rewrite Conv2d_1a as a 2x2 space-to-depth stride-1 conv
        (bit-exact; tests/test_quant.py).  True: relayout the input on
        device — measured on v5e as a net LOSS (9,187 vs 9,313 img/s; the
        conv win ~0.45 ms < relayout cost ~0.7 ms, docs/PERFORMANCE.md
        r3).  "pre": the caller feeds the s2d layout directly
        (data/preprocessing.preprocess_for_eval_s2d emits it from the
        resize einsums at zero extra cost), keeping the conv win without
        the relayout.  Default off.
    """

    def __init__(self, variables: Dict, calibration_images: jax.Array,
                 dtype=jnp.bfloat16, epilogue: str = "shift",
                 calibration_quantile=None, stem_s2d=False,
                 pool_mode: str = "f32"):
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables.get("batch_stats", {}))
        self.folded = fold_batchnorm(params, stats)
        self.dtype = dtype
        self.epilogue = epilogue
        self.stem_s2d = stem_s2d
        self.pool_mode = pool_mode

        calib = _CalibOps(self.folded, dtype=dtype,
                          quantile=calibration_quantile)

        def run_calib(x):
            _tower(calib, x)
            return calib.maxima

        maxima = jax.jit(run_calib)(jnp.asarray(calibration_images))
        self.scales = {k: max(float(v), 1e-6) / 127.0
                       for k, v in maxima.items()}

    def forward_from_uint8(self, raw_u8: jax.Array, height: int = 299,
                           width: int = 299, central_fraction: float = 0.875
                           ) -> Tuple[Optional[jax.Array], jax.Array]:
        """Decoded uint8 [B,H,W,3] -> int8 eval preprocess -> tower.

        The fastest serving path: central crop, int8-GEMM TF1 resize, and
        normalization+input-quantization fused into one epilogue, so no
        float image tensor ever touches HBM.  The preprocess knobs must
        match the model's eval config (TF1 resize only by construction).
        """
        q = preprocess_for_eval_int8(raw_u8, self.scales["input"],
                                     height=height, width=width,
                                     central_fraction=central_fraction)
        return self((q, self.scales["input"]))

    def __call__(self, x) -> Tuple[Optional[jax.Array], jax.Array]:
        """Preprocessed [B, 299, 299, 3] (float) — or an already-quantized
        ``(int8, scale)`` pair — -> (logits or None, feature [B, 2048])."""
        ops = _Int8Ops(self.folded, self.scales, dtype=self.dtype,
                       epilogue=self.epilogue, stem_s2d=self.stem_s2d,
                       pool_mode=self.pool_mode)
        net = _tower(ops, x)
        # Populated at trace time; what fraction of conv sites kept the
        # integer shift epilogue depends on the weight distribution.
        self.last_epilogue_kinds = dict(ops.epilogue_kinds)
        # Global average pool over min(8, spatial), exactly like
        # FusedInceptionV3 (slim's _reduced_kernel_size_for_small_input):
        # <=8 spatial pools everything; >8 spatial keeps the full windowed
        # pool rather than silently cropping to the top-left 8x8.
        kh = min(8, net.shape[1])
        kw = min(8, net.shape[2])
        if (net.shape[1], net.shape[2]) == (kh, kw):
            feature = jnp.mean(net.astype(jnp.float32), axis=(1, 2))
        else:
            from flax import linen as nn
            feature = jnp.squeeze(
                nn.avg_pool(net.astype(jnp.float32), (kh, kw), (1, 1),
                            "VALID"), axis=(1, 2))
        logits = None
        if "Logits/Conv2d_1c_1x1" in self.folded:
            w, b = self.folded["Logits/Conv2d_1c_1x1"]
            logits = feature @ np.asarray(w, np.float32)[0, 0] + b
        return logits, feature


def quantization_delta(variables: Dict, images: jax.Array,
                       calibration_images: Optional[jax.Array] = None,
                       **engine_kwargs) -> Dict[str, float]:
    """Accuracy-delta harness: int8 engine vs the bf16 reference engine.

    Returns top-1 agreement rate and max/mean |prob delta| over ``images``
    (preprocessed).  Run this on a representative sample before serving the
    int8 path.  ``engine_kwargs`` configure the quantized engine under test
    (e.g. ``stem_s2d="pre"`` validates the shipped serving/bench config —
    the harness relayouts ``images`` to the s2d layout the engine expects).
    """
    from tumblr_emotions_tpu.ops.inference import FusedInceptionV3

    ref = FusedInceptionV3(variables, dtype=jnp.bfloat16, use_pallas=False)
    qeng = QuantizedInceptionV3(
        variables, calibration_images if calibration_images is not None
        else images, **engine_kwargs)
    q_in = (_space_to_depth_2x2(images) if qeng.stem_s2d == "pre"
            else images)
    ref_logits, _ = jax.jit(lambda x: ref(x))(images)
    q_logits, _ = jax.jit(lambda x: qeng(x))(q_in)
    p_ref = jax.nn.softmax(ref_logits.astype(jnp.float32), axis=-1)
    p_q = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
    agree = float(jnp.mean(
        (jnp.argmax(ref_logits, -1) == jnp.argmax(q_logits, -1))
        .astype(jnp.float32)))
    delta = jnp.abs(p_ref - p_q)
    kinds = list(getattr(qeng, "last_epilogue_kinds", {}).values())
    out = {"top1_agreement": agree,
           "max_prob_delta": float(jnp.max(delta)),
           "mean_prob_delta": float(jnp.mean(delta))}
    if kinds and qeng.epilogue == "shift":
        # Shift-constraint satisfaction is weight-distribution-dependent
        # (VERDICT r4 weak #3): report how many conv sites kept the
        # integer epilogue vs fell back to the f32 requant.
        out["shift_epilogue_rate"] = round(
            kinds.count("shift") / max(len(kinds), 1), 4)
        out["f32_fallback_convs"] = kinds.count("f32")
    return out
