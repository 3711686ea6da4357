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

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tumblr_emotions_tpu.ops.fused_inception import fold_batchnorm

_INT8_MIN, _INT8_MAX = -127.0, 127.0

# Sentinel for ``out_key``: requantize to the conv's own scope key.  An
# explicit ``None`` means "dequantize to the float dtype" (final block).
_SELF = "_SELF"


def quantize_weights(folded: Dict[str, Tuple[np.ndarray, np.ndarray]]
                     ) -> Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-output-channel symmetric int8 quantization of folded conv kernels.

    Returns {scope: (w_q int8 [kh,kw,Cin,Cout], s_w f32 [Cout], b f32 [Cout])}.
    """
    out = {}
    for scope, (w, b) in folded.items():
        w = np.asarray(w, np.float32)
        s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        s_w = np.where(s_w == 0.0, 1.0, s_w).astype(np.float32)
        w_q = np.clip(np.round(w / s_w), _INT8_MIN, _INT8_MAX).astype(np.int8)
        out[scope] = (w_q, s_w, np.asarray(b, np.float32))
    return out


def _conv_raw(x, w, strides, padding, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def _maxpool(x, window=(3, 3), strides=(2, 2), padding="VALID"):
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
    """bf16 interpretation that records max |activation| per site key."""

    def __init__(self, folded, dtype=jnp.bfloat16):
        self.folded = folded
        self.dtype = dtype
        self.maxima: Dict[str, jax.Array] = {}

    def _record(self, key: str, t: jax.Array) -> None:
        m = jnp.max(jnp.abs(t.astype(jnp.float32)))
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

    def packed(self, t, scopes: Sequence[str]):
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
    """int8 interpretation: tensors flow as (q int8, scale float)."""

    def __init__(self, wq, scales: Dict[str, float], dtype=jnp.bfloat16):
        self.wq = wq
        self.scales = scales
        self.dtype = dtype  # dtype of dequantized (non-int8) outputs

    def _quantize(self, y_f32, out_key):
        # Signed values: keep an explicit round (cheap only on the stem
        # input, the single signed tensor in the network).
        s = self.scales[out_key]
        q = jnp.clip(jnp.round(y_f32 * (1.0 / s)), _INT8_MIN, _INT8_MAX)
        return q.astype(jnp.int8), s

    def stem_in(self, x):
        return self._quantize(x.astype(jnp.float32), "input")

    def conv(self, t, scope, out_key=_SELF, strides=(1, 1), padding="VALID"):
        q, s_x = t
        w_q, s_w, b = self.wq[scope]
        y = _conv_raw(q, jnp.asarray(w_q), strides, padding, jnp.int32)
        out_key = scope if out_key is _SELF else out_key
        if out_key is not None:
            s_out = self.scales[out_key]
            m = jnp.asarray(s_x * s_w / s_out, jnp.float32)
            # +0.5 folded into the bias: output is clamped to [0, 127] and
            # the f32->s8 convert truncates toward zero, so trunc(y + 0.5)
            # is round-half-up — no explicit (expensive) round op.  The
            # lower clamp at 0 IS the relu.
            bq = jnp.asarray(b / s_out + 0.5, jnp.float32)
            yq = jnp.clip(y.astype(jnp.float32) * m + bq, 0.0, _INT8_MAX)
            return yq.astype(jnp.int8), s_out
        # No calibrated consumer: dequantize (final block / head path).
        m = jnp.asarray(s_x * s_w, jnp.float32)
        yf = jnp.maximum(y.astype(jnp.float32) * m + jnp.asarray(b), 0.0)
        return yf.astype(self.dtype)

    def packed(self, t, scopes: Sequence[str]):
        q, s_x = t
        parts = [self.wq[s] for s in scopes]
        w = np.concatenate([p[0] for p in parts], axis=-1)
        y = _conv_raw(q, jnp.asarray(w), (1, 1), "SAME", jnp.int32)
        outs, off = [], 0
        for w_q, s_w, b in parts:
            n = w_q.shape[-1]
            outs.append((y[..., off:off + n],
                         jnp.asarray(s_x * s_w, jnp.float32),
                         jnp.asarray(b, jnp.float32)))
            off += n
        return outs

    def _epilogue(self, pre, out_key, pool):
        y, m, b = pre
        if out_key is not None:
            s_out = self.scales[out_key]
            # Same trunc-as-round trick as conv(): +0.5 rides the bias.
            yf = y.astype(jnp.float32) * (m / s_out) + (b / s_out + 0.5)
            if pool:
                # Pool the pre-activation (the +0.5 is window-invariant).
                yf = _avgpool_3x3_same(yf)
            yq = jnp.clip(yf, 0.0, _INT8_MAX)
            return yq.astype(jnp.int8), s_out
        yf = y.astype(jnp.float32) * m + b
        if pool:
            yf = _avgpool_3x3_same(yf)
        return jnp.maximum(yf, 0.0).astype(self.dtype)

    def act(self, pre, out_key):
        return self._epilogue(pre, out_key, pool=False)

    def pool_act(self, pre, out_key):
        return self._epilogue(pre, out_key, pool=True)

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
            f"{scope}/Branch_3/Conv2d_0b_1x1"])
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
            f"{scope}/Branch_3/Conv2d_0b_1x1"])
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
                            "Mixed_7a/Branch_1/Conv2d_0a_1x1"])
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
            f"{scope}/Branch_3/Conv2d_0b_1x1"])
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


class QuantizedInceptionV3:
    """int8-serving Inception-v3 over BN-folded, per-channel-quantized weights.

    Parameters
    ----------
    variables: the Flax model's {"params", "batch_stats"} (image tower at
        the root, as for FusedInceptionV3).
    calibration_images: preprocessed [N, 299, 299, 3] batch (output of
        preprocess_for_eval) used once to fix the static activation scales.
        Serving accuracy depends on it being representative.
    """

    def __init__(self, variables: Dict, calibration_images: jax.Array,
                 dtype=jnp.bfloat16):
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables.get("batch_stats", {}))
        self.folded = fold_batchnorm(params, stats)
        self.wq = quantize_weights(self.folded)
        self.dtype = dtype

        calib = _CalibOps(self.folded, dtype=dtype)

        def run_calib(x):
            _tower(calib, x)
            return calib.maxima

        maxima = jax.jit(run_calib)(jnp.asarray(calibration_images))
        self.scales = {k: max(float(v), 1e-6) / 127.0
                       for k, v in maxima.items()}

    def __call__(self, x: jax.Array) -> Tuple[Optional[jax.Array], jax.Array]:
        """Preprocessed [B, 299, 299, 3] -> (logits or None, feature [B, 2048])."""
        ops = _Int8Ops(self.wq, self.scales, dtype=self.dtype)
        net = _tower(ops, x)
        # Global average pool over min(8, spatial), like FusedInceptionV3.
        kh = min(8, net.shape[1])
        kw = min(8, net.shape[2])
        feature = jnp.mean(net[:, :kh, :kw, :].astype(jnp.float32),
                           axis=(1, 2)) if (net.shape[1], net.shape[2]) != \
            (kh, kw) else jnp.mean(net.astype(jnp.float32), axis=(1, 2))
        logits = None
        if "Logits/Conv2d_1c_1x1" in self.folded:
            w, b = self.folded["Logits/Conv2d_1c_1x1"]
            logits = feature @ np.asarray(w, np.float32)[0, 0] + b
        return logits, feature


def quantization_delta(variables: Dict, images: jax.Array,
                       calibration_images: Optional[jax.Array] = None
                       ) -> Dict[str, float]:
    """Accuracy-delta harness: int8 engine vs the bf16 reference engine.

    Returns top-1 agreement rate and max/mean |prob delta| over ``images``
    (preprocessed).  Run this on a representative sample before serving the
    int8 path.
    """
    from tumblr_emotions_tpu.ops.inference import FusedInceptionV3

    ref = FusedInceptionV3(variables, dtype=jnp.bfloat16, use_pallas=False)
    qeng = QuantizedInceptionV3(
        variables, calibration_images if calibration_images is not None
        else images)
    ref_logits, _ = jax.jit(lambda x: ref(x))(images)
    q_logits, _ = jax.jit(lambda x: qeng(x))(images)
    p_ref = jax.nn.softmax(ref_logits.astype(jnp.float32), axis=-1)
    p_q = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
    agree = float(jnp.mean(
        (jnp.argmax(ref_logits, -1) == jnp.argmax(q_logits, -1))
        .astype(jnp.float32)))
    delta = jnp.abs(p_ref - p_q)
    return {"top1_agreement": agree,
            "max_prob_delta": float(jnp.max(delta)),
            "mean_prob_delta": float(jnp.mean(delta))}
