"""Fused inference engine: the serving-path Inception-v3 forward.

Assembles the full tower from BN-folded weights: stem and reduction blocks
as plain XLA convs (cheap, stride-2, odd shapes), the repeated constant-size
stages — 3x Inception-A at 35x35 and 4x Inception-B at 17x17 — as the
Pallas fused-block kernels (ops/fused_inception.py), which are where the
XLA path is HBM-bound.  Used by bench.py and the batch serving path;
training and the parity (f32, 1e-4) path keep the Flax model.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tumblr_emotions_tpu.ops.fused_inception import (
    fold_batchnorm, fused_inception_a, fused_inception_b)


def _conv(x, folded, scope, strides=(1, 1), padding="VALID", relu=True,
          dtype=jnp.bfloat16):
    w, b = folded[scope]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(w, dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + jnp.asarray(b, jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def _packed_conv1x1(x, folded, scopes, dtype):
    """N parallel 1x1 branches over the SAME input as ONE conv.

    Every Inception block starts 3-4 branches with a 1x1 conv of the block
    input; issuing them separately makes XLA re-read the input from HBM per
    branch and runs each GEMM at a fraction of the MXU width.  Concatenating
    the folded kernels along Cout is mathematically exact and turns them
    into one wide GEMM with one input read.

    Returns the per-branch PRE-activation slices (f32, bias added, no relu):
    the avg-pool branch needs pool-then-relu (1x1 conv+bias commutes with
    count_include_pad=False average pooling, relu does not).
    """
    ws = [folded[s][0] for s in scopes]
    w = np.concatenate(ws, axis=-1)
    b = np.concatenate([folded[s][1] for s in scopes])
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(w, dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + jnp.asarray(b, jnp.float32)
    outs, off = [], 0
    for wi in ws:
        outs.append(y[..., off:off + wi.shape[-1]])
        off += wi.shape[-1]
    return outs


class FusedInceptionV3:
    """Inference-only Inception-v3 over BN-folded weights.

    variables: the Flax model's {"params", "batch_stats"} (image tower at
    the root, i.e. an image-only model or the joint model's "InceptionV3"
    subtree).
    """

    def __init__(self, variables: Dict, dtype=jnp.bfloat16,
                 use_pallas: bool = True, interpret: bool = False,
                 images_per_block: int = 1, pack_branches: bool = True):
        self.folded = fold_batchnorm(
            jax.device_get(variables["params"]),
            jax.device_get(variables.get("batch_stats", {})))
        self.dtype = dtype
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.images_per_block = images_per_block
        self.pack_branches = pack_branches

    def _relu(self, y):
        return jnp.maximum(y, 0.0).astype(self.dtype)

    def _pool_branch(self, pre):
        """avg-pool(3x3 SAME) then relu a pre-activation 1x1 branch."""
        p = nn.avg_pool(pre, (3, 3), (1, 1), "SAME", count_include_pad=False)
        return self._relu(p)

    def __call__(self, x: jax.Array) -> jax.Array:
        """Preprocessed [B, 299, 299, 3] -> pre-logits feature [B, 2048]
        and logits if a Logits head is present; returns (logits, feature)."""
        f = self.folded
        conv = functools.partial(_conv, folded=f, dtype=self.dtype)
        x = x.astype(self.dtype)
        net = conv(x, scope="Conv2d_1a_3x3", strides=(2, 2))
        net = conv(net, scope="Conv2d_2a_3x3")
        net = conv(net, scope="Conv2d_2b_3x3", padding="SAME")
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = conv(net, scope="Conv2d_3b_1x1")
        net = conv(net, scope="Conv2d_4a_3x3")
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")

        if self.use_pallas:
            fa = functools.partial(fused_inception_a, interpret=self.interpret,
                                   images_per_block=self.images_per_block)
            net = fa(net, f, "Mixed_5b")
            net = fa(net, f, "Mixed_5c", quirky_5c=True)
            net = fa(net, f, "Mixed_5d")
        else:
            net = self._xla_inception_a(net, "Mixed_5b", False)
            net = self._xla_inception_a(net, "Mixed_5c", True)
            net = self._xla_inception_a(net, "Mixed_5d", False)

        # Mixed_6a reduction
        b0 = conv(net, scope="Mixed_6a/Branch_0/Conv2d_1a_1x1", strides=(2, 2))
        b1 = conv(net, scope="Mixed_6a/Branch_1/Conv2d_0a_1x1", padding="SAME")
        b1 = conv(b1, scope="Mixed_6a/Branch_1/Conv2d_0b_3x3", padding="SAME")
        b1 = conv(b1, scope="Mixed_6a/Branch_1/Conv2d_1a_1x1", strides=(2, 2))
        b2 = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = jnp.concatenate([b0, b1, b2], axis=-1)

        for scope in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            if self.use_pallas:
                net = fused_inception_b(net, f, scope, interpret=self.interpret,
                                        images_per_block=self.images_per_block)
            else:
                net = self._xla_inception_b(net, scope)

        # Mixed_7a reduction
        if self.pack_branches:
            p0, p1 = _packed_conv1x1(
                net, f, ["Mixed_7a/Branch_0/Conv2d_0a_1x1",
                         "Mixed_7a/Branch_1/Conv2d_0a_1x1"], self.dtype)
            b0, b1 = self._relu(p0), self._relu(p1)
        else:
            b0 = conv(net, scope="Mixed_7a/Branch_0/Conv2d_0a_1x1",
                      padding="SAME")
            b1 = conv(net, scope="Mixed_7a/Branch_1/Conv2d_0a_1x1",
                      padding="SAME")
        b0 = conv(b0, scope="Mixed_7a/Branch_0/Conv2d_1a_3x3", strides=(2, 2))
        b1 = conv(b1, scope="Mixed_7a/Branch_1/Conv2d_0b_1x7", padding="SAME")
        b1 = conv(b1, scope="Mixed_7a/Branch_1/Conv2d_0c_7x1", padding="SAME")
        b1 = conv(b1, scope="Mixed_7a/Branch_1/Conv2d_1a_3x3", strides=(2, 2))
        b2 = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = jnp.concatenate([b0, b1, b2], axis=-1)

        net = self._xla_inception_c(net, "Mixed_7b", False)
        net = self._xla_inception_c(net, "Mixed_7c", True)

        kh = min(8, net.shape[1])
        feature = jnp.mean(net.astype(jnp.float32), axis=(1, 2)) \
            if (net.shape[1], net.shape[2]) == (kh, kh) else \
            jnp.squeeze(nn.avg_pool(net, (kh, kh), (1, 1), "VALID"),
                        axis=(1, 2)).astype(jnp.float32)
        logits = None
        if "Logits/Conv2d_1c_1x1" in f:
            w, b = f["Logits/Conv2d_1c_1x1"]
            logits = feature @ np.asarray(w)[0, 0].astype(np.float32) + b
        return logits, feature

    # ---- XLA fallbacks (also the A/B ablation baseline) ----

    def _xla_inception_a(self, net, scope, quirky):
        conv = functools.partial(_conv, folded=self.folded, dtype=self.dtype,
                                 padding="SAME")
        b1n = ("Conv2d_0b_1x1", "Conv_1_0c_5x5") if quirky else \
            ("Conv2d_0a_1x1", "Conv2d_0b_5x5")
        if self.pack_branches:
            p0, p1, p2, p3 = _packed_conv1x1(
                net, self.folded,
                [f"{scope}/Branch_0/Conv2d_0a_1x1",
                 f"{scope}/Branch_1/{b1n[0]}",
                 f"{scope}/Branch_2/Conv2d_0a_1x1",
                 f"{scope}/Branch_3/Conv2d_0b_1x1"], self.dtype)
            b0, b1, b2 = self._relu(p0), self._relu(p1), self._relu(p2)
            b3 = self._pool_branch(p3)
        else:
            b0 = conv(net, scope=f"{scope}/Branch_0/Conv2d_0a_1x1")
            b1 = conv(net, scope=f"{scope}/Branch_1/{b1n[0]}")
            b2 = conv(net, scope=f"{scope}/Branch_2/Conv2d_0a_1x1")
            b3 = nn.avg_pool(net, (3, 3), (1, 1), "SAME",
                             count_include_pad=False)
            b3 = conv(b3, scope=f"{scope}/Branch_3/Conv2d_0b_1x1")
        b1 = conv(b1, scope=f"{scope}/Branch_1/{b1n[1]}")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0b_3x3")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0c_3x3")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    def _xla_inception_b(self, net, scope):
        conv = functools.partial(_conv, folded=self.folded, dtype=self.dtype,
                                 padding="SAME")
        if self.pack_branches:
            p0, p1, p2, p3 = _packed_conv1x1(
                net, self.folded,
                [f"{scope}/Branch_0/Conv2d_0a_1x1",
                 f"{scope}/Branch_1/Conv2d_0a_1x1",
                 f"{scope}/Branch_2/Conv2d_0a_1x1",
                 f"{scope}/Branch_3/Conv2d_0b_1x1"], self.dtype)
            b0, b1, b2 = self._relu(p0), self._relu(p1), self._relu(p2)
            b3 = self._pool_branch(p3)
        else:
            b0 = conv(net, scope=f"{scope}/Branch_0/Conv2d_0a_1x1")
            b1 = conv(net, scope=f"{scope}/Branch_1/Conv2d_0a_1x1")
            b2 = conv(net, scope=f"{scope}/Branch_2/Conv2d_0a_1x1")
            b3 = nn.avg_pool(net, (3, 3), (1, 1), "SAME",
                             count_include_pad=False)
            b3 = conv(b3, scope=f"{scope}/Branch_3/Conv2d_0b_1x1")
        b1 = conv(b1, scope=f"{scope}/Branch_1/Conv2d_0b_1x7")
        b1 = conv(b1, scope=f"{scope}/Branch_1/Conv2d_0c_7x1")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0b_7x1")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0c_1x7")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0d_7x1")
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0e_1x7")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    def _xla_inception_c(self, net, scope, quirky_7c):
        conv = functools.partial(_conv, folded=self.folded, dtype=self.dtype,
                                 padding="SAME")
        n31 = "Conv2d_0c_3x1" if quirky_7c else "Conv2d_0b_3x1"
        if self.pack_branches:
            p0, p1, p2, p3 = _packed_conv1x1(
                net, self.folded,
                [f"{scope}/Branch_0/Conv2d_0a_1x1",
                 f"{scope}/Branch_1/Conv2d_0a_1x1",
                 f"{scope}/Branch_2/Conv2d_0a_1x1",
                 f"{scope}/Branch_3/Conv2d_0b_1x1"], self.dtype)
            b0, b1, b2 = self._relu(p0), self._relu(p1), self._relu(p2)
            b3 = self._pool_branch(p3)
        else:
            b0 = conv(net, scope=f"{scope}/Branch_0/Conv2d_0a_1x1")
            b1 = conv(net, scope=f"{scope}/Branch_1/Conv2d_0a_1x1")
            b2 = conv(net, scope=f"{scope}/Branch_2/Conv2d_0a_1x1")
            b3 = nn.avg_pool(net, (3, 3), (1, 1), "SAME",
                             count_include_pad=False)
            b3 = conv(b3, scope=f"{scope}/Branch_3/Conv2d_0b_1x1")
        b1 = jnp.concatenate([
            conv(b1, scope=f"{scope}/Branch_1/Conv2d_0b_1x3"),
            conv(b1, scope=f"{scope}/Branch_1/{n31}")], axis=-1)
        b2 = conv(b2, scope=f"{scope}/Branch_2/Conv2d_0b_3x3")
        b2 = jnp.concatenate([
            conv(b2, scope=f"{scope}/Branch_2/Conv2d_0c_1x3"),
            conv(b2, scope=f"{scope}/Branch_2/Conv2d_0d_3x1")], axis=-1)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
