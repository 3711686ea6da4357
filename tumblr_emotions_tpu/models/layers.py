"""Slim-semantics building blocks in Flax.

The reference's conv tower is vendored TF-Slim ``inception_v3.py`` whose
``arg_scope`` sets, for EVERY conv: no bias, batch-norm with ``scale=False``,
``epsilon=0.001``, ``decay=0.9997``, ReLU (SURVEY.md §2a #5, §5 "slim BN
conventions").  Parameter names here deliberately mirror slim variable names
(``weights``, ``BatchNorm/{beta,gamma,moving_mean,moving_variance}``) so a
flax param-tree path joined with "/" IS the slim checkpoint key — the
converter in utils/checkpoint.py is then a mechanical string map.

Compute dtype is configurable: "parity" mode runs f32 end to end (1e-4 logit
budget vs the reference); "perf" mode casts activations/weights to bf16 for
the MXU while keeping master params and BN statistics in f32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SlimBatchNorm(nn.Module):
    """Batch norm with slim's variable names and defaults.

    params:       beta (and gamma iff ``scale``)
    batch_stats:  moving_mean, moving_variance
    """

    momentum: float = 0.9997
    epsilon: float = 0.001
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        features = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (features,), jnp.float32)
        gamma = (
            self.param("gamma", nn.initializers.ones, (features,), jnp.float32)
            if self.scale
            else None
        )
        moving_mean = self.variable(
            "batch_stats", "moving_mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        moving_var = self.variable(
            "batch_stats", "moving_variance", lambda: jnp.ones((features,), jnp.float32)
        )

        if train:
            # Statistics over N,H,W in f32 regardless of compute dtype.
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                moving_mean.value = m * moving_mean.value + (1.0 - m) * mean
                moving_var.value = m * moving_var.value + (1.0 - m) * var
        else:
            mean, var = moving_mean.value, moving_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        if gamma is not None:
            inv = inv * gamma
        # y = (x - mean) * inv + beta, folded into one multiply-add.
        y = x.astype(jnp.float32) * inv + (beta - mean * inv)
        return y.astype(self.dtype)


class ConvBN(nn.Module):
    """slim.conv2d: conv (no bias) -> SlimBatchNorm -> ReLU.

    ``padding`` accepts "SAME"/"VALID" like slim.  Kernel param is named
    ``weights`` (HWIO layout, matching the TF checkpoint layout directly).
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bn: bool = True
    bn_momentum: float = 0.9997
    bn_epsilon: float = 0.001
    bn_scale: bool = False
    activation: Optional[Callable[[jax.Array], jax.Array]] = nn.relu
    use_bias: bool = False
    weights_init_stddev: float = 0.1  # slim trunc_normal(0.1) via arg_scope
    dtype: Dtype = jnp.float32
    # None = backend default (fast, bf16-ish multiplies on TPU even for f32
    # inputs); "highest" = true f32 MXU passes, required for the 1e-4 parity
    # budget against TF goldens (SURVEY.md §6).
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kh, kw = self.kernel
        in_features = x.shape[-1]
        w = self.param(
            "weights",
            nn.initializers.truncated_normal(stddev=self.weights_init_stddev),
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        # preferred_element_type=f32 with bf16 operands breaks the conv VJP
        # (the backward pass builds conv(f32 cotangent, bf16 weights)), so
        # only request it in f32 mode; in bf16 the MXU still accumulates f32
        # internally and rounds on output.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(jnp.float32 if self.dtype == jnp.float32
                                    else None),
            precision=self.precision,
        ).astype(self.dtype)
        if self.use_bias:
            b = self.param("biases", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        if self.use_bn:
            y = SlimBatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                scale=self.bn_scale,
                dtype=self.dtype,
                name="BatchNorm",
            )(y, train=train)
        if self.activation is not None:
            y = self.activation(y)
        return y


def max_pool(x: jax.Array, window: Tuple[int, int], strides: Tuple[int, int],
             padding: str = "VALID") -> jax.Array:
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def avg_pool(x: jax.Array, window: Tuple[int, int], strides: Tuple[int, int],
             padding: str = "SAME") -> jax.Array:
    # TF's AvgPool divides by the count of non-padded elements in the window;
    # count_include_pad=False reproduces that for SAME padding.
    return nn.avg_pool(x, window_shape=window, strides=strides, padding=padding,
                       count_include_pad=False)
