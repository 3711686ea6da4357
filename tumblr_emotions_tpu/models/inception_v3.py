"""Inception-v3 with TF-Slim semantics and variable naming, in Flax.

Rebuilt from the architecture contract of the slim ``inception_v3.py`` /
``inception_utils.py`` the reference vendors (SURVEY.md §2a #5 — ~600-line
conv tower: stem of 5 convs + 2 maxpools, 3x Inception-A at 35x35, a
reduction, 4x Inception-B at 17x17 with 7x1/1x7 factorized convs, aux head,
a reduction, 2x Inception-C at 8x8x2048, global avgpool, dropout, 1x1-conv
logits; BN on every conv with ``scale=False``, no conv biases).

Module names reproduce the slim variable scopes verbatim — including the
historical quirks (``Mixed_5c/Branch_1/Conv_1_0c_5x5``, the ``Conv2d_1a_1x1``
name on Mixed_6a's 3x3 stride-2 conv, Mixed_7b's doubled ``Conv2d_0b_*``
scopes vs Mixed_7c's ``0b``/``0c``) — so that the flax param path joined with
"/" equals the checkpoint key ``InceptionV3/...`` and the slim-ckpt converter
(utils/checkpoint.py) needs no per-layer table.

TPU notes: NHWC activations, HWIO kernels (XLA:TPU's native conv layout);
f32 master params with optional bf16 compute dtype; everything is static
shapes so the whole tower fuses and tiles onto the MXU under one jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tumblr_emotions_tpu.models.layers import ConvBN, avg_pool, max_pool

Dtype = Any


class InceptionV3(nn.Module):
    """Inception-v3 classifier tower.

    __call__ returns ``(logits, end_points)`` like slim's ``inception_v3``:
    end_points holds every Mixed block plus ``AuxLogits`` (if enabled),
    ``PreLogits`` (the 2048-d pooled feature the joint model consumes),
    ``Logits`` and ``Predictions``.
    """

    num_classes: int = 15
    depth_multiplier: float = 1.0
    min_depth: int = 16
    dropout_keep_prob: float = 0.8
    create_aux_logits: bool = True
    bn_momentum: float = 0.9997
    bn_epsilon: float = 0.001
    bn_scale: bool = False
    dtype: Dtype = jnp.float32
    precision: Optional[str] = None  # "highest" for the f32 parity path

    def _conv(self, features: int, kernel: Tuple[int, int], *, name: str,
              strides: Tuple[int, int] = (1, 1), padding: str = "VALID",
              stddev: float = 0.1) -> ConvBN:
        return ConvBN(
            features=features, kernel=kernel, strides=strides, padding=padding,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            bn_scale=self.bn_scale, weights_init_stddev=stddev,
            dtype=self.dtype, precision=self.precision, name=name)

    def _depth(self, d: int) -> int:
        return max(int(d * self.depth_multiplier), self.min_depth)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if x.ndim != 4:
            raise ValueError(f"expected NHWC input, got shape {x.shape}")
        depth = self._depth
        conv = self._conv
        end_points: Dict[str, jax.Array] = {}

        def add(name: str, net: jax.Array) -> jax.Array:
            end_points[name] = net
            return net

        x = x.astype(self.dtype)

        # ---- Stem: 299x299x3 -> 35x35x192 (all VALID unless noted) ----
        net = add("Conv2d_1a_3x3",
                  conv(depth(32), (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train))
        net = add("Conv2d_2a_3x3",
                  conv(depth(32), (3, 3), name="Conv2d_2a_3x3")(net, train))
        net = add("Conv2d_2b_3x3",
                  conv(depth(64), (3, 3), padding="SAME", name="Conv2d_2b_3x3")(net, train))
        net = add("MaxPool_3a_3x3", max_pool(net, (3, 3), (2, 2)))
        net = add("Conv2d_3b_1x1",
                  conv(depth(80), (1, 1), name="Conv2d_3b_1x1")(net, train))
        net = add("Conv2d_4a_3x3",
                  conv(depth(192), (3, 3), name="Conv2d_4a_3x3")(net, train))
        net = add("MaxPool_5a_3x3", max_pool(net, (3, 3), (2, 2)))

        # Inside the Mixed blocks every conv is stride-1 SAME.
        sconv = functools.partial(conv, padding="SAME")

        # ---- Mixed_5b / 5c / 5d: Inception-A at 35x35 ----
        def inception_a(net: jax.Array, scope: str, pool_features: int,
                        quirky_5c_names: bool) -> jax.Array:
            b0 = sconv(depth(64), (1, 1), name=f"{scope}/Branch_0/Conv2d_0a_1x1")(net, train)
            if quirky_5c_names:
                # slim's Mixed_5c uses Conv2d_0b_1x1 / Conv_1_0c_5x5.
                b1 = sconv(depth(48), (1, 1), name=f"{scope}/Branch_1/Conv2d_0b_1x1")(net, train)
                b1 = sconv(depth(64), (5, 5), name=f"{scope}/Branch_1/Conv_1_0c_5x5")(b1, train)
            else:
                b1 = sconv(depth(48), (1, 1), name=f"{scope}/Branch_1/Conv2d_0a_1x1")(net, train)
                b1 = sconv(depth(64), (5, 5), name=f"{scope}/Branch_1/Conv2d_0b_5x5")(b1, train)
            b2 = sconv(depth(64), (1, 1), name=f"{scope}/Branch_2/Conv2d_0a_1x1")(net, train)
            b2 = sconv(depth(96), (3, 3), name=f"{scope}/Branch_2/Conv2d_0b_3x3")(b2, train)
            b2 = sconv(depth(96), (3, 3), name=f"{scope}/Branch_2/Conv2d_0c_3x3")(b2, train)
            b3 = avg_pool(net, (3, 3), (1, 1), padding="SAME")
            b3 = sconv(depth(pool_features), (1, 1),
                       name=f"{scope}/Branch_3/Conv2d_0b_1x1")(b3, train)
            return jnp.concatenate([b0, b1, b2, b3], axis=-1)

        net = add("Mixed_5b", inception_a(net, "Mixed_5b", 32, False))
        net = add("Mixed_5c", inception_a(net, "Mixed_5c", 64, True))
        net = add("Mixed_5d", inception_a(net, "Mixed_5d", 64, False))

        # ---- Mixed_6a: reduction to 17x17x768 ----
        scope = "Mixed_6a"
        # slim quirk: the 3x3/stride-2 conv is scoped "Conv2d_1a_1x1".
        b0 = conv(depth(384), (3, 3), strides=(2, 2),
                  name=f"{scope}/Branch_0/Conv2d_1a_1x1")(net, train)
        b1 = sconv(depth(64), (1, 1), name=f"{scope}/Branch_1/Conv2d_0a_1x1")(net, train)
        b1 = sconv(depth(96), (3, 3), name=f"{scope}/Branch_1/Conv2d_0b_3x3")(b1, train)
        b1 = conv(depth(96), (3, 3), strides=(2, 2),
                  name=f"{scope}/Branch_1/Conv2d_1a_1x1")(b1, train)
        b2 = max_pool(net, (3, 3), (2, 2))
        net = add(scope, jnp.concatenate([b0, b1, b2], axis=-1))

        # ---- Mixed_6b..6e: Inception-B (factorized 7x7) at 17x17x768 ----
        def inception_b(net: jax.Array, scope: str, c7: int) -> jax.Array:
            b0 = sconv(depth(192), (1, 1), name=f"{scope}/Branch_0/Conv2d_0a_1x1")(net, train)
            b1 = sconv(depth(c7), (1, 1), name=f"{scope}/Branch_1/Conv2d_0a_1x1")(net, train)
            b1 = sconv(depth(c7), (1, 7), name=f"{scope}/Branch_1/Conv2d_0b_1x7")(b1, train)
            b1 = sconv(depth(192), (7, 1), name=f"{scope}/Branch_1/Conv2d_0c_7x1")(b1, train)
            b2 = sconv(depth(c7), (1, 1), name=f"{scope}/Branch_2/Conv2d_0a_1x1")(net, train)
            b2 = sconv(depth(c7), (7, 1), name=f"{scope}/Branch_2/Conv2d_0b_7x1")(b2, train)
            b2 = sconv(depth(c7), (1, 7), name=f"{scope}/Branch_2/Conv2d_0c_1x7")(b2, train)
            b2 = sconv(depth(c7), (7, 1), name=f"{scope}/Branch_2/Conv2d_0d_7x1")(b2, train)
            b2 = sconv(depth(192), (1, 7), name=f"{scope}/Branch_2/Conv2d_0e_1x7")(b2, train)
            b3 = avg_pool(net, (3, 3), (1, 1), padding="SAME")
            b3 = sconv(depth(192), (1, 1), name=f"{scope}/Branch_3/Conv2d_0b_1x1")(b3, train)
            return jnp.concatenate([b0, b1, b2, b3], axis=-1)

        net = add("Mixed_6b", inception_b(net, "Mixed_6b", 128))
        net = add("Mixed_6c", inception_b(net, "Mixed_6c", 160))
        net = add("Mixed_6d", inception_b(net, "Mixed_6d", 160))
        net = add("Mixed_6e", inception_b(net, "Mixed_6e", 192))

        # ---- Auxiliary head off Mixed_6e (slim: inside 'AuxLogits' scope) ----
        if self.create_aux_logits and self.num_classes > 0:
            aux = avg_pool(end_points["Mixed_6e"], (5, 5), (3, 3), padding="VALID")
            aux = sconv(depth(128), (1, 1),
                        name="AuxLogits/Conv2d_1b_1x1")(aux, train)
            # Kernel is min(5, spatial) — 5x5 at the canonical 299 input.
            kh = min(5, aux.shape[1])
            kw = min(5, aux.shape[2])
            aux = conv(depth(768), (kh, kw), stddev=0.01,
                       name=f"AuxLogits/Conv2d_2a_{kh}x{kw}")(aux, train)
            aux = ConvBN(features=self.num_classes, kernel=(1, 1), padding="SAME",
                         use_bn=False, use_bias=True, activation=None,
                         weights_init_stddev=0.001, dtype=self.dtype,
                         precision=self.precision,
                         name="AuxLogits/Conv2d_2b_1x1")(aux, train)
            end_points["AuxLogits"] = jnp.squeeze(aux, axis=(1, 2))

        # ---- Mixed_7a: reduction to 8x8x1280 ----
        scope = "Mixed_7a"
        b0 = sconv(depth(192), (1, 1), name=f"{scope}/Branch_0/Conv2d_0a_1x1")(net, train)
        b0 = conv(depth(320), (3, 3), strides=(2, 2),
                  name=f"{scope}/Branch_0/Conv2d_1a_3x3")(b0, train)
        b1 = sconv(depth(192), (1, 1), name=f"{scope}/Branch_1/Conv2d_0a_1x1")(net, train)
        b1 = sconv(depth(192), (1, 7), name=f"{scope}/Branch_1/Conv2d_0b_1x7")(b1, train)
        b1 = sconv(depth(192), (7, 1), name=f"{scope}/Branch_1/Conv2d_0c_7x1")(b1, train)
        b1 = conv(depth(192), (3, 3), strides=(2, 2),
                  name=f"{scope}/Branch_1/Conv2d_1a_3x3")(b1, train)
        b2 = max_pool(net, (3, 3), (2, 2))
        net = add(scope, jnp.concatenate([b0, b1, b2], axis=-1))

        # ---- Mixed_7b / 7c: Inception-C at 8x8x2048 ----
        def inception_c(net: jax.Array, scope: str, quirky_7c_names: bool) -> jax.Array:
            b0 = sconv(depth(320), (1, 1), name=f"{scope}/Branch_0/Conv2d_0a_1x1")(net, train)
            b1 = sconv(depth(384), (1, 1), name=f"{scope}/Branch_1/Conv2d_0a_1x1")(net, train)
            # slim quirk: Mixed_7b scopes BOTH split convs "Conv2d_0b_*";
            # Mixed_7c scopes them 0b/0c.
            n31 = "Conv2d_0c_3x1" if quirky_7c_names else "Conv2d_0b_3x1"
            b1 = jnp.concatenate([
                sconv(depth(384), (1, 3), name=f"{scope}/Branch_1/Conv2d_0b_1x3")(b1, train),
                sconv(depth(384), (3, 1), name=f"{scope}/Branch_1/{n31}")(b1, train),
            ], axis=-1)
            b2 = sconv(depth(448), (1, 1), name=f"{scope}/Branch_2/Conv2d_0a_1x1")(net, train)
            b2 = sconv(depth(384), (3, 3), name=f"{scope}/Branch_2/Conv2d_0b_3x3")(b2, train)
            b2 = jnp.concatenate([
                sconv(depth(384), (1, 3), name=f"{scope}/Branch_2/Conv2d_0c_1x3")(b2, train),
                sconv(depth(384), (3, 1), name=f"{scope}/Branch_2/Conv2d_0d_3x1")(b2, train),
            ], axis=-1)
            b3 = avg_pool(net, (3, 3), (1, 1), padding="SAME")
            b3 = sconv(depth(192), (1, 1), name=f"{scope}/Branch_3/Conv2d_0b_1x1")(b3, train)
            return jnp.concatenate([b0, b1, b2, b3], axis=-1)

        net = add("Mixed_7b", inception_c(net, "Mixed_7b", False))
        net = add("Mixed_7c", inception_c(net, "Mixed_7c", True))

        # ---- Logits: global avgpool (kernel = min(8, spatial)) -> dropout ----
        kh = min(8, net.shape[1])
        kw = min(8, net.shape[2])
        net = avg_pool(net, (kh, kw), (1, 1), padding="VALID")
        if train and self.dropout_keep_prob < 1.0:
            net = nn.Dropout(rate=1.0 - self.dropout_keep_prob,
                             deterministic=False, name="Logits/Dropout_1b")(net)
        end_points["PreLogits"] = net  # [N,1,1,2048]

        if self.num_classes == 0:
            return net, end_points

        logits = ConvBN(features=self.num_classes, kernel=(1, 1), padding="SAME",
                        use_bn=False, use_bias=True, activation=None,
                        dtype=self.dtype, precision=self.precision,
                        name="Logits/Conv2d_1c_1x1")(net, train)
        logits = jnp.squeeze(logits, axis=(1, 2))
        end_points["Logits"] = logits
        end_points["Predictions"] = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits, end_points
