"""Joint "Deep Sentiment" model: Inception pool feature ∥ text feature.

Rebuilds the reference's concat-fusion classifier (SURVEY.md §2a #9,
``im_text_rnn_model.py``): the Inception-v3 2048-d PreLogits feature is
concatenated with the text representation and a dense layer produces the
15-way emotion softmax.  Aux logits from the image tower are preserved for
the auxiliary loss during fine-tuning.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tumblr_emotions_tpu.models.inception_v3 import InceptionV3
from tumblr_emotions_tpu.models.text_model import TextEmotionModel

Dtype = Any


class DeepSentimentModel(nn.Module):
    """Concat fusion of image + text branches -> joint emotion logits."""

    vocab_size: int
    embed_dim: int
    num_classes: int = 15
    aggregator: str = "mean"
    rnn_hidden: int = 256
    pad_id: int = 0
    fusion_hidden: int = 0         # optional dense layer on the fused vector
    dropout_keep_prob: float = 0.8
    create_aux_logits: bool = True
    depth_multiplier: float = 1.0
    min_depth: int = 16
    bn_momentum: float = 0.9997    # slim batch_norm decay
    bn_epsilon: float = 0.001
    bn_scale: bool = False
    dtype: Dtype = jnp.float32
    precision: Any = None          # "highest" in parity mode

    def setup(self):
        # Scope named "InceptionV3" so image-branch params live at exactly
        # the slim checkpoint prefix, shared with the image-only model.
        self.inception = InceptionV3(
            num_classes=self.num_classes,
            depth_multiplier=self.depth_multiplier,
            min_depth=self.min_depth,
            dropout_keep_prob=self.dropout_keep_prob,
            create_aux_logits=self.create_aux_logits,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            bn_scale=self.bn_scale,
            dtype=self.dtype, precision=self.precision, name="InceptionV3")
        self.text = TextEmotionModel(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            num_classes=self.num_classes, aggregator=self.aggregator,
            rnn_hidden=self.rnn_hidden, pad_id=self.pad_id,
            dtype=self.dtype, name="Text")
        self.joint_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                                     name="JointLogits")
        if self.fusion_hidden > 0:
            self.fusion_dense = nn.Dense(self.fusion_hidden, dtype=self.dtype,
                                         name="JointHidden")

    def fuse(self, image_feature: jax.Array, token_ids: jax.Array,
             lengths: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Text branch + fusion head over a precomputed 2048-d image
        feature — the serving split: the image tower can run in a fused
        engine (ops/quant.py, ops/inference.py) while this half carries
        the text lookup and the joint softmax.  Call via
        ``model.apply(vars, feat, tokens, lengths, method="fuse")``.
        """
        txt_feat = self.text.represent(token_ids, lengths)
        fused = jnp.concatenate(
            [image_feature, txt_feat.astype(image_feature.dtype)], axis=-1)
        end_points = {
            "ImageFeature": image_feature,
            "TextFeature": txt_feat,
            "Fused": fused,
        }
        if self.fusion_hidden > 0:
            fused = nn.relu(self.fusion_dense(fused))
            end_points["JointHidden"] = fused
        logits = self.joint_logits(fused)
        end_points["Logits"] = logits
        end_points["Predictions"] = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1)
        return logits, end_points

    def __call__(self, images: jax.Array, token_ids: jax.Array,
                 lengths: Optional[jax.Array] = None, train: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        _, img_points = self.inception(images, train=train)
        img_feat = jnp.squeeze(img_points["PreLogits"], axis=(1, 2))  # [B,2048]
        logits, end_points = self.fuse(img_feat, token_ids, lengths)
        if self.create_aux_logits and "AuxLogits" in img_points:
            end_points["AuxLogits"] = img_points["AuxLogits"]
        return logits, end_points
