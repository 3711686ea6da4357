"""Text branch: embedding lookup -> aggregate -> dense softmax head.

Rebuilds the reference's word-embedding text model (SURVEY.md §2a #7-8):
post text is tokenized to fixed-length id sequences, looked up in a
pretrained word2vec/GloVe matrix, aggregated, and classified over the 15
emotion labels.  The BASELINE contract is the dense-over-embeddings head;
the recalled reference joint file name (``im_text_rnn_model.py``) suggests
an RNN aggregator, so both are provided behind ``aggregator=`` (SURVEY.md §7
"keep the aggregator pluggable").

TPU notes: lookups are ``jnp.take`` gathers over a [V, D] matrix resident in
HBM; the masked-mean and the LSTM (a ``lax.scan`` over at most ~50 steps of
[B, 4H] matmuls) are static-shape and fully jittable.  Padding uses id 0 and
an explicit length, so variable-length text never creates dynamic shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LSTMAggregator(nn.Module):
    """Single-layer LSTM over embedded tokens; returns the last valid state."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array, lengths: jax.Array) -> jax.Array:
        # emb: [B, T, D]; lengths: [B].  nn.RNN runs the cell under nn.scan
        # (params created once, scan-carried state) and honors per-example
        # lengths, returning the final valid carry — static shapes throughout.
        rnn = nn.RNN(
            nn.OptimizedLSTMCell(features=self.hidden, dtype=self.dtype),
            return_carry=True, name="lstm")
        (c_final, h_final), _ = rnn(emb, seq_lengths=lengths)
        return h_final


class TextEmotionModel(nn.Module):
    """Vocab-lookup text classifier over the emotion labels.

    Params use slim-style names under a ``WordEmbedding``/``TextLogits``
    scope so warm-starting and the converter treat all three models
    uniformly.
    """

    vocab_size: int
    embed_dim: int
    num_classes: int = 15
    aggregator: str = "mean"   # "mean" | "sum" | "rnn"
    rnn_hidden: int = 256
    hidden_dim: int = 0
    pad_id: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "WordEmbedding/embeddings",
            nn.initializers.normal(stddev=0.1),
            (self.vocab_size, self.embed_dim), jnp.float32)
        if self.aggregator == "rnn":
            self.rnn = LSTMAggregator(hidden=self.rnn_hidden, dtype=self.dtype,
                                      name="RNN")
        if self.hidden_dim > 0:
            self.hidden_dense = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                         name="TextHidden")
        self.logits_dense = nn.Dense(self.num_classes, dtype=self.dtype,
                                     name="TextLogits")

    def represent(self, token_ids: jax.Array,
                  lengths: Optional[jax.Array] = None) -> jax.Array:
        """[B, T] int ids -> [B, F] text feature (the joint model's input)."""
        if lengths is None:
            lengths = jnp.sum((token_ids != self.pad_id).astype(jnp.int32), axis=-1)
        emb = jnp.take(self.embedding.astype(self.dtype), token_ids, axis=0)
        mask = (jnp.arange(emb.shape[1])[None, :] < lengths[:, None])
        emb = emb * mask[..., None].astype(emb.dtype)
        if self.aggregator == "mean":
            denom = jnp.maximum(lengths, 1).astype(emb.dtype)[:, None]
            return jnp.sum(emb, axis=1) / denom
        if self.aggregator == "sum":
            return jnp.sum(emb, axis=1)
        if self.aggregator == "rnn":
            return self.rnn(emb, lengths)
        raise ValueError(f"unknown aggregator {self.aggregator!r}")

    def __call__(self, token_ids: jax.Array,
                 lengths: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        feat = self.represent(token_ids, lengths)
        end_points = {"TextFeature": feat}
        if self.hidden_dim > 0:
            feat = nn.relu(self.hidden_dense(feat))
            end_points["TextHidden"] = feat
        logits = self.logits_dense(feat)
        end_points["Logits"] = logits
        end_points["Predictions"] = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1)
        return logits, end_points
