"""Skip-gram word2vec (SGNS) trainer, TPU-native.

SURVEY.md §2a #7 / §8 Q4: the reference's text branch warm-starts from
pretrained word2vec/GloVe vectors — either public GloVe or word2vec trained
on the Tumblr captions themselves.  This module provides the latter without
gensim: pair generation + unigram^0.75 negative sampling on host (numpy),
and the SGNS objective as one jitted step (embedding gathers + dot products
on device), producing a [V, D] matrix consumable by
``TextEmotionModel``/``load_embeddings``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tumblr_emotions_tpu.data.vocab import PAD_ID, Vocabulary, tokenize

log = logging.getLogger("tumblr_emotions_tpu")


@dataclasses.dataclass
class Word2VecConfig:
    embed_dim: int = 200
    window: int = 5
    num_negatives: int = 5
    learning_rate: float = 0.025
    batch_size: int = 1024
    num_steps: int = 20_000
    subsample_t: float = 1e-4   # frequent-word subsampling threshold
    seed: int = 0


def corpus_ids(texts: Sequence[str], vocab: Vocabulary) -> List[np.ndarray]:
    """Tokenized posts -> list of id arrays (OOV mapped, PAD never emitted)."""
    out = []
    for t in texts:
        ids = np.asarray([vocab.lookup(w) for w in tokenize(t)], np.int32)
        if ids.size:
            out.append(ids)
    return out


class PairSampler:
    """Host-side skip-gram pair + negative sampler (unigram^0.75)."""

    def __init__(self, sentences: List[np.ndarray], vocab_size: int,
                 cfg: Word2VecConfig):
        self.cfg = cfg
        self.rng = np.random.RandomState(cfg.seed)
        counts = np.zeros(vocab_size, np.float64)
        for s in sentences:
            np.add.at(counts, s, 1.0)
        total = counts.sum()
        # Frequent-word subsampling keep-probability (word2vec's heuristic).
        freq = counts / max(total, 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            keep = np.sqrt(cfg.subsample_t / np.maximum(freq, 1e-12))
        self.keep = np.clip(keep, 0.0, 1.0)
        self.keep[PAD_ID] = 0.0
        noise = counts ** 0.75
        noise[PAD_ID] = 0.0
        self.noise = noise / noise.sum()
        self.sentences = sentences

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        cfg = self.cfg
        centers: List[int] = []
        contexts: List[int] = []
        while True:
            for s in self.sentences:
                s = s[self.rng.rand(len(s)) < self.keep[s]]
                for i, c in enumerate(s):
                    w = self.rng.randint(1, cfg.window + 1)
                    for j in range(max(0, i - w), min(len(s), i + w + 1)):
                        if j != i:
                            centers.append(c)
                            contexts.append(s[j])
                    while len(centers) >= cfg.batch_size:
                        b = cfg.batch_size
                        neg = self.rng.choice(
                            len(self.noise), size=(b, cfg.num_negatives),
                            p=self.noise)
                        yield (np.asarray(centers[:b], np.int32),
                               np.asarray(contexts[:b], np.int32),
                               neg.astype(np.int32))
                        del centers[:b], contexts[:b]


def _sgns_loss(params, centers, contexts, negatives):
    w_in, w_out = params
    v = jnp.take(w_in, centers, axis=0)                    # [B, D]
    u_pos = jnp.take(w_out, contexts, axis=0)              # [B, D]
    u_neg = jnp.take(w_out, negatives, axis=0)             # [B, K, D]
    pos = jnp.sum(v * u_pos, axis=-1)                      # [B]
    neg = jnp.einsum("bd,bkd->bk", v, u_neg)               # [B, K]
    return -(jnp.mean(jax.nn.log_sigmoid(pos))
             + jnp.mean(jnp.sum(jax.nn.log_sigmoid(-neg), axis=-1)))


def train_word2vec(texts: Sequence[str], vocab: Vocabulary,
                   cfg: Optional[Word2VecConfig] = None) -> np.ndarray:
    """Train SGNS on the corpus; returns the input-embedding matrix [V, D]."""
    import optax

    cfg = cfg or Word2VecConfig()
    rng = np.random.RandomState(cfg.seed)
    V = vocab.size
    w_in = jnp.asarray(
        (rng.rand(V, cfg.embed_dim) - 0.5) / cfg.embed_dim, jnp.float32)
    w_out = jnp.zeros((V, cfg.embed_dim), jnp.float32)
    params = (w_in, w_out)
    # linear lr decay like the original word2vec
    sched = optax.linear_schedule(cfg.learning_rate,
                                  cfg.learning_rate * 0.01, cfg.num_steps)
    tx = optax.sgd(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, centers, contexts, negatives):
        loss, grads = jax.value_and_grad(_sgns_loss)(
            params, centers, contexts, negatives)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    sampler = PairSampler(corpus_ids(texts, vocab), V, cfg)
    it = sampler.batches()
    for i in range(cfg.num_steps):
        centers, contexts, negatives = next(it)
        params, opt_state, loss = step(params, opt_state, centers, contexts,
                                       negatives)
        if (i + 1) % max(cfg.num_steps // 10, 1) == 0:
            log.info("word2vec step %d/%d loss %.4f", i + 1, cfg.num_steps,
                     float(loss))
    matrix = np.array(params[0])  # writable copy
    matrix[PAD_ID] = 0.0
    return matrix
