"""SGNS word2vec trainer: co-occurring words must embed closer."""

import numpy as np

from tumblr_emotions_tpu.data import word2vec
from tumblr_emotions_tpu.data.vocab import build_vocabulary


def test_word2vec_learns_cooccurrence():
    rng = np.random.RandomState(0)
    # Two disjoint topic clusters; words co-occur only within their cluster.
    happy_words = ["happy", "joy", "smile", "sunshine"]
    sad_words = ["sad", "tears", "gloom", "rain"]
    texts = []
    for _ in range(300):
        k = rng.randint(2, 5)
        texts.append(" ".join(rng.choice(happy_words, k)))
        texts.append(" ".join(rng.choice(sad_words, k)))
    v = build_vocabulary(texts, min_freq=1)
    cfg = word2vec.Word2VecConfig(embed_dim=16, window=3, num_negatives=4,
                                  num_steps=4000, batch_size=256,
                                  subsample_t=1.0, learning_rate=0.1, seed=0)
    m = word2vec.train_word2vec(texts, v, cfg)
    assert m.shape == (v.size, 16)
    np.testing.assert_array_equal(m[0], 0.0)  # PAD stays zero

    def cos(a, b):
        ai, bi = v.token_to_id[a], v.token_to_id[b]
        x, y = m[ai], m[bi]
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9))

    within = np.mean([cos("happy", "joy"), cos("sad", "tears"),
                      cos("smile", "sunshine"), cos("gloom", "rain")])
    across = np.mean([cos("happy", "sad"), cos("joy", "tears"),
                      cos("smile", "rain"), cos("sunshine", "gloom")])
    assert within > across + 0.2, (within, across)


def test_pair_sampler_no_pad_and_windowed():
    texts = ["alpha beta gamma delta epsilon"] * 5
    v = build_vocabulary(texts, min_freq=1)
    cfg = word2vec.Word2VecConfig(window=2, num_negatives=3, batch_size=64,
                                  subsample_t=1.0)
    sampler = word2vec.PairSampler(word2vec.corpus_ids(texts, v), v.size, cfg)
    centers, contexts, negs = next(sampler.batches())
    assert centers.shape == (64,) and negs.shape == (64, 3)
    assert (centers != 0).all() and (contexts != 0).all() and (negs != 0).all()
    assert (centers != contexts).all()
