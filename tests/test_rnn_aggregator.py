"""End-to-end coverage of the RNN (LSTM) text aggregator — the reference's
recalled joint-model configuration (SURVEY.md §2a #9, ``im_text_rnn_model``).
Round-1 verdict flagged this path as implemented-but-untested."""

import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import csv_dataset, vocab
from tumblr_emotions_tpu.models import TextEmotionModel
from tumblr_emotions_tpu.train import Trainer


def test_rnn_zero_length_and_variable_lengths():
    """Length-0 (all-pad) text must not NaN; different lengths give
    different final states."""
    model = TextEmotionModel(vocab_size=50, embed_dim=8, num_classes=5,
                             aggregator="rnn", rnn_hidden=16)
    tokens = np.array([[0, 0, 0, 0],      # length 0
                       [3, 4, 0, 0],      # length 2
                       [3, 4, 5, 6]])     # length 4
    lengths = np.array([0, 2, 4], np.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(tokens), jnp.asarray(lengths))
    logits, ep = model.apply(variables, jnp.asarray(tokens),
                             jnp.asarray(lengths))
    out = np.asarray(logits)
    assert np.isfinite(out).all()
    assert not np.allclose(out[1], out[2])
    # Same prefix, different length -> different representation.
    feat = np.asarray(ep["TextFeature"])
    assert not np.allclose(feat[1], feat[2])


def test_rnn_respects_lengths_ignores_padding():
    """Garbage in the padded tail must not change the final state (nn.RNN
    seq_lengths contract)."""
    model = TextEmotionModel(vocab_size=50, embed_dim=8, num_classes=5,
                             aggregator="rnn", rnn_hidden=16)
    a = np.array([[3, 4, 5, 0, 0]])
    b = np.array([[3, 4, 5, 9, 9]])  # same length-3 prefix, junk tail
    lengths = np.array([3], np.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(a), jnp.asarray(lengths))
    fa, _ = model.apply(variables, jnp.asarray(a), jnp.asarray(lengths))
    fb, _ = model.apply(variables, jnp.asarray(b), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


@pytest.fixture()
def tiny_csv(tmp_path):
    path = tmp_path / "posts.csv"
    rng = np.random.RandomState(0)
    rows = []
    for e in EMOTIONS[:6]:
        for k in range(10):
            filler = " ".join(rng.choice(["the", "a", "my", "so"], 2))
            rows.append({"id": f"{e}{k}", "text": f"{filler} {e} vibes {e}",
                         "emotion": e})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "text", "emotion"])
        w.writeheader()
        w.writerows(rows)
    return str(path)


def test_rnn_text_model_end_to_end(tiny_csv, tmp_path):
    """Train/eval/checkpoint-resume with aggregator='rnn' (BASELINE config-1
    harness, RNN flavor): must overfit the separable toy corpus."""
    posts = csv_dataset.load_posts_csv(tiny_csv)
    v = vocab.build_vocabulary([p.text for p in posts], max_size=200,
                               min_freq=1)
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=16, max_len=10,
                              aggregator="rnn", rnn_hidden=32),
        train=cfg.train.replace(batch_size=16, num_steps=150, log_every=1000,
                                learning_rate=0.05,
                                checkpoint_dir=str(tmp_path / "ckpt")))
    trainer = Trainer(cfg)
    batches = csv_dataset.text_batches(posts, v, 16, cfg.text.max_len, seed=0)
    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(batches)))
    trainer.checkpoint_manager()
    state = trainer.fit(state, batches)
    eval_batches = list(csv_dataset.text_batches(
        posts, v, 16, cfg.text.max_len, shuffle=False, num_epochs=1,
        drop_remainder=False))
    summary = trainer.evaluate(state, eval_batches)
    assert summary["accuracy"] > 0.9, summary

    # Resume restores the RNN/LSTM params exactly.
    state2 = trainer.init_state(jax.random.PRNGKey(7),
                                eval_batches[0])
    restored = trainer.restore_latest(state2)
    assert restored is not None
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
def test_rnn_joint_model_forward(tmp_path):
    """Joint DeepSentiment with the RNN text branch: forward + one train
    step on a small tower."""
    from tumblr_emotions_tpu.models import DeepSentimentModel

    model = DeepSentimentModel(
        vocab_size=60, embed_dim=8, num_classes=5, aggregator="rnn",
        rnn_hidden=16, depth_multiplier=0.25, min_depth=8,
        create_aux_logits=False)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(2, 299, 299, 3) * 2 - 1, jnp.float32)
    tokens = jnp.asarray(rng.randint(1, 60, (2, 6)), jnp.int32)
    lengths = jnp.asarray([6, 3], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           image, tokens, lengths, train=False)
    logits, ep = model.apply(variables, image, tokens, lengths, train=False)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()
    # The LSTM params live under the slim-style Text/RNN scope (converter
    # contract: one dict key per scope path segment).
    from flax import traverse_util
    keys = {"/".join(p) for p in
            traverse_util.flatten_dict(variables["params"])}
    assert any(k.startswith("Text/RNN/") for k in keys), sorted(keys)[:8]
