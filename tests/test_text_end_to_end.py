"""End-to-end slice (BASELINE config 1): CSV posts -> vocab -> text model ->
jit train loop on an 8-device mesh -> per-class eval -> checkpoint/resume.

This is the harness-proving test from SURVEY.md §7 step 2.
"""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import csv_dataset, vocab
from tumblr_emotions_tpu.parallel import create_mesh
from tumblr_emotions_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_csv(tmp_path_factory):
    """A linearly-separable toy corpus: each emotion's posts contain its own
    marker words, so a working trainer must overfit it quickly."""
    path = tmp_path_factory.mktemp("data") / "posts.csv"
    rng = np.random.RandomState(0)
    rows = []
    for i, emotion in enumerate(EMOTIONS):
        for k in range(12):
            filler = " ".join(rng.choice(["the", "a", "my", "today", "so"], 3))
            rows.append({"id": f"{emotion}{k}",
                         "text": f"{filler} feeling {emotion} and {emotion}",
                         "emotion": emotion})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "text", "emotion"])
        w.writeheader()
        w.writerows(rows)
    return str(path)


def test_text_model_end_to_end(tiny_csv, tmp_path):
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=500, embed_dim=32, max_len=12),
        train=cfg.train.replace(batch_size=32, num_steps=120, log_every=1000,
                                checkpoint_dir=str(tmp_path / "ckpt")),
    )

    posts = csv_dataset.load_posts_csv(tiny_csv)
    assert len(posts) == 12 * len(EMOTIONS)
    v = vocab.build_vocabulary([p.text for p in posts], max_size=500, min_freq=1)

    cfg = cfg.replace(text=cfg.text.replace(vocab_size=v.size))
    mesh = create_mesh(cfg.mesh)
    assert mesh.devices.size == 8  # virtual CPU mesh from conftest

    trainer = Trainer(cfg, mesh=mesh)
    batches = csv_dataset.text_batches(posts, v, cfg.train.batch_size,
                                       cfg.text.max_len, seed=0)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               next(iter(csv_dataset.text_batches(
                                   posts, v, 8, cfg.text.max_len))))
    state = trainer.fit(state, batches, num_steps=cfg.train.num_steps)
    assert int(state.step) == cfg.train.num_steps

    eval_batches = list(csv_dataset.text_batches(
        posts, v, 64, cfg.text.max_len, shuffle=False, num_epochs=1,
        drop_remainder=False))
    summary = trainer.evaluate(state, eval_batches, class_names=EMOTIONS)
    # Separable toy data: must overfit well past chance (1/15 ≈ 6.7%).
    assert summary["accuracy"] > 0.9, summary["accuracy"]
    assert set(summary["per_class"]) == set(EMOTIONS)

    # Checkpoint + Supervisor-style resume.
    trainer.checkpoint_manager()
    trainer.save_checkpoint(state)
    fresh = trainer.init_state(jax.random.PRNGKey(1),
                               eval_batches[0])
    restored = trainer.restore_latest(fresh)
    assert restored is not None and int(restored.step) == int(state.step)
    s2 = trainer.evaluate(restored, eval_batches, class_names=EMOTIONS)
    assert abs(s2["accuracy"] - summary["accuracy"]) < 1e-6


def test_trainable_scopes_freeze(tiny_csv):
    """trainable_scopes must freeze everything else (slim phase-1 analogue)."""
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=100, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=16, num_steps=5,
                                trainable_scopes="TextLogits"),
    )
    posts = csv_dataset.load_posts_csv(tiny_csv)
    v = vocab.build_vocabulary([p.text for p in posts], max_size=100, min_freq=1)
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=v.size))
    trainer = Trainer(cfg)
    batches = csv_dataset.text_batches(posts, v, 16, 8)
    state0 = trainer.init_state(jax.random.PRNGKey(0), next(iter(batches)))
    emb0 = np.asarray(state0.params["WordEmbedding/embeddings"]).copy()
    head0 = np.asarray(state0.params["TextLogits"]["kernel"]).copy()
    state = trainer.fit(state0, batches, num_steps=5)
    assert np.array_equal(
        emb0, np.asarray(state.params["WordEmbedding/embeddings"]))
    assert not np.array_equal(head0, np.asarray(state.params["TextLogits"]["kernel"]))


def test_pretrained_embedding_injection(tiny_csv):
    cfg = get_preset("text_only")
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=50, embed_dim=4, max_len=8))
    posts = csv_dataset.load_posts_csv(tiny_csv)[:10]
    v = vocab.build_vocabulary([p.text for p in posts], max_size=50, min_freq=1)
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=v.size))
    trainer = Trainer(cfg)
    matrix = np.arange(v.size * 4, dtype=np.float32).reshape(v.size, 4)
    batch = next(iter(csv_dataset.text_batches(posts, v, 4, 8)))
    state = trainer.init_state(jax.random.PRNGKey(0), batch,
                               embedding_matrix=matrix)
    np.testing.assert_array_equal(
        np.asarray(state.params["WordEmbedding/embeddings"]), matrix)


def test_eval_loss_masks_padding(tiny_csv):
    """Eval loss over a padded batch must equal the unpadded value — padding
    rows (weight=0, duplicated examples) contribute to neither the metrics
    nor the loss."""
    cfg = get_preset("text_only")
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=100, embed_dim=8,
                                            max_len=8))
    posts = csv_dataset.load_posts_csv(tiny_csv)[:8]
    v = vocab.build_vocabulary([p.text for p in posts], max_size=100, min_freq=1)
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=v.size))
    trainer = Trainer(cfg)
    clean = next(iter(csv_dataset.text_batches(
        posts, v, 8, 8, shuffle=False, num_epochs=1)))
    state = trainer.init_state(jax.random.PRNGKey(0), clean)

    # Pad the batch to 16 rows by repeating the last example with weight=0.
    def pad(x):
        return np.concatenate([x, np.repeat(x[-1:], 8, axis=0)], axis=0)

    padded = {k: pad(np.asarray(val)) for k, val in clean.items()}
    padded["weight"] = np.array([1] * 8 + [0] * 8, np.int32)

    s_clean = trainer.evaluate(state, [clean])
    s_padded = trainer.evaluate(state, [padded])
    assert s_padded["count"] == s_clean["count"] == 8
    assert abs(s_padded["loss"] - s_clean["loss"]) < 1e-5, \
        (s_padded["loss"], s_clean["loss"])
    assert abs(s_padded["accuracy"] - s_clean["accuracy"]) < 1e-9


def test_trainable_scope_matching_is_segment_based():
    """'Logits' must not match 'AuxLogits' (slim prefix semantics)."""
    from tumblr_emotions_tpu.train.trainer import make_optimizer
    from tumblr_emotions_tpu.config import get_preset

    cfg = get_preset("image_frozen")
    cfg = cfg.replace(train=cfg.train.replace(trainable_scopes="Logits"))
    params = {
        "Logits/Conv2d_1c_1x1": {"weights": jnp.zeros((1, 1, 4, 15))},
        "AuxLogits/Conv2d_2b_1x1": {"weights": jnp.zeros((1, 1, 4, 15))},
        "Conv2d_1a_3x3": {"weights": jnp.zeros((3, 3, 3, 8))},
    }
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert np.any(np.asarray(updates["Logits/Conv2d_1c_1x1"]["weights"]) != 0)
    assert np.all(np.asarray(updates["AuxLogits/Conv2d_2b_1x1"]["weights"]) == 0)
    assert np.all(np.asarray(updates["Conv2d_1a_3x3"]["weights"]) == 0)


def test_stop_frozen_gradients_cuts_frozen_leaves():
    """Frozen leaves get ZERO gradients (so XLA can dead-code their
    backward), trainable leaves keep real ones; structure unchanged."""
    from tumblr_emotions_tpu.train.trainer import stop_frozen_gradients

    params = {
        "Logits": {"kernel": jnp.ones((3,))},
        "AuxLogits": {"kernel": jnp.ones((3,))},
        "Conv2d_1a_3x3": {"weights": jnp.ones((3,))},
    }

    def loss(p):
        masked = stop_frozen_gradients(p, "Logits")
        return sum(jnp.sum(v ** 2) for leaf in masked.values()
                   for v in leaf.values())

    grads = jax.grad(loss)(params)
    assert np.all(np.asarray(grads["Logits"]["kernel"]) == 2.0)
    assert np.all(np.asarray(grads["AuxLogits"]["kernel"]) == 0.0)
    assert np.all(np.asarray(grads["Conv2d_1a_3x3"]["weights"]) == 0.0)
    # No scopes: identity (no masking applied).
    g2 = jax.grad(lambda p: sum(jnp.sum(stop_frozen_gradients(p, "")[k]
                                        [kk] ** 2)
                                for k in p for kk in p[k]))(params)
    assert np.all(np.asarray(g2["Conv2d_1a_3x3"]["weights"]) == 2.0)
