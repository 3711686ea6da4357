"""Continuous evaluation loop (slim ``evaluation_loop`` semantics —
SURVEY.md §2a #11 / §3.3): restore-latest, evaluate, wait for the next
checkpoint, repeat, stop at the final train step."""

import csv

import jax
import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import csv_dataset, vocab
from tumblr_emotions_tpu.train import Trainer


@pytest.fixture(scope="module")
def text_setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "posts.csv"
    rng = np.random.RandomState(0)
    rows = [{"id": f"{e}{k}", "text": f"feeling {e} so {e}", "emotion": e}
            for e in EMOTIONS[:4] for k in range(8)]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "text", "emotion"])
        w.writeheader()
        w.writerows(rows)
    posts = csv_dataset.load_posts_csv(str(path), emotions=EMOTIONS)
    v = vocab.build_vocabulary([p.text for p in posts], max_size=100,
                               min_freq=1)
    return posts, v


def test_follow_evaluates_each_new_checkpoint(text_setup, tmp_path):
    posts, v = text_setup
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=8, num_steps=2, log_every=1000,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                log_dir=str(tmp_path / "logs")))
    trainer = Trainer(cfg)
    batches = list(csv_dataset.text_batches(
        posts, v, 8, cfg.text.max_len, seed=0, num_epochs=1,
        drop_remainder=False))
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    trainer.checkpoint_manager()

    # Checkpoint @ step 1, then observe the loop evaluate it, then
    # checkpoint @ step 2 and observe that too — in order, then stop
    # (max_step reached).
    trainer.save_checkpoint(state.replace(step=jax.numpy.asarray(1)))
    sleeps = []
    gen = trainer.evaluate_continuously(
        state, lambda: batches, interval_secs=0.0, max_step=2,
        _sleep=lambda s: sleeps.append(s))
    step1, summary1 = next(gen)
    assert step1 == 1
    assert summary1["count"] == len(posts)

    trainer.save_checkpoint(state.replace(step=jax.numpy.asarray(2)))
    step2, summary2 = next(gen)
    assert step2 == 2
    with pytest.raises(StopIteration):  # reached max_step -> loop ends
        next(gen)


def test_follow_times_out_without_new_checkpoints(text_setup, tmp_path):
    posts, v = text_setup
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=8, num_steps=100, log_every=1000,
                                checkpoint_dir=str(tmp_path / "ckpt2"),
                                log_dir=str(tmp_path / "logs2")))
    trainer = Trainer(cfg)
    batches = list(csv_dataset.text_batches(
        posts, v, 8, cfg.text.max_len, seed=0, num_epochs=1,
        drop_remainder=False))
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    trainer.checkpoint_manager()
    trainer.save_checkpoint(state.replace(step=jax.numpy.asarray(1)))

    out = list(trainer.evaluate_continuously(
        state, lambda: batches, interval_secs=1.0, max_step=100,
        timeout_secs=2.0, _sleep=lambda s: None))
    # One evaluation (step 1), then timeout ends the loop despite
    # max_step not being reached.
    assert [s for s, _ in out] == [1]
