"""Continuous evaluation loop (slim ``evaluation_loop`` semantics —
SURVEY.md §2a #11 / §3.3): restore-latest, evaluate, wait for the next
checkpoint, repeat, stop at the final train step."""

import csv
import io
import os

import jax
import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import csv_dataset, pipeline, records, vocab
from tumblr_emotions_tpu.parallel import mesh as mesh_lib
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


def test_follow_times_out_when_restore_keeps_failing(text_setup, tmp_path,
                                                     monkeypatch):
    """A checkpoint step that exists but never restores (partially written
    or corrupt) must back off and honor --eval-timeout instead of
    busy-spinning forever (ADVICE r2 #1)."""
    posts, v = text_setup
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=8, num_steps=100, log_every=1000,
                                checkpoint_dir=str(tmp_path / "ckpt3"),
                                log_dir=str(tmp_path / "logs3")))
    trainer = Trainer(cfg)
    batches = list(csv_dataset.text_batches(
        posts, v, 8, cfg.text.max_len, seed=0, num_epochs=1,
        drop_remainder=False))
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    trainer.checkpoint_manager()
    trainer.save_checkpoint(state.replace(step=jax.numpy.asarray(1)))
    monkeypatch.setattr(trainer, "restore_latest", lambda s: None)

    import time as _time

    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        _time.sleep(0.01)  # consume real time like a real back-off would

    out = list(trainer.evaluate_continuously(
        state, lambda: batches, interval_secs=0.5, max_step=100,
        timeout_secs=0.2, _sleep=fake_sleep))
    assert out == []          # nothing ever evaluated
    assert len(sleeps) >= 1   # backed off rather than spinning
    assert len(sleeps) < 100  # ...and the deadline actually fired


def _jpeg(seed, hw=(40, 52)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (np.cumsum(np.cumsum(rng.rand(*hw, 3), 0), 1) * 7 % 255
           ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def test_dp_eval_over_records_with_ragged_split(tmp_path):
    """BASELINE config 5's eval leg: records-path eval on a multi-device
    mesh with a split size NOT divisible by the batch (or device count).
    The pipeline must pad the final batch to the static shape with
    weight=0 rows so (a) P("data") placement works and (b) the jitted
    eval step never recompiles (VERDICT r2 weak #3).
    """
    n_records = 21  # 21 % 8 = 5: short final batch on an 8-device mesh
    texts = [f"record {i} feels happy today" for i in range(n_records)]
    exs = [records.post_to_example(_jpeg(i), texts[i], i % 15,
                                   post_id=str(i))
           for i in range(n_records)]
    records.write_sharded_tfrecords(exs, str(tmp_path), "val", 2)
    v = vocab.build_vocabulary(texts, min_freq=1)

    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=8,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                log_dir=str(tmp_path / "logs")))
    mesh = mesh_lib.create_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(cfg, mesh=mesh)

    pcfg = pipeline.PipelineConfig(
        batch_size=8, host_size=32, max_len=8, shuffle=False,
        num_epochs=1, drop_remainder=False)
    pattern = os.path.join(str(tmp_path), "val-*.tfrecord")
    batches = list(pipeline.batches(pattern, v, pcfg))
    # Static shapes throughout, including the padded final batch.
    assert all(b["tokens"].shape == (8, 8) for b in batches)
    assert sum(int(b["weight"].sum()) for b in batches) == n_records

    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    summary = trainer.evaluate(state, batches, class_names=EMOTIONS)
    assert summary["count"] == n_records
    # One compilation: the padded batch reused the same executable.
    assert trainer._compiled_eval._cache_size() == 1


class _FakeResumableIter:
    """Minimal grain-like resumable iterator over a batch list."""

    def __init__(self, batch_list):
        self._batches = batch_list
        self.pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self.pos >= len(self._batches):
            raise StopIteration
        b = self._batches[self.pos]
        self.pos += 1
        return b

    def get_state(self):
        return {"pos": self.pos}

    def set_state(self, state):
        self.pos = int(state["pos"])


def test_fit_saves_input_position_and_runs_eval(text_setup, tmp_path):
    """fit(input_iterator=...) persists the input position with each
    checkpoint (trainer.restore_input_iterator restores it), and
    fit(eval_batches=...) actually evaluates at checkpoint intervals."""
    posts, v = text_setup
    cfg = get_preset("text_only")
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=v.size, embed_dim=8, max_len=8),
        train=cfg.train.replace(batch_size=8, num_steps=3, log_every=1000,
                                checkpoint_every=2,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                log_dir=str(tmp_path / "logs")))
    trainer = Trainer(cfg)
    batch_list = list(csv_dataset.text_batches(
        posts, v, 8, cfg.text.max_len, seed=0, num_epochs=2,
        drop_remainder=True))
    it = _FakeResumableIter(batch_list)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_list[0])
    trainer.checkpoint_manager()

    eval_calls = []

    def eval_batches():
        eval_calls.append(1)
        return batch_list[:2]

    trainer.fit(state, it, num_steps=3, eval_batches=eval_batches,
                input_iterator=it)
    assert eval_calls, "eval_batches was never evaluated"
    # One iterator-state file PER kept checkpoint step (advisor r3): a
    # restore of ANY kept checkpoint finds its matching input position.
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"),
                                       "input_iterator_2.json"))
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"),
                                       "input_iterator_3.json"))

    # A fresh iterator restores to the saved position (3 batches consumed).
    it2 = _FakeResumableIter(batch_list)
    assert trainer.restore_input_iterator(it2)
    assert it2.pos == 3
    # Restoring the OLDER kept checkpoint pairs with ITS position.
    it3 = _FakeResumableIter(batch_list)
    assert trainer.restore_input_iterator(it3, step=2)
    assert it3.pos == 2
    # Legacy layout (single overwritten file) still restores.
    legacy = _FakeResumableIter(batch_list)
    os.rename(os.path.join(str(tmp_path / "ckpt"), "input_iterator_3.json"),
              os.path.join(str(tmp_path / "ckpt"), "input_iterator.json"))
    assert trainer.restore_input_iterator(legacy)
    assert legacy.pos == 3
    # Plain generators are skipped gracefully.
    assert not trainer.restore_input_iterator(iter(batch_list))
