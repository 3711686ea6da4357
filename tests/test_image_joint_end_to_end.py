"""End-to-end image and joint models (BASELINE configs 2-3, tiny scale):
synthetic JPEG posts -> TFRecords -> grain pipeline -> device-side train
preprocessing fused into the jit step -> train -> eval -> single-post
predict.  Uses a depth_multiplier=0.25, 75px Inception so the 1-core CPU
sandbox can compile the train step."""

import io
import os

import jax
import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import pipeline, records, vocab
from tumblr_emotions_tpu.train import Trainer
from tumblr_emotions_tpu.train.predict import Predictor

pytestmark = pytest.mark.heavy  # multi-minute full-tower CPU compiles


def _jpeg(seed, hw=(100, 120)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (np.cumsum(np.cumsum(rng.rand(*hw, 3), 0), 1) * 9 % 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_preset("joint_finetune")
    return cfg.replace(
        text=cfg.text.replace(vocab_size=64, embed_dim=16, max_len=8),
        image=cfg.image.replace(image_size=75, depth_multiplier=0.25,
                                create_aux_logits=False),
        train=cfg.train.replace(batch_size=8, num_steps=4, log_every=100,
                                optimizer="adam", learning_rate=1e-3),
    )


@pytest.fixture(scope="module")
def record_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("joint_records")
    exs = [records.post_to_example(
        _jpeg(i), f"feeling {EMOTIONS[i % 15]} today", i % 15, post_id=str(i))
        for i in range(24)]
    records.write_sharded_tfrecords(exs, str(d), "train", 2)
    return str(d)


@pytest.fixture(scope="module")
def v():
    return vocab.build_vocabulary(
        [f"feeling {e} today" for e in EMOTIONS], min_freq=1)


def _batches(record_dir, v, cfg):
    pcfg = pipeline.PipelineConfig(
        batch_size=cfg.train.batch_size, host_size=86,
        max_len=cfg.text.max_len, shuffle=True, seed=0)
    return pipeline.batches(os.path.join(record_dir, "train-*.tfrecord"),
                            v, pcfg)


def test_joint_model_end_to_end(tiny_cfg, record_dir, v):
    cfg = tiny_cfg.replace(text=tiny_cfg.text.replace(vocab_size=v.size))
    trainer = Trainer(cfg, preprocess="train")
    it = iter(_batches(record_dir, v, cfg))
    first = next(it)
    assert first["image"].dtype == np.uint8 and first["image"].shape == (8, 86, 86, 3)
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    import itertools

    state = trainer.fit(state, itertools.chain([first], it), num_steps=4)
    assert int(state.step) == 4

    # Eval with device-side eval preprocessing on uint8 host batches.
    trainer.preprocess = "eval"
    trainer._compiled_eval = None
    eval_batches = []
    it2 = iter(_batches(record_dir, v, cfg))
    for _ in range(2):
        eval_batches.append(next(it2))
    summary = trainer.evaluate(state, eval_batches, class_names=EMOTIONS)
    assert 0.0 <= summary["accuracy"] <= 1.0
    assert summary["count"] == 16

    # Single-post predict at native resolution (parity path, batch 1).
    predictor = Predictor(
        cfg, {"params": state.params, "batch_stats": state.batch_stats},
        vocab=v)
    probs = predictor.predict(image_bytes=_jpeg(99), text="feeling happy today")
    assert set(probs) == set(EMOTIONS)
    assert abs(sum(probs.values()) - 1.0) < 1e-4


def test_image_only_model_with_frozen_backbone(tiny_cfg, record_dir, v):
    """Config 2: image-only, trainable_scopes=Logits (head-only phase)."""
    cfg = tiny_cfg.replace(
        model="image",
        train=tiny_cfg.train.replace(trainable_scopes="Logits", num_steps=2))
    trainer = Trainer(cfg, preprocess="train")
    it = iter(_batches(record_dir, v, cfg))
    first = next(it)
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    stem0 = np.asarray(state.params["Conv2d_1a_3x3"]["weights"]).copy()
    head0 = np.asarray(
        state.params["Logits/Conv2d_1c_1x1"]["weights"]).copy()
    import itertools

    state = trainer.fit(state, itertools.chain([first], it), num_steps=2)
    assert np.array_equal(
        stem0, np.asarray(state.params["Conv2d_1a_3x3"]["weights"]))
    assert not np.array_equal(
        head0, np.asarray(state.params["Logits/Conv2d_1c_1x1"]["weights"]))
