"""CLI-level regression tests for the round-2 commands: the parity gate
round trip and batch inference with the serving engines."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu import cli
from tumblr_emotions_tpu.models import InceptionV3
from tumblr_emotions_tpu.utils import checkpoint as ckpt_lib

pytestmark = pytest.mark.heavy  # full-tower CPU compiles


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.ones((1, 299, 299, 3)), train=False)
    path = str(d / "small.ckpt")
    ckpt_lib.save_as_slim_checkpoint(v, path)
    rng = np.random.RandomState(0)
    imgs = str(d / "imgs.npz")
    np.savez(imgs, raw=rng.randint(0, 256, (2, 330, 340, 3), dtype=np.uint8))
    return path, imgs, str(d)


def test_parity_gate_round_trip(small_ckpt, capsys):
    ckpt, imgs, d = small_ckpt
    goldens = os.path.join(d, "goldens.npz")
    rc = cli.main(["parity", "--warmstart", ckpt, "--images", imgs,
                   "--save-goldens", goldens,
                   "--depth-multiplier", "0.25", "--min-depth", "8"])
    assert rc == 0
    rc = cli.main(["parity", "--warmstart", ckpt, "--goldens", goldens,
                   "--depth-multiplier", "0.25", "--min-depth", "8"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["pass"] is True
    assert report["max_abs_diff"] <= 1e-4
    assert report["num_classes"] == 7


def test_parity_gate_fails_on_wrong_goldens(small_ckpt, capsys):
    ckpt, imgs, d = small_ckpt
    goldens = os.path.join(d, "goldens.npz")
    data = dict(np.load(goldens))
    data["logits"] = data["logits"] + 0.01
    bad = os.path.join(d, "bad.npz")
    np.savez(bad, **data)
    rc = cli.main(["parity", "--warmstart", ckpt, "--goldens", bad,
                   "--depth-multiplier", "0.25", "--min-depth", "8"])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["pass"] is False


@pytest.fixture(scope="module")
def tiny_records(tmp_path_factory):
    import io

    from PIL import Image

    from tumblr_emotions_tpu.data import records

    d = tmp_path_factory.mktemp("recs")
    rng = np.random.RandomState(0)
    exs = []
    for i in range(10):
        img = (np.cumsum(np.cumsum(rng.rand(96, 120, 3), 0), 1) * 7
               % 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=90)
        exs.append(records.post_to_example(buf.getvalue(), f"post {i}",
                                           i % 15, post_id=str(i)))
    records.write_sharded_tfrecords(exs, str(d), "train", 1)
    return str(d)


@pytest.mark.parametrize("engine", ["int8", "bf16"])
def test_infer_engines(tiny_records, tmp_path, engine, capsys):
    out = str(tmp_path / f"preds_{engine}.jsonl")
    rc = cli.main(["infer", "--model", "image",
                   "--records", os.path.join(tiny_records, "train-*.tfrecord"),
                   "--depth-multiplier", "0.25", "--no-aux",
                   "--batch-size", "4", "--engine", engine, "--out", out,
                   "--checkpoint-dir", str(tmp_path / "ckpt")])
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 10
    for l in lines:
        assert abs(sum(l["probs"].values()) - 1.0) < 1e-2
        assert l["top1"] in l["probs"]
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["examples"] == 10 and summary["engine"] == engine


def test_infer_joint_with_engine(tiny_records, tmp_path, capsys):
    """Joint-model serving: int8 engine for the tower, flax fuse() for the
    text branch + fusion head."""
    from tumblr_emotions_tpu.data import vocab as vocab_lib

    v = vocab_lib.build_vocabulary([f"post {i}" for i in range(10)],
                                   min_freq=1)
    vpath = str(tmp_path / "vocab.txt")
    v.save(vpath)
    out = str(tmp_path / "preds_joint.jsonl")
    rc = cli.main(["infer", "--model", "joint", "--vocab", vpath,
                   "--records", os.path.join(tiny_records, "train-*.tfrecord"),
                   "--depth-multiplier", "0.25", "--no-aux", "--max-len", "8",
                   "--batch-size", "4", "--engine", "int8", "--out", out,
                   "--checkpoint-dir", str(tmp_path / "ckpt")])
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 10
    for l in lines:
        assert abs(sum(l["probs"].values()) - 1.0) < 1e-2


def test_tune_sweeps_and_caches(tmp_path, capsys):
    """`cli tune` sweeps the candidate ladder on the local backend (every
    TPU flag is rejected on CPU, so the empty option set wins), prints the
    per-candidate rates, and persists the winner to the JSON cache."""
    cands = str(tmp_path / "cands.json")
    with open(cands, "w") as f:
        json.dump([{}, {"xla_surely_not_a_real_flag": "1"}], f)
    cache = str(tmp_path / "tune.json")
    rc = cli.main(["tune", "--engine", "int8", "--batch-size", "4",
                   "--image-size", "320", "--steps", "2", "--repeats", "1",
                   "--depth-multiplier", "0.25", "--cache", cache,
                   "--candidates", cands])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["best_options"] == {}
    assert report["candidates_measured"] == 1  # the bogus flag was skipped
    assert report["best_images_per_sec"] > 0
    assert "TET_COMPILER_OPTIONS" in report["apply_hint"]
    cached = json.load(open(cache))
    # Custom --candidates sweeps cache under a list-digest-suffixed key so
    # a different ladder is never served this winner.
    keys = [k for k in cached if k.startswith("serving/int8/b4")]
    assert keys and cached[keys[0]] == {}


def test_tune_rejects_bad_candidates_file(tmp_path):
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump({"not": "a list"}, f)
    with pytest.raises(SystemExit, match="candidates"):
        cli.main(["tune", "--candidates", bad])


def test_cli_tune_train_step(tmp_path, capsys):
    """--step train sweeps the jitted train step and prints the
    TET_TRAIN_COMPILER_OPTIONS apply hint + a JSON cache entry."""
    cand = str(tmp_path / "cands.json")
    with open(cand, "w") as f:
        json.dump([{}], f)  # only the empty candidate: fast on CPU
    cache = str(tmp_path / "tune.json")
    rc = cli.main(["tune", "--step", "train", "--batch-size", "2",
                   "--image-size", "96", "--depth-multiplier", "0.25",
                   "--steps", "1", "--repeats", "1",
                   "--cache", cache, "--candidates", cand])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == "train"
    assert out["candidates_measured"] == 1
    assert "TET_TRAIN_COMPILER_OPTIONS" in out["apply_hint"]
    with open(cache) as f:
        assert any(k.startswith("train/joint/b2") for k in json.load(f))
