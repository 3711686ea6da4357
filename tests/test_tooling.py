"""Scraper (fake client), dataset converter, analysis, and CLI tests."""

import io
import json
import os

import numpy as np
import pytest

from tumblr_emotions_tpu import analysis
from tumblr_emotions_tpu.config import EMOTIONS
from tumblr_emotions_tpu.data import convert, records, scraper


def _jpeg(seed, hw=(80, 100)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (np.cumsum(np.cumsum(rng.rand(*hw, 3), 0), 1) * 7 % 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


class FakeTumblrClient:
    """Pages of fake posts per tag, mimicking pytumblr.tagged()."""

    def __init__(self, pages=3, per_page=4):
        self.pages = pages
        self.per_page = per_page

    def tagged(self, tag, before=None):
        page = 0 if before is None else (10_000 - before)
        if page >= self.pages:
            return []
        posts = []
        for i in range(self.per_page):
            pid = page * self.per_page + i
            good = (pid % 4 != 3)  # every 4th post lacks a caption
            posts.append({
                "id": f"{tag}-{pid}",
                "type": "photo" if pid % 5 != 4 else "text",
                "timestamp": 10_000 - page - 1,
                "caption": f"<p>feeling so {tag} today {pid}</p>" if good else "",
                "photos": [{"original_size":
                            {"url": f"http://x/{tag}/{pid}.jpg"}}],
            })
        return posts


def test_scrape_emotion_filters_and_pages():
    client = FakeTumblrClient()
    posts = scraper.scrape_emotion(client, "happy", max_posts=100)
    assert posts  # got some
    assert all(p.text and p.image_url for p in posts)
    assert all("<p>" not in p.text for p in posts)  # html stripped
    assert all(p.emotion == "happy" for p in posts)


def test_scrape_all_writes_csv_and_images(tmp_path):
    client = FakeTumblrClient(pages=1)
    fetched = {}

    def fake_fetch(url):
        fetched[url] = True
        return _jpeg(hash(url) % 100)

    csv_path = scraper.scrape_all(client, emotions=("happy", "sad"),
                                  max_posts_per_emotion=5,
                                  out_dir=str(tmp_path), fetch=fake_fetch)
    assert os.path.exists(csv_path)
    from tumblr_emotions_tpu.data.csv_dataset import load_posts_csv

    posts = load_posts_csv(csv_path)
    assert posts and fetched
    img = os.path.join(str(tmp_path), "images", posts[0].image_path)
    assert os.path.exists(img)


def test_convert_dataset_end_to_end(tmp_path):
    # Build a scraped-style layout then convert.
    img_dir = tmp_path / "images"
    rows = ["id,emotion,text,image"]
    for i, emotion in enumerate(EMOTIONS[:4]):
        for k in range(6):
            rel = f"{emotion}/{k}.jpg"
            p = img_dir / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(_jpeg(i * 10 + k))
            rows.append(f"{emotion}{k},{emotion},feeling {emotion} {k},{rel}")
    # one corrupt image row
    (img_dir / "broken.jpg").write_bytes(b"nope")
    rows.append("bad,happy,broken image,broken.jpg")
    csv_path = tmp_path / "posts.csv"
    csv_path.write_text("\n".join(rows) + "\n")

    out = tmp_path / "records"
    counts = convert.convert(str(csv_path), str(img_dir), str(out),
                             num_shards=2, valid_fraction=0.25, min_freq=1)
    assert counts["skipped"] == 1
    assert counts["train"] + counts["validation"] == 24
    assert os.path.exists(out / "labels.txt")
    assert os.path.exists(out / "vocab.txt")
    got = sum(1 for _ in records.read_sharded(str(out / "train-*.tfrecord")))
    assert got == counts["train"]
    post = records.example_to_post(
        next(records.read_sharded(str(out / "train-*.tfrecord"))))
    assert post["label"] >= 0 and post["image"][:2] == b"\xff\xd8"


def test_pca_circumplex_recovers_structure():
    # Synthetic: class means lie on a circle in a 2-D subspace of R^15.
    rng = np.random.RandomState(0)
    C = 15
    angles = np.linspace(0, 2 * np.pi, C, endpoint=False)
    basis = rng.randn(2, C)
    means = np.stack([np.cos(a) * basis[0] + np.sin(a) * basis[1]
                      for a in angles])
    labels = np.repeat(np.arange(C), 50)
    probs = means[labels] + 0.01 * rng.randn(len(labels), C)
    result = analysis.circumplex(probs, labels)
    assert sum(result["explained_variance"]) > 0.95
    order = analysis.angular_order(result["coords"])
    assert len(order) == C
    # Angular order must match the generating circle (up to rotation/flip).
    gen_order = [EMOTIONS[i] for i in range(C)]
    start = order.index(gen_order[0])
    rotated = order[start:] + order[:start]
    assert rotated == gen_order or rotated == [gen_order[0]] + gen_order[1:][::-1]
    print(analysis.format_circumplex(result))


def test_cli_text_train_eval_predict(tmp_path):
    from tumblr_emotions_tpu import cli

    rows = ["id,text,emotion"]
    rng = np.random.RandomState(0)
    for emotion in EMOTIONS:
        for k in range(8):
            filler = " ".join(rng.choice(["the", "a", "so"], 2))
            rows.append(f"{emotion}{k},{filler} feeling {emotion} now,{emotion}")
    csv_path = tmp_path / "posts.csv"
    csv_path.write_text("\n".join(rows) + "\n")
    ckpt = str(tmp_path / "ckpt")

    rc = cli.main(["build-vocab", "--csv", str(csv_path),
                   "--out", str(tmp_path / "vocab.txt"), "--min-freq", "1"])
    assert rc == 0

    rc = cli.main(["train", "--preset", "text_only", "--csv", str(csv_path),
                   "--vocab", str(tmp_path / "vocab.txt"),
                   "--checkpoint-dir", ckpt, "--steps", "60",
                   "--batch-size", "32", "--max-len", "8"])
    assert rc == 0

    rc = cli.main(["eval", "--preset", "text_only", "--csv", str(csv_path),
                   "--vocab", str(tmp_path / "vocab.txt"),
                   "--checkpoint-dir", ckpt, "--max-len", "8"])
    assert rc == 0

    rc = cli.main(["predict", "--preset", "text_only",
                   "--vocab", str(tmp_path / "vocab.txt"),
                   "--checkpoint-dir", ckpt, "--max-len", "8",
                   "--text", "feeling happy now"])
    assert rc == 0


def test_summary_writer_and_profiler(tmp_path):
    """Metric writer produces TensorBoard event files; profiler hook captures
    a trace directory (SURVEY.md §5 observability)."""
    from tumblr_emotions_tpu.utils.summaries import ProfilerHook, SummaryWriter

    logdir = str(tmp_path / "tb")
    w = SummaryWriter(logdir)
    w.write_scalars(1, {"train/loss": 2.7, "train/accuracy": 0.1})
    w.write_scalars(2, {"train/loss": 2.5, "train/accuracy": 0.2})
    w.flush()
    files = []
    for root, _, names in os.walk(logdir):
        files.extend(names)
    assert any("tfevents" in n for n in files), files

    import jax
    import jax.numpy as jnp

    hook = ProfilerHook(str(tmp_path / "trace"), start_step=2, num_steps=1)
    for step in (1, 2, 3):
        hook.maybe_start(step)
        jnp.ones((8, 8)).sum().block_until_ready()
        hook.maybe_stop(step)
    hook.stop_if_active()
    assert os.path.isdir(str(tmp_path / "trace"))


def test_cli_analyze(tmp_path):
    from tumblr_emotions_tpu import cli

    rows = ["id,text,emotion"]
    for emotion in EMOTIONS:
        for k in range(6):
            rows.append(f"{emotion}{k},feeling {emotion} right now,{emotion}")
    csv_path = tmp_path / "posts.csv"
    csv_path.write_text("\n".join(rows) + "\n")
    ckpt = str(tmp_path / "ckpt")
    assert cli.main(["build-vocab", "--csv", str(csv_path),
                     "--out", str(tmp_path / "v.txt"), "--min-freq", "1"]) == 0
    assert cli.main(["train", "--preset", "text_only", "--csv", str(csv_path),
                     "--vocab", str(tmp_path / "v.txt"),
                     "--checkpoint-dir", ckpt, "--steps", "30",
                     "--batch-size", "16", "--max-len", "8"]) == 0
    report = tmp_path / "examples.md"
    assert cli.main(["analyze", "--preset", "text_only", "--csv", str(csv_path),
                     "--vocab", str(tmp_path / "v.txt"),
                     "--checkpoint-dir", ckpt, "--max-len", "8",
                     "--examples", str(report), "--top-k", "2"]) == 0
    md = report.read_text()
    # Per-emotion sections with resolved post ids/texts, plus the
    # confusion-pair browser (SURVEY §2a #13 qualitative examples).
    for emotion in EMOTIONS:
        assert f"## {emotion}" in md
    assert "Confusion pairs" in md
    assert "feeling" in md  # post text resolved into the report


def test_qualitative_examples_structure():
    from tumblr_emotions_tpu import analysis

    rng = np.random.RandomState(0)
    C = 4
    emotions = ["a", "b", "c", "d"]
    labels = np.repeat(np.arange(C), 25)
    logits = rng.randn(100, C) * 0.1
    logits[np.arange(100), labels] += 2.0  # mostly correct
    rows = np.arange(0, 100, 10)
    logits[rows, (labels[rows] + 1) % C] += 4.0  # planted confusions
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    res = analysis.qualitative_examples(probs, labels, emotions=emotions,
                                        k=3)
    assert res["n"] == 100 and 0.8 < res["accuracy"] < 1.0
    for e in emotions:
        block = res["per_emotion"][e]
        assert block["count"] == 25
        assert len(block["correct"]) <= 3
        # hits sorted by confidence, misses carry the predicted class
        ps = [x["prob"] for x in block["correct"]]
        assert ps == sorted(ps, reverse=True)
        for m in block["misclassified"]:
            assert m["pred"] != e and 0 <= m["index"] < 100
    # planted (c -> c+1) confusions dominate
    top = res["confusions"][0]
    assert top["count"] >= 2 and top["examples"]
    text = analysis.format_examples(res)
    assert "top confusion pairs" in text


def test_cli_two_phase_and_trained_embeddings(tmp_path):
    """--head-steps two-phase recipe + train-embeddings command."""
    from tumblr_emotions_tpu import cli

    rows = ["id,text,emotion"]
    for emotion in EMOTIONS:
        for k in range(6):
            rows.append(f"{emotion}{k},feeling {emotion} so {emotion},{emotion}")
    csv_path = tmp_path / "posts.csv"
    csv_path.write_text("\n".join(rows) + "\n")
    assert cli.main(["build-vocab", "--csv", str(csv_path),
                     "--out", str(tmp_path / "v.txt"), "--min-freq", "1"]) == 0
    assert cli.main(["train-embeddings", "--csv", str(csv_path),
                     "--vocab", str(tmp_path / "v.txt"),
                     "--out", str(tmp_path / "emb.npy"),
                     "--embed-dim", "8", "--steps", "50"]) == 0
    assert os.path.exists(tmp_path / "emb.npy")

    # Two-phase text training with the trained embeddings.
    assert cli.main(["train", "--preset", "text_only", "--csv", str(csv_path),
                     "--vocab", str(tmp_path / "v.txt"),
                     "--embeddings", str(tmp_path / "emb.npy"),
                     "--checkpoint-dir", str(tmp_path / "ck"),
                     "--steps", "20", "--head-steps", "10",
                     "--batch-size", "16", "--max-len", "8"]) == 0


def test_cli_export_checkpoint_roundtrip(tmp_path):
    """Orbax-trained image model -> slim .ckpt -> load_slim_checkpoint."""
    import jax
    import jax.numpy as jnp

    from tumblr_emotions_tpu import cli
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train import Trainer
    from tumblr_emotions_tpu.utils import checkpoint as ckpt_lib

    cfg = get_preset("image_frozen")
    cfg = cfg.replace(
        image=cfg.image.replace(image_size=75, depth_multiplier=0.25,
                                create_aux_logits=False),
        train=cfg.train.replace(checkpoint_dir=str(tmp_path / "ck"),
                                trainable_scopes=""))
    trainer = Trainer(cfg)
    sample = {"image": np.zeros((1, 75, 75, 3), np.float32),
              "label": np.zeros((1,), np.int32)}
    state = trainer.init_state(jax.random.PRNGKey(3), sample)
    trainer.checkpoint_manager()
    trainer.save_checkpoint(state)

    out = str(tmp_path / "export" / "model.ckpt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rc = cli.main(["export-checkpoint", "--preset", "image_frozen",
                   "--model", "image", "--image-size", "75",
                   "--depth-multiplier", "0.25", "--no-aux",
                   "--trainable-scopes", "",
                   "--checkpoint-dir", str(tmp_path / "ck"), "--out", out])
    assert rc == 0
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    path = out
    loaded = ckpt_lib.load_slim_checkpoint(path)
    merged = ckpt_lib.merge_pretrained(variables, loaded)
    a = np.asarray(merged["params"]["Conv2d_1a_3x3"]["weights"])
    b = np.asarray(state.params["Conv2d_1a_3x3"]["weights"])
    np.testing.assert_array_equal(a, b)


def test_cli_csv_with_image_model_errors(tmp_path):
    from tumblr_emotions_tpu import cli

    csv_path = tmp_path / "p.csv"
    csv_path.write_text("id,text,emotion\na,feeling happy,happy\n")
    with pytest.raises(SystemExit, match="needs .*images|images"):
        cli.main(["train", "--preset", "joint_finetune", "--csv",
                  str(csv_path), "--steps", "1"])


def test_plot_circumplex(tmp_path):
    """The analyze figure (the reference notebooks' visual output)."""
    from tumblr_emotions_tpu import analysis

    rng = np.random.RandomState(0)
    labels = rng.randint(0, 15, 300)
    probs = rng.dirichlet(np.ones(15), size=300)
    res = analysis.circumplex(probs, labels)
    p = analysis.plot_circumplex(res, str(tmp_path / "circ.png"))
    assert os.path.getsize(p) > 10_000


def test_build_model_joint_passes_bn_and_precision():
    """The joint model must inherit EVERY image-tower knob from the config
    (round-2 fixed depth_multiplier; round-3 found bn_momentum/epsilon/
    scale and MXU precision silently dropped the same way)."""
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train.trainer import build_model

    cfg = get_preset("joint_finetune")
    cfg = cfg.replace(image=cfg.image.replace(
        bn_momentum=0.9, bn_epsilon=0.01, bn_scale=True))
    model, _ = build_model(cfg)
    assert model.bn_momentum == 0.9
    assert model.bn_epsilon == 0.01
    assert model.bn_scale is True
    assert model.pad_id == cfg.text.pad_id
    # joint_finetune is parity mode: the image tower must run true-f32 MXU.
    assert model.precision == "highest"

    perf = cfg.replace(train=cfg.train.replace(precision_mode="perf"))
    model2, _ = build_model(perf)
    assert model2.precision is None


def test_tpu_jit_runs_and_exposes_cache_size():
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils.compile_opts import tpu_jit

    f = tpu_jit(lambda x: x * 2)
    np.testing.assert_array_equal(np.asarray(f(jnp.arange(4.0))),
                                  [0.0, 2.0, 4.0, 6.0])
    assert f._cache_size() >= 1


def test_autotune_skips_rejected_candidates_and_caches(tmp_path):
    """On the CPU backend every xla_tpu_* candidate is rejected, so the
    empty option set must win; the result must round-trip through the
    JSON cache without re-measuring."""
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils import compile_opts

    calls = {"n": 0}

    def f(x):
        calls["n"] += 1
        return x * 2 + 1

    cache = str(tmp_path / "tune.json")
    args = (jnp.arange(8.0),)
    cands = [{}, {"xla_surely_not_a_real_flag": "1"}]
    best = compile_opts.autotune(f, args, steps=2, repeats=1,
                                 candidates=cands, cache_path=cache)
    assert best == {}
    assert calls["n"] >= 1  # traced at least once
    traced = calls["n"]

    # Second call: served from cache, no new trace/measure.
    best2 = compile_opts.autotune(f, args, steps=2, repeats=1,
                                  candidates=cands, cache_path=cache)
    assert best2 == {}
    assert calls["n"] == traced

    # The winning options slot straight into tpu_jit.
    g = compile_opts.tpu_jit(lambda x: x - 1, compiler_options=best or
                             compile_opts.DEFAULT_TPU_COMPILER_OPTIONS)
    np.testing.assert_array_equal(np.asarray(g(jnp.ones(3))), [0.0] * 3)


def test_autotune_raises_when_nothing_compiles():
    import jax.numpy as jnp
    import pytest

    from tumblr_emotions_tpu.utils.compile_opts import autotune

    with pytest.raises(RuntimeError, match="every candidate failed"):
        autotune(lambda x: x, (jnp.zeros(2),), steps=1, repeats=1,
                 candidates=[{"xla_surely_not_a_real_flag": "1"}])


def test_tpu_jit_falls_back_on_rejected_options():
    """An option the backend rejects must fall back to plain jit, not
    raise — the CPU test mesh compiles every served program this way."""
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils.compile_opts import tpu_jit

    f = tpu_jit(lambda x: x + 1,
                compiler_options={"xla_surely_not_a_real_flag": "1"})
    np.testing.assert_array_equal(np.asarray(f(jnp.zeros(2))), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(f(jnp.ones(2))), [2.0, 2.0])


def test_compiler_options_env_override(monkeypatch):
    """TET_COMPILER_OPTIONS (the `cli tune` apply hint) overrides the
    built-in defaults for every tpu_jit call site; '{}' disables flags."""
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils import compile_opts

    monkeypatch.setenv("TET_COMPILER_OPTIONS",
                       '{"xla_tpu_scoped_vmem_limit_kib": 32768}')
    assert compile_opts.default_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}  # values coerced to str

    monkeypatch.setenv("TET_COMPILER_OPTIONS", "{}")
    f = compile_opts.tpu_jit(lambda x: x + 1)
    np.testing.assert_array_equal(np.asarray(f(jnp.zeros(2))), [1.0, 1.0])
    assert f._flagged is f._plain  # no flagged compile when options are empty

    monkeypatch.setenv("TET_COMPILER_OPTIONS", "not json")
    with pytest.raises(ValueError, match="not valid JSON"):
        compile_opts.default_options()
    monkeypatch.setenv("TET_COMPILER_OPTIONS", '["list"]')
    with pytest.raises(ValueError, match="JSON object"):
        compile_opts.default_options()

    monkeypatch.delenv("TET_COMPILER_OPTIONS")
    assert (compile_opts.default_options()
            == compile_opts.DEFAULT_TPU_COMPILER_OPTIONS)


def test_train_compiler_options_default(monkeypatch):
    """Train compiles get 64M scoped vmem ONLY (measured +4%; the serving
    trio's scavenging costs the backward+optimizer program ~4%);
    TET_TRAIN_COMPILER_OPTIONS overrides."""
    from tumblr_emotions_tpu.utils import compile_opts

    assert compile_opts.train_default_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
    # In particular the serving set's scavenge/downcast flags must NOT
    # be applied to train compiles.
    assert "xla_tpu_scavenge_vmem_for_fusions" not in (
        compile_opts.train_default_options())
    monkeypatch.setenv("TET_TRAIN_COMPILER_OPTIONS",
                       '{"xla_tpu_scoped_vmem_limit_kib": "32768"}')
    assert compile_opts.train_default_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}
    # The serving-side env var does not leak into the train path.
    monkeypatch.setenv("TET_COMPILER_OPTIONS", '{"a": "b"}')
    monkeypatch.delenv("TET_TRAIN_COMPILER_OPTIONS")
    assert compile_opts.train_default_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}


def test_bench_setup_on_device_matches_init_tree():
    """bench._setup_on_device must return variables structurally identical
    to model.init's (it replaces the init to dodge a full-tower device
    compile), uint8 batches of the right shape, and f32 calib images.
    Uses a thin tower so the CPU fill compile stays cheap."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train import build_model

    cfg = get_preset("fused_inference")
    cfg = cfg.replace(image=cfg.image.replace(depth_multiplier=0.25))
    model, _ = build_model(cfg)
    variables, batches, calib = bench._setup_on_device(
        model, batch=4, src=64, calib_n=2)

    expected = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 299, 299, 3), jnp.bfloat16),
                           train=False))
    got_flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    exp_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    assert len(got_flat) == len(exp_flat)
    for (gp, gl), (ep, el) in zip(got_flat, exp_flat):
        assert gp == ep
        assert gl.shape == el.shape and gl.dtype == el.dtype
        name = "/".join(str(getattr(p, "key", p)) for p in gp).lower()
        if "batch_stats" in name and "var" in name:
            assert float(jnp.min(gl)) == 1.0  # BN folding needs var > 0

    assert len(batches) == 4
    for b in batches:
        assert b.shape == (4, 64, 64, 3) and b.dtype == jnp.uint8
    # Distinct batches (distinct RNG keys actually applied).
    assert not bool(jnp.array_equal(batches[0], batches[1]))
    assert calib.shape == (2, 299, 299, 3) and calib.dtype == jnp.float32


def test_serving_forward_honors_preprocess_config():
    """ops.serving._forward must apply the configured image size / crop /
    resize method for the engine paths (not hardcoded eval defaults), and
    refuse from_uint8 when the int8-GEMM preprocess can't express the
    configured resize."""
    import jax.numpy as jnp
    import pytest

    from tumblr_emotions_tpu.ops import serving as serving_lib

    seen = {}

    def engine(x):
        seen["shape"] = tuple(x.shape)
        seen["dtype"] = x.dtype
        return None, jnp.zeros((x.shape[0], 8), jnp.float32)

    raw = np.random.RandomState(0).randint(
        0, 256, size=(2, 171, 171, 3), dtype=np.uint8)
    serving_lib._forward(engine, jnp.asarray(raw), from_uint8=False,
                         preprocess_dtype=jnp.float32, image_size=151,
                         central_fraction=1.0, resize_method="half_pixel")
    assert seen["shape"] == (2, 151, 151, 3)

    class FakeInt8:
        def forward_from_uint8(self, raw_u8, height=299, width=299,
                               central_fraction=0.875):
            seen["u8"] = (raw_u8.shape, height, width, central_fraction)
            return None, jnp.zeros((raw_u8.shape[0], 8), jnp.float32)

    serving_lib._forward(FakeInt8(), jnp.asarray(raw), from_uint8=True,
                         preprocess_dtype=jnp.bfloat16, image_size=151,
                         central_fraction=0.9, resize_method="tf1")
    assert seen["u8"][1:] == (151, 151, 0.9)

    with pytest.raises(ValueError, match="TF1 resize only"):
        serving_lib._forward(FakeInt8(), jnp.asarray(raw), from_uint8=True,
                             preprocess_dtype=jnp.bfloat16, image_size=151,
                             central_fraction=0.9,
                             resize_method="half_pixel")


def test_autotune_custom_candidates_not_served_default_cache(tmp_path):
    """A custom candidate list must not be served a winner cached from a
    different sweep under the same program key."""
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils import compile_opts

    cache = str(tmp_path / "tune.json")
    args = (jnp.arange(4.0),)
    best1 = compile_opts.autotune(lambda x: x + 1, args, steps=1, repeats=1,
                                  candidates=[{}], cache_path=cache,
                                  key="prog")
    assert best1 == {}
    seen = []
    best2 = compile_opts.autotune(
        lambda x: x + 1, args, steps=1, repeats=1,
        candidates=[{"xla_surely_not_a_real_flag": "1"}, {}],
        cache_path=cache, key="prog",
        on_result=lambda o, t: seen.append(o))
    assert best2 == {} and seen  # measured, not served from best1's entry


def test_tpu_jit_program_dependent_rejection_falls_back(monkeypatch, caplog):
    """A flag set the probe accepts can still fail to compile the REAL
    program; the first flagged call must fall back to a plain jit with a
    warning (advisor r3) — but only when no donated buffer was consumed."""
    import logging

    import jax
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils import compile_opts

    opts = {"xla_fake_flag_for_test": "true"}
    # Pretend the trivial probe accepted the flags by name.
    monkeypatch.setitem(compile_opts._PROBE_CACHE,
                        frozenset(opts.items()), True)
    real_jit = jax.jit

    def fake_jit(fn, **kw):
        if kw.pop("compiler_options", None):
            def boom(*a, **k):
                raise RuntimeError("program-dependent rejection")
            return boom
        return real_jit(fn, **kw)

    monkeypatch.setattr(compile_opts.jax, "jit", fake_jit)
    f = compile_opts.tpu_jit(lambda x: x + 1, compiler_options=opts)
    with caplog.at_level(logging.WARNING, "tumblr_emotions_tpu"):
        out = f(jnp.asarray(2.0))
    assert float(out) == 3.0
    assert any("falling back" in r.message for r in caplog.records)
    assert float(f(jnp.asarray(5.0))) == 6.0  # stays on the plain path


def test_tpu_jit_reraises_after_donation_consumed(monkeypatch):
    """If the flagged call fails AFTER execution began (donated buffer
    deleted), retrying would poke deleted buffers: it must re-raise."""
    import jax
    import jax.numpy as jnp

    from tumblr_emotions_tpu.utils import compile_opts

    opts = {"xla_fake_flag_for_test": "true"}
    monkeypatch.setitem(compile_opts._PROBE_CACHE,
                        frozenset(opts.items()), True)
    real_jit = jax.jit

    def fake_jit(fn, **kw):
        if kw.pop("compiler_options", None):
            def boom(*a, **k):
                for leaf in jax.tree_util.tree_leaves(a[0]):
                    leaf.delete()  # simulate: execution consumed the donation
                raise RuntimeError("runtime failure mid-execution")
            return boom
        return real_jit(fn, **kw)

    monkeypatch.setattr(compile_opts.jax, "jit", fake_jit)
    f = compile_opts.tpu_jit(lambda s, x: (s + x, x), compiler_options=opts,
                             donate_argnums=(0,))
    state = jax.device_put(jnp.asarray(1.0))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="mid-execution"):
        f(state, jnp.asarray(2.0))
