"""Vocab + record IO tests, incl. byte-compat against TF's own readers."""

import os

import numpy as np
import pytest

from tumblr_emotions_tpu.data import records, vocab


def test_tokenize():
    assert vocab.tokenize("I'm SO happy!! #happy http://t.co/x") == \
        ["i'm", "so", "happy", "happy"]


def test_vocab_build_encode_roundtrip(tmp_path):
    texts = ["happy happy joy", "sad and blue", "happy days", "joy joy joy"]
    v = vocab.build_vocabulary(texts, max_size=100, min_freq=2)
    assert v.id_to_token[:2] == [vocab.PAD_TOKEN, vocab.OOV_TOKEN]
    assert "happy" in v.token_to_id and "joy" in v.token_to_id
    assert "blue" not in v.token_to_id  # freq 1 < min_freq

    ids, length = v.encode("happy joy zebra", max_len=5)
    assert length == 3
    assert ids[0] == v.token_to_id["happy"]
    assert ids[2] == vocab.OOV_ID          # zebra unseen
    assert list(ids[3:]) == [vocab.PAD_ID, vocab.PAD_ID]

    p = tmp_path / "vocab.txt"
    v.save(str(p))
    v2 = vocab.Vocabulary.load(str(p))
    assert v2.token_to_id == v.token_to_id


def test_glove_loading(tmp_path):
    v = vocab.build_vocabulary(["happy sad happy sad"], min_freq=1)
    p = tmp_path / "glove.txt"
    p.write_text("happy 1.0 2.0 3.0\nsad -1.0 -2.0 -3.0\nunused 9 9 9\n")
    m = vocab.load_embeddings(str(p), v, embed_dim=3)
    assert m.shape == (v.size, 3)
    np.testing.assert_allclose(m[v.token_to_id["happy"]], [1, 2, 3])
    np.testing.assert_allclose(m[vocab.PAD_ID], 0.0)


def test_example_roundtrip():
    ex = records.post_to_example(b"\x01\x02jpegdata", "so happy #happy", 8,
                                 post_id="p123")
    post = records.example_to_post(ex)
    assert post["image"] == b"\x01\x02jpegdata"
    assert post["text"] == "so happy #happy"
    assert post["label"] == 8
    assert post["id"] == "p123"
    assert post["format"] == "jpg"


def test_tfrecord_roundtrip(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"", b"x" * 10_000]
    with records.TFRecordWriter(p) as w:
        for r in recs:
            w.write(r)
    assert list(records.read_tfrecords(p)) == recs


def test_tfrecord_crc_detects_corruption(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    with records.TFRecordWriter(p) as w:
        w.write(b"payload-payload")
    raw = bytearray(open(p, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(records.read_tfrecords(p))


def test_sharded_write_read(tmp_path):
    exs = [records.post_to_example(b"img%d" % i, f"text {i}", i % 15)
           for i in range(20)]
    paths = records.write_sharded_tfrecords(exs, str(tmp_path), "train", 4)
    assert len(paths) == 4
    assert all(os.path.exists(p) for p in paths)
    got = sorted(records.example_to_post(r)["text"]
                 for r in records.read_sharded(str(tmp_path / "train-*")))
    assert got == sorted(f"text {i}" for i in range(20))


# ---- byte-compatibility with TensorFlow (oracle only) ----

tf = pytest.importorskip("tensorflow")


def test_tfrecord_readable_by_tf(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    with records.TFRecordWriter(p) as w:
        w.write(b"abc")
        w.write(b"defg")
    got = [r.numpy() for r in tf.data.TFRecordDataset(p)]
    assert got == [b"abc", b"defg"]


def test_example_parseable_by_tf():
    ex = records.post_to_example(b"rawjpeg", "happy days", 3, post_id="id9")
    parsed = tf.train.Example.FromString(ex)
    f = parsed.features.feature
    assert f["image/encoded"].bytes_list.value[0] == b"rawjpeg"
    assert f["text"].bytes_list.value[0] == b"happy days"
    assert f["label"].int64_list.value[0] == 3
    assert f["id"].bytes_list.value[0] == b"id9"


def test_tf_example_decodable_by_us():
    e = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"IMG"])),
        "label": tf.train.Feature(int64_list=tf.train.Int64List(value=[7, -2])),
        "score": tf.train.Feature(float_list=tf.train.FloatList(value=[0.5, 1.5])),
    }))
    got = records.decode_example(e.SerializeToString())
    assert got["image/encoded"] == [b"IMG"]
    assert got["label"] == [7, -2]
    assert got["score"] == [0.5, 1.5]


def test_tfrecord_written_by_tf_readable_by_us(tmp_path):
    p = str(tmp_path / "tf.tfrecord")
    with tf.io.TFRecordWriter(p) as w:
        w.write(b"one")
        w.write(b"two")
    assert list(records.read_tfrecords(p)) == [b"one", b"two"]


def test_example_codec_fuzz_roundtrip():
    """Property-style fuzz: random feature dicts survive encode->decode and
    match TF's parser bit-for-bit (guards the hand-rolled proto codec)."""
    rng = np.random.RandomState(0)
    for trial in range(25):
        feats = {}
        for i in range(rng.randint(1, 6)):
            name = f"f{trial}_{i}_" + "x" * rng.randint(0, 40)
            kind = rng.randint(3)
            n = rng.randint(1, 5)
            if kind == 0:
                feats[name] = [bytes(rng.bytes(rng.randint(0, 300)))
                               for _ in range(n)]
            elif kind == 1:
                feats[name] = [int(v) for v in
                               rng.randint(-2**62, 2**62, size=n)]
            else:
                feats[name] = [float(np.float32(v)) for v in
                               rng.randn(n).astype(np.float32)]
        data = records.encode_example(feats)
        got = records.decode_example(data)
        for name, want in feats.items():
            if isinstance(want[0], float):
                np.testing.assert_allclose(got[name], want, rtol=1e-6)
            else:
                assert got[name] == want, name
        parsed = tf.train.Example.FromString(data)  # TF accepts our bytes
        assert set(parsed.features.feature.keys()) == set(feats.keys())
