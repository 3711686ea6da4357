"""Input pipeline tests: TFRecord index, grain dataset, device prefetch."""

import io
import os

import numpy as np
import pytest

from tumblr_emotions_tpu.data import jpeg as jpeg_lib
from tumblr_emotions_tpu.data import pipeline, records, vocab


def _jpeg(seed, hw=(100, 140)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (np.cumsum(np.cumsum(rng.rand(*hw, 3), 0), 1) * 7 % 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("records")
    exs = [records.post_to_example(_jpeg(i), f"post number {i} feeling happy",
                                   i % 15, post_id=str(i))
           for i in range(37)]
    records.write_sharded_tfrecords(exs, str(d), "train", 3)
    return str(d)


@pytest.fixture(scope="module")
def v():
    return vocab.build_vocabulary(
        [f"post number {i} feeling happy" for i in range(37)], min_freq=1)


def test_tfrecord_index_random_access(dataset_dir):
    idx = pipeline.TFRecordIndex(os.path.join(dataset_dir, "train-*.tfrecord"))
    assert len(idx) == 37
    seen = set()
    for i in range(len(idx)):
        post = records.example_to_post(idx[i])
        seen.add(post["id"])
    assert len(seen) == 37
    # index cache written and reused
    assert any(p.endswith(".idx") for p in os.listdir(dataset_dir))
    idx2 = pipeline.TFRecordIndex(os.path.join(dataset_dir, "train-*.tfrecord"))
    assert records.example_to_post(idx2[5]) == records.example_to_post(idx[5])


def test_batches_shapes_and_coverage(dataset_dir, v):
    cfg = pipeline.PipelineConfig(batch_size=8, host_size=64, max_len=10,
                                  shuffle=True, seed=1, num_epochs=1)
    got_labels = []
    n_batches = 0
    for b in pipeline.batches(os.path.join(dataset_dir, "train-*.tfrecord"),
                              v, cfg):
        assert b["image"].shape == (8, 64, 64, 3)
        assert b["image"].dtype == np.uint8
        assert b["tokens"].shape == (8, 10)
        assert b["lengths"].shape == (8,)
        got_labels.extend(np.asarray(b["label"]).tolist())
        n_batches += 1
    assert n_batches == 37 // 8
    assert len(got_labels) == 32


def test_epoch_reshuffle_differs(dataset_dir, v):
    cfg = pipeline.PipelineConfig(batch_size=37, host_size=32, max_len=4,
                                  shuffle=True, seed=0, num_epochs=2,
                                  drop_remainder=False)
    it = pipeline.batches(os.path.join(dataset_dir, "train-*.tfrecord"), v, cfg)
    e1 = np.asarray(next(it)["label"])
    e2 = np.asarray(next(it)["label"])
    assert sorted(e1.tolist()) == sorted(e2.tolist())
    assert not np.array_equal(e1, e2)  # reshuffled across epochs


def test_host_sharding_disjoint(dataset_dir, v):
    pat = os.path.join(dataset_dir, "train-*.tfrecord")
    ids = []
    for shard in range(2):
        cfg = pipeline.PipelineConfig(batch_size=4, host_size=32, max_len=4,
                                      shuffle=False, num_epochs=1,
                                      drop_remainder=False,
                                      shard_index=shard, shard_count=2)
        labels = []
        for b in pipeline.batches(pat, v, cfg):
            labels.extend(np.asarray(b["label"])[np.asarray(b["weight"]) == 1].tolist())
        ids.append(labels)
    assert len(ids[0]) + len(ids[1]) == 37


def test_device_prefetch(dataset_dir, v):
    import jax

    from tumblr_emotions_tpu.parallel import create_mesh

    mesh = create_mesh()
    cfg = pipeline.PipelineConfig(batch_size=8, host_size=32, max_len=4,
                                  shuffle=False, num_epochs=1)
    it = pipeline.batches(os.path.join(dataset_dir, "train-*.tfrecord"), v, cfg)
    n = 0
    for sharded in pipeline.device_prefetch(it, mesh, depth=2):
        assert isinstance(sharded["image"], jax.Array)
        assert sharded["image"].shape == (8, 32, 32, 3)
        n += 1
    assert n == 4


def test_device_prefetch_propagates_producer_errors():
    """A decode/IO failure mid-stream must surface in the consumer, not
    masquerade as clean end-of-input (silent early stop)."""
    from tumblr_emotions_tpu.parallel import create_mesh

    mesh = create_mesh()

    def bad_iter():
        yield {"x": np.zeros((8, 3), np.float32)}
        raise OSError("disk gone")

    it = pipeline.device_prefetch(bad_iter(), mesh)
    next(it)
    with pytest.raises(OSError, match="disk gone"):
        next(it)


def test_arrayrecord_roundtrip_and_pipeline(tmp_path, v):
    exs = [records.post_to_example(_jpeg(i), f"post number {i} feeling happy",
                                   i % 15, post_id=str(i)) for i in range(10)]
    paths = records.write_sharded_arrayrecords(exs, str(tmp_path), "train", 2)
    assert all(p.endswith(".arrayrecord") for p in paths)
    got = sorted(records.example_to_post(r)["id"]
                 for r in records.read_sharded_arrayrecords(
                     str(tmp_path / "train-*.arrayrecord")))
    assert got == sorted(str(i) for i in range(10))

    cfg = pipeline.PipelineConfig(batch_size=5, host_size=32, max_len=6,
                                  shuffle=False, num_epochs=1)
    batches = list(pipeline.batches(str(tmp_path / "train-*.arrayrecord"),
                                    v, cfg))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (5, 32, 32, 3)


def test_iterator_checkpoint_resume(dataset_dir, v, tmp_path):
    """Exact input-position resume (grain iterator state save/restore)."""
    cfg = pipeline.PipelineConfig(batch_size=4, host_size=32, max_len=4,
                                  shuffle=True, seed=3)
    pat = os.path.join(dataset_dir, "train-*.tfrecord")
    it = pipeline.batches(pat, v, cfg)
    for _ in range(3):
        next(it)
    state_path = str(tmp_path / "iter.json")
    pipeline.save_iterator_state(it, state_path)
    want = [np.asarray(next(it)["label"]) for _ in range(2)]

    it2 = pipeline.batches(pat, v, cfg)
    assert pipeline.restore_iterator_state(it2, state_path)
    got = [np.asarray(next(it2)["label"]) for _ in range(2)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    assert not pipeline.restore_iterator_state(it2, str(tmp_path / "none.json"))


def test_distributed_helpers_single_host():
    from tumblr_emotions_tpu.parallel import distributed

    assert distributed.maybe_initialize() is False  # single host: no-op
    assert distributed.host_shard_options() == (0, 1)


def test_grain_multiprocess_workers(dataset_dir, v):
    """worker_count>0 engages grain's subprocess prefetch (the decode-scaling
    mechanism of the 10k img/s budget — VERDICT.md round-1 item #8) and
    yields exactly the in-process batches."""
    base = dict(batch_size=8, host_size=48, max_len=10, shuffle=False,
                num_epochs=1, drop_remainder=False)
    pat = os.path.join(dataset_dir, "train-*.tfrecord")
    got0 = list(pipeline.batches(pat, v, pipeline.PipelineConfig(**base)))
    got2 = list(pipeline.batches(
        pat, v, pipeline.PipelineConfig(worker_count=2, **base)))
    assert len(got0) == len(got2) > 0
    for a, b in zip(got0, got2):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_cluster_env_detection(monkeypatch):
    """maybe_initialize's auto path keys off real cluster markers only:
    single-host TPU_WORKER_HOSTNAMES must NOT trigger (calling
    jax.distributed.initialize on one host would hang on a coordinator)."""
    from tumblr_emotions_tpu.parallel import distributed

    for var in distributed._CLUSTER_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    assert distributed.detect_cluster_env() is None

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0")
    assert distributed.detect_cluster_env() is None  # one host: not a cluster

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1,host-2")
    assert distributed.detect_cluster_env() == "TPU_WORKER_HOSTNAMES"

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert distributed.detect_cluster_env() == "JAX_COORDINATOR_ADDRESS"


def test_maybe_initialize_auto_calls_jax_distributed(monkeypatch):
    """With a cluster env detected, the no-arg path must actually call
    jax.distributed.initialize (the round-1 stub never did)."""
    import jax

    from tumblr_emotions_tpu.parallel import distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    distributed.maybe_initialize()
    assert calls == [((), {})]

    # Explicit coordinator args pass through.
    calls.clear()
    distributed.maybe_initialize("10.0.0.2:9000", 4, 1)
    assert calls and calls[0][1]["coordinator_address"] == "10.0.0.2:9000"


def test_device_prefetch_iterator_tracks_consumed_position(dataset_dir, v):
    """DevicePrefetchIterator.get_state must return the CONSUMED position,
    not the prefetched-ahead one: the producer runs the grain iterator up
    to depth+1 batches ahead, and checkpointing that position would skip
    the in-flight batches on resume."""
    import jax

    from tumblr_emotions_tpu.parallel import create_mesh

    pat = os.path.join(dataset_dir, "train-*.tfrecord")
    mesh = create_mesh()
    cfg = pipeline.PipelineConfig(batch_size=8, host_size=32, max_len=4,
                                  shuffle=False, num_epochs=1)

    def labels_of(b):
        return np.asarray(b["label"]).tolist()

    # Ground truth: the unwrapped stream's batches in order.
    want = [labels_of(b) for b in pipeline.batches(pat, v, cfg)]
    assert len(want) == 4  # 37 // 8

    it = pipeline.batches(pat, v, cfg)
    pre = pipeline.DevicePrefetchIterator(it, mesh, depth=2)
    got = [labels_of(next(pre)) for _ in range(2)]
    assert got == want[:2]
    # By now the producer has pulled ahead; the underlying iterator's own
    # state would over-skip, the wrapper's must not.
    st = pre.get_state()
    pre.close()

    it2 = pipeline.batches(pat, v, cfg)
    it2.set_state(st)
    pre2 = pipeline.DevicePrefetchIterator(it2, mesh, depth=2)
    rest = [labels_of(b) for b in pre2]
    assert rest == want[2:], "resume did not continue at the exact batch"
    assert isinstance(next(iter(rest)), list)
    # Device placement happened (jax arrays out of the wrapper).
    it3 = pipeline.batches(pat, v, cfg)
    pre3 = pipeline.DevicePrefetchIterator(it3, mesh, depth=1)
    b = next(pre3)
    assert isinstance(b["image"], jax.Array)
    pre3.close()


def test_device_prefetch_iterator_set_state_and_errors(dataset_dir, v):
    from tumblr_emotions_tpu.parallel import create_mesh

    pat = os.path.join(dataset_dir, "train-*.tfrecord")
    mesh = create_mesh()
    cfg = pipeline.PipelineConfig(batch_size=8, host_size=32, max_len=4,
                                  shuffle=False, num_epochs=1)
    it = pipeline.batches(pat, v, cfg)
    mid = pipeline.DevicePrefetchIterator(it, mesh, depth=1)
    # set_state delegates before iteration; afterwards it must refuse.
    st0 = it.get_state()
    mid.set_state(st0)
    next(mid)
    with pytest.raises(RuntimeError, match="after iteration started"):
        mid.set_state(st0)
    mid.close()

    # Producer errors surface; plain generators have no resumable state.
    def bad_iter():
        yield {"x": np.zeros((8, 3), np.float32)}
        raise OSError("disk gone")

    pre = pipeline.DevicePrefetchIterator(bad_iter(), mesh)
    next(pre)
    with pytest.raises(OSError, match="disk gone"):
        next(pre)
    gen = pipeline.DevicePrefetchIterator(iter([]), mesh)
    with pytest.raises(ValueError, match="no resumable iterator"):
        gen.get_state()
