"""Host input pipeline: grain over TFRecord shards, C++ JPEG decode,
double-buffered device feed.

Replaces the reference's L1 stack (SURVEY.md §2b/§3.1): TF's C++
TFRecordReader + shuffle-queue + queue-runner threads become

  TFRecordIndex (random-access record lookup via a one-pass offset index)
    -> grain.MapDataset (global shuffle by index, per-epoch reshuffle,
       multi-worker prefetch — deterministic, resumable)
    -> PostDecode (C++ libjpeg batch decode + fixed-size host resize)
    -> device_prefetch (background thread jax.device_put onto the mesh,
       depth-N double buffering so host decode overlaps device compute)

Static shapes throughout: every batch is [B, host_size, host_size, 3] uint8
plus token/length/label/weight arrays; train-time crops/distortions happen
on device inside the jitted step (preprocessing.py), eval parity paths
process full-resolution images per image (predict.py).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import queue
import struct
import threading
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from tumblr_emotions_tpu.data import jpeg as jpeg_lib
from tumblr_emotions_tpu.data import records as records_lib
from tumblr_emotions_tpu.data.vocab import Vocabulary


class TFRecordIndex:
    """Random access into sharded TFRecord files via an offset index.

    The TFRecord format is sequential; grain needs random access.  A single
    streaming pass per shard records (offset, length) of every record —
    cheap (framing reads only), cached next to the shard as ``.idx`` so
    subsequent runs skip the scan.
    """

    def __init__(self, pattern: str, use_cache: bool = True):
        self.paths = sorted(glob.glob(pattern))
        if not self.paths:
            raise FileNotFoundError(f"no records match {pattern}")
        # One [N, 3] int64 array (file_idx, off, len) — not a list of
        # tuples: ~10x less host RAM at 10M records and a single buffer
        # to pickle into grain subprocess workers.
        per_file = []
        for fi, path in enumerate(self.paths):
            arr = self._index_one(path, use_cache)
            fcol = np.full((len(arr), 1), fi, np.int64)
            per_file.append(np.hstack([fcol, arr]))
        self._entries = np.vstack(per_file)
        self._files: Dict[int, Any] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _index_one(path: str, use_cache: bool) -> np.ndarray:
        """[n, 2] int64 (offset, length) for one shard."""
        idx_path = path + ".idx"
        if use_cache and os.path.exists(idx_path) and \
                os.path.getmtime(idx_path) >= os.path.getmtime(path):
            return np.fromfile(idx_path, dtype=np.int64).reshape(-1, 2)
        entries = []
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            off = 0
            while True:
                header = f.read(8)
                if len(header) < 8:
                    break
                (length,) = struct.unpack("<Q", header)
                if off + 12 + length + 4 > size:
                    # Truncated trailing record (interrupted copy): agree
                    # with read_tfrecords instead of indexing past EOF and
                    # failing later inside a training step.
                    raise IOError(f"truncated record at offset {off} "
                                  f"of {path}")
                entries.append((off + 12, length))
                off += 12 + length + 4
                f.seek(off)
        arr = np.asarray(entries, np.int64).reshape(-1, 2)
        if use_cache:
            # Atomic: a SIGKILL mid-tofile must not leave a truncated .idx
            # newer than the shard (it would pass the mtime check forever).
            tmp = f"{idx_path}.tmp.{os.getpid()}"
            try:
                arr.tofile(tmp)
                os.replace(tmp, idx_path)
            except OSError:
                pass  # read-only data dir: skip the cache
        return arr

    def __len__(self) -> int:
        return len(self._entries)

    def __getitem__(self, i: int) -> bytes:
        fi, off, ln = (int(v) for v in self._entries[int(i)])
        # One fh per file, lazily opened; pread is thread-safe.
        f = self._files.get(fi)
        if f is None:
            with self._lock:
                f = self._files.get(fi)
                if f is None:
                    f = open(self.paths[fi], "rb")
                    self._files[fi] = f
        return os.pread(f.fileno(), ln, off)

    # grain protocol
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_files"] = {}
        state["_lock"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()


@dataclasses.dataclass
class PipelineConfig:
    batch_size: int = 32
    host_size: int = 347          # decoded+resized host image side
    max_len: int = 50
    shuffle: bool = True
    seed: int = 0
    num_epochs: Optional[int] = None
    drop_remainder: bool = True
    decode_threads: int = 8
    dct_method: str = "islow"
    # grain subprocess workers (0 = in-process).  Verified working in this
    # sandbox under pytest (tests/test_pipeline.py::
    # test_grain_multiprocess_workers: 2 workers, byte-identical batches);
    # spawn requires a file-backed __main__ (a `python - <<stdin` driver
    # cannot fork workers).  Combine with the C++ decoder's thread pool
    # (decode_threads) to scale host decode toward the 10k img/s budget.
    worker_count: int = 0
    shard_index: int = 0           # this host's shard (multi-host DP)
    shard_count: int = 1


def _host_resize_uint8(img: np.ndarray, size: int) -> np.ndarray:
    """Fixed-size host resize for batch assembly (PIL bilinear, uint8).

    Train-path only — eval parity resizes on device with TF1 grid math from
    the original resolution (preprocessing.py).
    """
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR), np.uint8)


def _make_source(pattern: str):
    """TFRecord offset-index source, or grain's C++ ArrayRecordDataSource
    when the pattern names .arrayrecord shards (SURVEY.md §2b)."""
    if pattern.endswith(".arrayrecord") or ".arrayrecord" in pattern:
        import glob as _glob

        import grain

        paths = sorted(_glob.glob(pattern))
        if not paths:
            raise FileNotFoundError(f"no records match {pattern}")
        return grain.sources.ArrayRecordDataSource(paths)
    return TFRecordIndex(pattern)


def _base_dataset(pattern: str, cfg: PipelineConfig):
    """Shared source/shard/shuffle/repeat plumbing over raw record bytes."""
    import grain

    source = _make_source(pattern)
    ds = grain.MapDataset.source(source)
    if cfg.shard_count > 1:
        ds = ds[cfg.shard_index::cfg.shard_count]
    if cfg.shuffle:
        ds = ds.shuffle(seed=cfg.seed)
    if cfg.num_epochs is not None:
        ds = ds.repeat(cfg.num_epochs)
    else:
        ds = ds.repeat(None)
    return ds


def _parse_meta(raw: bytes, vocab: Optional[Vocabulary],
                cfg: PipelineConfig) -> Dict[str, Any]:
    """Record -> example dict with the image still as JPEG bytes (decode
    happens per BATCH through the C++ thread pool — see ``batches``)."""
    post = records_lib.example_to_post(raw)
    out: Dict[str, Any] = {
        "image_bytes": post["image"],
        "label": np.int32(post["label"]),
        "weight": np.int32(1),
    }
    if vocab is not None:  # image-only consumers need no text branch
        tokens, length = vocab.encode(post["text"], cfg.max_len)
        out["tokens"] = tokens
        out["lengths"] = np.int32(length)
    return out


def make_dataset(pattern: str, vocab: Optional[Vocabulary], cfg: PipelineConfig):
    """grain.MapDataset of model-ready example dicts (unbatched).

    Per-record decode (single-threaded) — the batched path in ``batches``
    decodes whole batches through the C++ pool instead; use that for
    throughput."""
    ds = _base_dataset(pattern, cfg)

    def parse(raw: bytes) -> Dict[str, np.ndarray]:
        out = _parse_meta(raw, vocab, cfg)
        img = jpeg_lib.decode(out.pop("image_bytes"),
                              dct_method=cfg.dct_method)
        out["image"] = _host_resize_uint8(img, cfg.host_size)
        return out

    return ds.map(parse)


def _pad_to_static(batch: Dict[str, np.ndarray], batch_size: int
                   ) -> Dict[str, np.ndarray]:
    """Pad a short final batch to the static ``batch_size`` with zero rows
    and ``weight=0`` so (a) the jitted eval step never recompiles for a
    ragged shape and (b) ``shard_batch``'s P("data") placement stays valid
    on multi-device meshes regardless of the split size N.  Mirrors the
    CSV path (csv_dataset.text_batches); eval metrics mask on weight.
    """
    n = int(next(iter(batch.values())).shape[0])
    if n == batch_size:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        pad = np.zeros((batch_size - n,) + v.shape[1:], v.dtype)
        out[k] = np.concatenate([v, pad], axis=0)
    # weight already 1 for real rows (set in parse); padded rows stay 0.
    return out


def batches(pattern: str, vocab: Optional[Vocabulary], cfg: PipelineConfig
            ) -> Iterator[Dict[str, np.ndarray]]:
    """Batched numpy iterator (grain batch + optional worker prefetch).

    JPEG decode happens per batch through the C++ decoder's thread pool
    (``cfg.decode_threads``) — the batch boundary is where the pool gets
    enough images to parallelize over.  With ``drop_remainder=False``
    every batch — including the last — has the static leading dimension
    ``cfg.batch_size`` (short remainders are zero-padded with weight=0
    rows).
    """
    import grain

    def assemble(examples) -> Dict[str, np.ndarray]:
        imgs = jpeg_lib.decode_batch(
            [e["image_bytes"] for e in examples],
            dct_method=cfg.dct_method, num_threads=cfg.decode_threads)
        out = {"image": np.stack(
            [_host_resize_uint8(a, cfg.host_size) for a in imgs])}
        for k in examples[0]:
            if k != "image_bytes":
                out[k] = np.stack([e[k] for e in examples])
        return out

    ds = _base_dataset(pattern, cfg).map(
        lambda raw: _parse_meta(raw, vocab, cfg))
    ds = ds.batch(cfg.batch_size, drop_remainder=cfg.drop_remainder,
                  batch_fn=assemble)
    it = ds.to_iter_dataset()
    if cfg.worker_count > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=cfg.worker_count))
    if cfg.drop_remainder:
        return iter(it)
    return (_pad_to_static(b, cfg.batch_size) for b in it)


def device_prefetch(batch_iter: Iterable[Dict[str, np.ndarray]], mesh,
                    depth: int = 2) -> Iterator[Any]:
    """Background-thread device_put with batch sharding (double buffering).

    The reference overlapped input and compute with C++ queue threads; here
    one host thread keeps ``depth`` batches in flight on device, so the
    jitted step never waits on host->device DMA.
    """
    from tumblr_emotions_tpu.parallel import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put that notices consumer abandonment: an abandoned
        # generator must not leave this thread blocked in q.put forever,
        # pinning `depth` device-resident batches in HBM for the life of
        # the process.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batch_iter:
                if not _put(shard_batch(mesh, batch)):
                    return
            _put(_END)
        except BaseException as e:  # propagate: a decode/IO failure must NOT
            _put(e)                 # look like clean end-of-input

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # drop buffered device batches so HBM frees promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break


class DevicePrefetchIterator:
    """Resumable :func:`device_prefetch`: the production train feed.

    Same double-buffering contract (a background thread keeps ``depth``
    sharded batches in flight on device, overlapping host decode with
    device compute — the reference's C++ queue-runner replacement), PLUS
    exact-record checkpointing: prefetching runs the underlying grain
    iterator AHEAD of training by up to ``depth+1`` batches, so saving
    ``state_source.get_state()`` at a checkpoint would skip the in-flight
    batches on resume.  The producer therefore snapshots the iterator
    state right after pulling each batch and ships it through the queue;
    ``get_state()`` returns the state of the last batch the TRAINER
    consumed, which is exactly what must be restored.

    ``state_source`` is the resumable iterator underneath ``batches``
    (they may differ: ``cmd_train`` re-chains an already-pulled first
    batch in front).  ``set_state`` is only valid before iteration starts;
    restore into ``state_source`` first, then wrap.
    """

    _END = object()

    def __init__(self, batches: Iterable[Dict[str, np.ndarray]], mesh,
                 depth: int = 2, state_source=None):
        if state_source is None and hasattr(batches, "get_state"):
            state_source = batches
        self._batches = batches
        self._mesh = mesh
        self._state_source = state_source
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._consumed_state = None
        self._thread: Optional[threading.Thread] = None

    # -- resumable-iterator protocol (plugs into save/restore_iterator_state)

    def get_state(self):
        if self._consumed_state is not None:
            return self._consumed_state
        if self._state_source is not None:
            return self._state_source.get_state()
        raise ValueError("no resumable iterator underneath this prefetcher")

    def set_state(self, state) -> None:
        if self._thread is not None:
            raise RuntimeError("set_state after iteration started: restore "
                               "the underlying iterator before wrapping")
        if self._state_source is None:
            raise ValueError("no resumable iterator underneath this prefetcher")
        self._state_source.set_state(state)

    # -- iteration -----------------------------------------------------------

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self) -> None:
        try:
            from tumblr_emotions_tpu.parallel import shard_batch

            for batch in self._batches:
                st = (self._state_source.get_state()
                      if self._state_source is not None else None)
                if not self._put((shard_batch(self._mesh, batch), st)):
                    return
            self._put(self._END)
        except BaseException as e:  # noqa: BLE001 — a decode/IO failure
            self._put(e)            # must not look like clean end-of-input

    def __iter__(self):
        return self

    def __next__(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._producer,
                                            daemon=True,
                                            name="tet-device-prefetch")
            self._thread.start()
        item = self._queue.get()
        if item is self._END:
            self.close()
            raise StopIteration
        if isinstance(item, BaseException):
            self.close()
            raise item
        batch, st = item
        if st is not None:
            self._consumed_state = st
        return batch

    def close(self) -> None:
        """Stop the producer and drop buffered device batches so HBM frees
        promptly (abandoning the iterator without close leaks nothing —
        the producer notices within 0.2 s — but close is immediate)."""
        self._stop.set()
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break


# ---------------------------------------------------------------------------
# Input-pipeline checkpointing (SURVEY.md §5 checkpoint/resume: the reference
# restarts its input queues from scratch; grain iterators are stateful and
# resumable, so training resumes at the exact record position).
# ---------------------------------------------------------------------------

def save_iterator_state(iterator, path: str) -> None:
    """Persist a grain DatasetIterator's position as JSON (atomically:
    a crash mid-write must not leave a truncated state file that poisons
    the next resume)."""
    import json

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(iterator.get_state(), f)
    os.replace(tmp, path)


def restore_iterator_state(iterator, path: str) -> bool:
    """Restore a previously saved position; returns False if no state file."""
    import json
    import os as _os

    if not _os.path.exists(path):
        return False
    with open(path) as f:
        iterator.set_state(json.load(f))
    return True
