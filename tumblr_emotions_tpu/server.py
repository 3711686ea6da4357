"""Online serving: micro-batching front end over the fused TPU engines.

The reference has no serving layer at all (SURVEY.md §1: research scripts
only); this is framework-native production serving for BASELINE config 4's
fused decode->preprocess->forward path.  Design rules, TPU-first:

- **Static shapes, one compile.**  Every device program runs at a fixed
  ``batch_size``; partial micro-batches are padded (the pad rows are
  sliced off before responding), so XLA never recompiles and the MXU
  always sees the tuned batch.
- **Host decode off the device path.**  JPEG decode (C++ libjpeg thread
  pool) + fixed-size host resize happen in the batcher thread while the
  previous batch executes on the TPU; request threads only enqueue.
- **Micro-batching with a latency bound.**  Requests are coalesced until
  the batch is full or ``max_delay_ms`` has elapsed since the first
  waiting request, trading at most that much added latency for full-batch
  MXU utilization.

``BatchedPredictor`` is the transport-free core (``submit() ->
concurrent.futures.Future``).  ``EmotionHTTPServer`` puts a stdlib
threaded HTTP front on it:

    POST /predict?text=...   body = JPEG bytes -> {"top": ..., "probs": ...}
    GET  /healthz            liveness + device platform
    GET  /stats              request/batch counters, occupancy, latency pctls

Engines come from :func:`tumblr_emotions_tpu.ops.serving.build_forward`
(int8 / bf16 / parity, 1- or N-device mesh), shared with ``cli infer``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Sequence
from urllib.parse import parse_qs, urlparse

import numpy as np

from tumblr_emotions_tpu.config import EMOTIONS
from tumblr_emotions_tpu.data import jpeg as jpeg_lib
from tumblr_emotions_tpu.data.pipeline import _host_resize_uint8
from tumblr_emotions_tpu.data.vocab import Vocabulary


@dataclass
class _Request:
    image: Optional[bytes]
    text: Optional[str]
    future: Future
    t_enqueue: float = field(default_factory=time.perf_counter)


class PredictorOverloaded(RuntimeError):
    """Raised by ``submit`` when the bounded request queue is full.

    Fast-fail backpressure: under sustained overload the server sheds load
    immediately (HTTP 503 + Retry-After) instead of queueing request bodies
    without bound until the process OOMs."""


class ServerStats:
    """Thread-safe serving counters + a bounded latency reservoir."""

    def __init__(self, reservoir: int = 2048):
        self._lock = threading.Lock()
        self.requests = 0
        self.responses = 0
        self.errors = 0
        self.rejected = 0
        self.batches = 0
        self.batched_rows = 0
        self._lat = deque(maxlen=reservoir)

    def record_batch(self, n_rows: int, latencies: Sequence[float],
                     n_errors: int = 0) -> None:
        with self._lock:
            self.batches += 1
            self.batched_rows += n_rows
            self.responses += n_rows
            self.errors += n_errors
            self._lat.extend(latencies)

    def record_errors(self, n_errors: int) -> None:
        """Errors outside a successful device batch (runner failures):
        counted without bumping the batch/occupancy counters a second
        time — ``_run_batch`` may already have recorded its batch."""
        with self._lock:
            self.errors += n_errors

    def record_request(self) -> None:
        with self._lock:
            self.requests += 1

    def record_rejected(self) -> None:
        with self._lock:
            self.rejected += 1

    def snapshot(self, batch_size: int) -> Dict:
        with self._lock:
            lat = sorted(self._lat)
            pct = (lambda p: round(lat[min(len(lat) - 1,
                                           int(p * len(lat)))] * 1e3, 2)
                   ) if lat else (lambda p: None)
            return {
                "requests": self.requests,
                "responses": self.responses,
                "errors": self.errors,
                "rejected": self.rejected,
                "batches": self.batches,
                "mean_batch_occupancy": round(
                    self.batched_rows / max(self.batches, 1) / batch_size, 3),
                "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                               "p99": pct(0.99)},
            }


class BatchedPredictor:
    """Coalesce concurrent predict calls into fixed-size device batches.

    ``runner(image_u8 [B,S,S,3], tokens [B,T], lengths [B]) -> probs [B,C]``
    is any jitted forward (see ``ops.serving.build_forward``); ``tokens``/
    ``lengths`` are None for image-only models, ``image_u8`` is None for
    text-only.  ``submit`` never blocks on the device — it returns a Future
    resolved by the batcher thread.
    """

    def __init__(self, runner: Callable, batch_size: int, *,
                 host_size: int = 347,
                 needs_image: bool = True,
                 vocab: Optional[Vocabulary] = None,
                 max_len: int = 50,
                 max_delay_ms: float = 5.0,
                 decode_threads: int = 8,
                 max_queue: Optional[int] = None,
                 emotions: Sequence[str] = EMOTIONS):
        if needs_image is False and vocab is None:
            raise ValueError("text-only serving needs a vocabulary")
        self.runner = runner
        self.batch_size = int(batch_size)
        self.host_size = int(host_size)
        self.needs_image = needs_image
        self.vocab = vocab
        self.max_len = int(max_len)
        self.max_delay = float(max_delay_ms) / 1e3
        self.decode_threads = int(decode_threads)
        self.emotions = list(emotions)
        self.stats = ServerStats()
        self._image_buf: Optional[np.ndarray] = None
        self._token_buf: Optional[np.ndarray] = None
        self._length_buf: Optional[np.ndarray] = None
        # Bounded: under sustained overload submit() fast-fails with
        # PredictorOverloaded instead of queueing request bodies (each
        # holding decoded-image-sized bytes) without limit.  Default
        # capacity = 8 device batches of headroom.
        self.max_queue = (8 * self.batch_size if max_queue is None
                          else int(max_queue))
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=self.max_queue)
        self._stop = threading.Event()
        # Serializes submit()'s closed-check+put against close(): without
        # it a submitter that passed the check could enqueue after close()
        # drained the queue, leaving its future to hang until the client
        # timeout (the batcher thread is already dead at that point).
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tet-batcher")
        self._thread.start()

    # -- client side ---------------------------------------------------------

    def submit(self, image: Optional[bytes] = None,
               text: Optional[str] = None) -> Future:
        """Enqueue one post; the Future resolves to
        ``{"top": emotion, "probs": {emotion: p, ...}}``.

        Raises :class:`PredictorOverloaded` when the bounded queue is full
        (shed load now; the client should retry after a short backoff) and
        ``RuntimeError`` after ``close()``."""
        if self.needs_image and image is None:
            raise ValueError("this model serves images; image bytes required")
        if self.vocab is not None and not self.needs_image and text is None:
            raise ValueError("text-only model; text required")
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("predictor is closed")
            try:
                self._queue.put_nowait(
                    _Request(image=image, text=text, future=fut))
            except queue.Full:
                self.stats.record_rejected()
                raise PredictorOverloaded(
                    f"request queue full ({self.max_queue} waiting); "
                    "retry after backoff") from None
        self.stats.record_request()
        return fut

    def predict(self, image: Optional[bytes] = None,
                text: Optional[str] = None, timeout: float = 60.0) -> Dict:
        return self.submit(image, text).result(timeout=timeout)

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
        self._thread.join(timeout=5.0)
        # Fail queued requests immediately instead of leaving their futures
        # to hang until the client's timeout; the lock above guarantees no
        # new put can land after the drain.
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if not r.future.done():
                r.future.set_exception(RuntimeError("predictor closed"))

    # -- batcher thread ------------------------------------------------------

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.perf_counter() + self.max_delay
            while len(items) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(items)
            except BaseException as e:  # never kill the batcher thread
                # Fail only futures _run_batch did not already settle.
                # record_batch is the LAST statement of every _run_batch
                # path, so reaching here means this batch was never
                # recorded: count newly-failed futures plus per-image
                # decode failures (done with an exception) exactly once,
                # without bumping the batch/occupancy counters for a batch
                # that produced no device results.
                failed = 0
                for r in items:
                    if not r.future.done():
                        r.future.set_exception(e)
                        failed += 1
                    elif (r.future.cancelled()
                          or r.future.exception() is not None):
                        failed += 1
                self.stats.record_errors(failed)

    def _decode(self, items: List[_Request]) -> List[Optional[np.ndarray]]:
        """Decode+resize each request's JPEG; per-request error isolation
        (a bad image fails ITS future, not the batch)."""
        datas = [r.image for r in items]
        try:
            raws = jpeg_lib.decode_batch(datas,
                                         num_threads=self.decode_threads)
        except Exception:  # noqa: BLE001 — any bad image (the PIL fallback
            # raises UnidentifiedImageError, not ValueError): retry
            # per-image so one corrupt JPEG fails only its own future.
            raws = []
            for r in items:
                try:
                    raws.append(jpeg_lib.decode(r.image))
                except Exception as e:  # noqa: BLE001 — per-request
                    r.future.set_exception(
                        ValueError(f"bad image: {e}"))
                    raws.append(None)
        return [None if a is None
                else _host_resize_uint8(a, self.host_size) for a in raws]

    def _run_batch(self, items: List[_Request]) -> None:
        B, S = self.batch_size, self.host_size
        live: List[_Request] = []
        images: List[np.ndarray] = []
        n_errors = 0
        if self.needs_image:
            for req, img in zip(items, self._decode(items)):
                if img is None:
                    n_errors += 1
                    continue
                live.append(req)
                images.append(img)
        else:
            live = list(items)
        if not live:
            self.stats.record_batch(0, [], n_errors)
            return

        n = len(live)
        image_b = tokens_b = lengths_b = None
        if self.needs_image:
            # One preallocated host buffer, reused every batch: the batcher
            # is single-threaded and np.asarray(runner(...)) below blocks
            # until the batch's compute is done, so the buffer is never
            # mutated while a dispatch might still read it (relevant on the
            # CPU backend, where JAX can alias numpy memory).  Stale pad
            # rows are harmless: their outputs are sliced off below.
            if self._image_buf is None:
                self._image_buf = np.zeros((B, S, S, 3), np.uint8)
            image_b = self._image_buf
            for i, img in enumerate(images):
                image_b[i] = img
        if self.vocab is not None:
            if self._token_buf is None:
                self._token_buf = np.zeros((B, self.max_len), np.int32)
                self._length_buf = np.zeros((B,), np.int32)
            tokens_b, lengths_b = self._token_buf, self._length_buf
            toks, lens = self.vocab.encode_batch(
                [r.text or "" for r in live], self.max_len)
            tokens_b[:n], lengths_b[:n] = toks, lens
            lengths_b[n:] = 1  # pad rows: avoid 0-length edge paths

        probs = np.asarray(self.runner(image_b, tokens_b, lengths_b),
                           np.float32)[:n]
        now = time.perf_counter()
        lats = []
        for row, req in zip(probs, live):
            order = np.argsort(-row)
            req.future.set_result({
                "top": self.emotions[int(order[0])],
                "probs": {self.emotions[i]: round(float(row[i]), 5)
                          for i in order},
            })
            lats.append(now - req.t_enqueue)
        self.stats.record_batch(n, lats, n_errors)


# -- HTTP front end ----------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    predictor: BatchedPredictor  # set by EmotionHTTPServer
    request_timeout: float = 60.0
    max_body_bytes: int = 32 * 1024 * 1024  # cap attacker-controlled reads

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, code: int, payload: Dict,
              extra_headers: Optional[Dict[str, str]] = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            import jax
            self._json(200, {"status": "ok",
                             "platform": jax.devices()[0].platform,
                             "devices": jax.device_count()})
        elif path == "/stats":
            self._json(200, self.predictor.stats.snapshot(
                self.predictor.batch_size))
        else:
            self._json(404, {"error": f"no route {path}"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/predict":
            self._json(404, {"error": f"no route {url.path}"})
            return
        length = int(self.headers.get("Content-Length") or 0)
        if length > self.max_body_bytes:
            self._json(413, {"error": f"body too large ({length} bytes; "
                                      f"max {self.max_body_bytes})"})
            return
        body = self.rfile.read(length) if length else b""
        text = (parse_qs(url.query).get("text", [None])[0]
                or self.headers.get("X-Text"))
        image = body if body else None
        try:
            result = self.predictor.predict(image=image, text=text,
                                            timeout=self.request_timeout)
            self._json(200, result)
        except PredictorOverloaded as e:
            # Backpressure: shed load with an explicit retry hint instead
            # of queueing unboundedly (the bounded-queue contract).
            self._json(503, {"error": str(e)}, {"Retry-After": "1"})
        except ValueError as e:
            self._json(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — request-scoped failure
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


class EmotionHTTPServer(ThreadingHTTPServer):
    """Threaded HTTP server over a :class:`BatchedPredictor`.

    ``port=0`` binds an ephemeral port (tests); ``server.server_address``
    reports the bound one.  Concurrent POSTs coalesce into device batches
    via the predictor's batcher thread.
    """

    daemon_threads = True

    def __init__(self, predictor: BatchedPredictor, host: str = "0.0.0.0",
                 port: int = 8080, request_timeout: float = 60.0):
        handler = type("BoundHandler", (_Handler,), {
            "predictor": predictor, "request_timeout": request_timeout})
        super().__init__((host, port), handler)
        self.predictor = predictor

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True,
                             name="tet-http")
        t.start()
        return t

    def close(self) -> None:
        self.shutdown()
        self.server_close()
        self.predictor.close()
