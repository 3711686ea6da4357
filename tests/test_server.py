"""Online serving front end (server.py + ops.serving.build_forward).

The micro-batching/transport layer is tested with a fake runner (no model
compile); the heavy test drives a REAL depth-0.25 tower through
build_forward over HTTP end to end.
"""

import io
import json
import time
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data.vocab import Vocabulary
from tumblr_emotions_tpu.server import BatchedPredictor, EmotionHTTPServer


def _jpeg_bytes(seed: int = 0, size: int = 64) -> bytes:
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 256, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def _fake_runner(calls=None):
    """Deterministic stand-in for a jitted engine: probs from mean pixel."""
    def run(image, tokens, lengths):
        if calls is not None:
            calls.append(0 if image is None else int(image.shape[0]))
        B = image.shape[0] if image is not None else tokens.shape[0]
        logits = np.zeros((B, len(EMOTIONS)), np.float32)
        if image is not None:
            logits[:, 0] = image.reshape(B, -1).mean(axis=1) / 255.0
        if tokens is not None:
            logits[:, 1] = (tokens > 0).sum(axis=1)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)
    return run


def _tiny_vocab():
    toks = ["<pad>", "<oov>", "happy", "sad", "dog", "cat"]
    return Vocabulary(token_to_id={t: i for i, t in enumerate(toks)},
                      id_to_token=list(toks))


def test_batched_predictor_coalesces_concurrent_requests():
    calls = []
    p = BatchedPredictor(_fake_runner(calls), batch_size=8, host_size=32,
                         max_delay_ms=60.0, decode_threads=2)
    try:
        jpegs = [_jpeg_bytes(i) for i in range(10)]
        futs = [p.submit(image=j) for j in jpegs]
        results = [f.result(timeout=30) for f in futs]
    finally:
        p.close()
    assert len(results) == 10
    for r in results:
        assert r["top"] in EMOTIONS
        assert abs(sum(r["probs"].values()) - 1.0) < 1e-3
        # probs dict is sorted descending
        vals = list(r["probs"].values())
        assert vals == sorted(vals, reverse=True)
    # 10 requests coalesced into >=1 full batch of 8 — fewer device calls
    # than requests, and the device ALWAYS saw the fixed batch shape.
    snap = p.stats.snapshot(8)
    assert snap["responses"] == 10
    assert snap["batches"] < 10
    assert max(calls) == 8  # static padded batch shape reached the runner
    assert snap["latency_ms"]["p50"] is not None


def test_bad_jpeg_fails_its_request_only():
    p = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                         max_delay_ms=40.0)
    try:
        good = [p.submit(image=_jpeg_bytes(i)) for i in range(2)]
        bad = p.submit(image=b"definitely not a jpeg")
        for f in good:
            assert f.result(timeout=30)["top"] in EMOTIONS
        with pytest.raises(Exception):
            bad.result(timeout=30)
    finally:
        p.close()
    assert p.stats.snapshot(4)["errors"] == 1


def test_text_and_joint_payloads():
    vocab = _tiny_vocab()
    # joint: image + text
    pj = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                          vocab=vocab, max_len=8, max_delay_ms=20.0)
    try:
        r = pj.predict(image=_jpeg_bytes(3), text="happy dog", timeout=30)
        assert r["top"] in EMOTIONS
    finally:
        pj.close()
    # text-only
    pt = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                          needs_image=False, vocab=vocab, max_len=8,
                          max_delay_ms=20.0)
    try:
        r = pt.predict(text="sad cat", timeout=30)
        assert r["top"] in EMOTIONS
        with pytest.raises(ValueError):
            pt.predict(timeout=5)  # text required
    finally:
        pt.close()
    # image required for image-serving models
    pi = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                          max_delay_ms=20.0)
    try:
        with pytest.raises(ValueError):
            pi.submit(text="no image")
    finally:
        pi.close()


def _post(url: str, body: bytes, headers=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_http_server_routes_and_concurrency():
    p = BatchedPredictor(_fake_runner(), batch_size=8, host_size=32,
                         max_delay_ms=40.0)
    srv = EmotionHTTPServer(p, host="127.0.0.1", port=0)
    srv.serve_background()
    host, port = srv.server_address
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        # concurrent posts coalesce through the same batcher
        results, errs = [], []

        def _one(i):
            try:
                results.append(_post(base + "/predict", _jpeg_bytes(i)))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=_one, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errs
        assert len(results) == 6
        for status, payload in results:
            assert status == 200
            assert payload["top"] in EMOTIONS

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["responses"] >= 6
        assert 0 < stats["mean_batch_occupancy"] <= 1

        # error paths: no body -> 400; bad route -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/predict", b"")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + "/nope", timeout=30)
        assert e.value.code == 404
    finally:
        srv.close()


def test_http_text_via_query_and_header():
    vocab = _tiny_vocab()
    p = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                         vocab=vocab, max_len=8, max_delay_ms=20.0)
    srv = EmotionHTTPServer(p, host="127.0.0.1", port=0)
    srv.serve_background()
    host, port = srv.server_address
    base = f"http://{host}:{port}"
    try:
        status, payload = _post(base + "/predict?text=happy%20dog",
                                _jpeg_bytes(1))
        assert status == 200 and payload["top"] in EMOTIONS
        status, payload = _post(base + "/predict", _jpeg_bytes(2),
                                headers={"X-Text": "sad cat"})
        assert status == 200 and payload["top"] in EMOTIONS
    finally:
        srv.close()


def test_cli_serve_int8_requires_records():
    from tumblr_emotions_tpu import cli

    with pytest.raises(SystemExit, match="int8 needs --records"):
        cli.main(["serve", "--model", "image", "--engine", "int8"])


@pytest.mark.heavy
def test_http_end_to_end_real_model():
    """Real depth-0.25 image tower via build_forward (parity engine),
    served over HTTP — the full cli-serve path minus argparse."""
    import jax

    from tumblr_emotions_tpu.ops.serving import build_forward
    from tumblr_emotions_tpu.train.trainer import Trainer

    cfg = get_preset("image_frozen")
    cfg = cfg.replace(image=cfg.image.replace(depth_multiplier=0.25),
                      train=cfg.train.replace(batch_size=2))
    trainer = Trainer(cfg, preprocess="train")
    sample = {"image": np.zeros((1, 96, 96, 3), np.uint8),
              "label": np.zeros((1,), np.int32)}
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    runner = build_forward(cfg, trainer, variables, None, engine="parity")

    p = BatchedPredictor(runner, batch_size=2, host_size=96,
                         max_delay_ms=30.0)
    srv = EmotionHTTPServer(p, host="127.0.0.1", port=0)
    srv.serve_background()
    host, port = srv.server_address
    try:
        status, payload = _post(f"http://{host}:{port}/predict",
                                _jpeg_bytes(7, size=120))
        assert status == 200
        assert payload["top"] in EMOTIONS
        assert abs(sum(payload["probs"].values()) - 1.0) < 1e-3
    finally:
        srv.close()


def test_close_drains_queue_and_rejects_new_submits():
    """close() must fail queued futures immediately (not leave them to a
    60s client timeout) and submit() after close must raise."""
    import queue as queue_mod
    from concurrent.futures import Future

    from tumblr_emotions_tpu.server import _Request

    p = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                         max_delay_ms=5.0, decode_threads=1)
    p.close()
    # Race simulation: a request that slipped into the queue around close.
    fut: Future = Future()
    p._queue.put(_Request(image=_jpeg_bytes(), text=None, future=fut))
    p.close()  # idempotent; drains the straggler
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=1.0)
    with pytest.raises(RuntimeError, match="closed"):
        p.submit(image=_jpeg_bytes())


def test_http_rejects_oversized_body():
    p = BatchedPredictor(_fake_runner(), batch_size=4, host_size=32,
                         max_delay_ms=5.0, decode_threads=1)
    server = EmotionHTTPServer(p, host="127.0.0.1", port=0)
    server.serve_background()
    try:
        host, port = server.server_address[:2]
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", method="POST")
        req.add_header("Content-Length", str(1 << 33))  # 8 GB claim
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert "too large" in json.loads(e.read())["error"]
    finally:
        server.close()


def test_runner_failure_is_visible_in_stats():
    def bad_runner(image, tokens, lengths):
        raise RuntimeError("device fell over")

    p = BatchedPredictor(bad_runner, batch_size=4, host_size=32,
                         max_delay_ms=5.0, decode_threads=1)
    try:
        fut = p.submit(image=_jpeg_bytes())
        with pytest.raises(RuntimeError, match="fell over"):
            fut.result(timeout=10)
        deadline = time.perf_counter() + 5
        while time.perf_counter() < deadline:
            if p.stats.snapshot(4)["errors"] >= 1:
                break
            time.sleep(0.01)
        snap = p.stats.snapshot(4)
        assert snap["errors"] >= 1, snap
    finally:
        p.close()


def test_overload_fast_fails_and_queue_stays_bounded():
    """Backpressure: with the batcher stalled, the bounded queue fills and
    further submits raise PredictorOverloaded immediately (no unbounded
    request-body accumulation); once the stall clears, queued requests
    still complete."""
    from tumblr_emotions_tpu.server import PredictorOverloaded

    started, release = threading.Event(), threading.Event()

    def stalling_runner(image, tokens, lengths):
        started.set()
        assert release.wait(30), "test never released the runner"
        return _fake_runner()(image, tokens, lengths)

    p = BatchedPredictor(stalling_runner, batch_size=1, host_size=32,
                         max_delay_ms=1.0, decode_threads=1, max_queue=2)
    try:
        jpg = _jpeg_bytes()
        f_running = p.submit(image=jpg)   # pulled by the batcher, stalls
        assert started.wait(10)
        queued = [p.submit(image=jpg) for _ in range(2)]  # fills max_queue
        rejected = 0
        for _ in range(5):
            try:
                p.submit(image=jpg)
            except PredictorOverloaded:
                rejected += 1
        assert rejected == 5
        assert p._queue.qsize() <= 2  # bounded: rejected bodies not held
        assert p.stats.snapshot(1)["rejected"] == 5
        release.set()
        assert f_running.result(timeout=30)["top"] in EMOTIONS
        for f in queued:
            assert f.result(timeout=30)["top"] in EMOTIONS
    finally:
        release.set()
        p.close()


def test_http_overload_returns_503_with_retry_after():
    started, release = threading.Event(), threading.Event()

    def stalling_runner(image, tokens, lengths):
        started.set()
        assert release.wait(30)
        return _fake_runner()(image, tokens, lengths)

    p = BatchedPredictor(stalling_runner, batch_size=1, host_size=32,
                         max_delay_ms=1.0, decode_threads=1, max_queue=1)
    server = EmotionHTTPServer(p, host="127.0.0.1", port=0)
    server.serve_background()
    try:
        host, port = server.server_address[:2]
        jpg = _jpeg_bytes()
        f_running = p.submit(image=jpg)   # stall the batcher
        assert started.wait(10)
        p.submit(image=jpg)               # fill the queue
        req = urllib.request.Request(f"http://{host}:{port}/predict",
                                     data=jpg, method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers.get("Retry-After") == "1"
            assert "queue full" in json.loads(e.read())["error"]
        release.set()
        assert f_running.result(timeout=30)["top"] in EMOTIONS
    finally:
        release.set()
        server.close()
