"""Decode-scaling measurement (VERDICT r2 next-step #7).

Measures the host decode leg's scaling machinery as far as this VM allows:
C++ batch-decoder throughput vs ``decode_threads``, grain pipeline
throughput vs ``worker_count`` x ``decode_threads``, and the overlap
efficiency of decode against a synthetic compute load.  On the 1-core
sandbox the absolute numbers are contention-bound; the point is measured
per-core rates and the efficiency of the overlap machinery, from which the
host-core budget for the 10k img/s north star is arithmetic
(docs/PERFORMANCE.md "Decode scaling" section).

Usage: python experiments/decode_scaling.py [n_images] [size]
"""
import io
import json
import os
import sys
import tempfile
import time

import numpy as np


def make_jpegs(n, size, quality=90):
    from PIL import Image

    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        img = (np.cumsum(np.cumsum(rng.rand(size, size, 3), 0), 1) * 7
               % 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=quality)
        out.append(buf.getvalue())
    return out


def bench_decoder_threads(enc, reps=3):
    """C++ batch decoder rate vs thread-pool size."""
    from tumblr_emotions_tpu.data import jpeg

    rows = []
    for threads in (1, 2, 4, 8):
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jpeg.decode_batch(enc, num_threads=threads)
            rates.append(len(enc) / (time.perf_counter() - t0))
        rows.append({"decode_threads": threads,
                     "images_per_sec": round(sorted(rates)[reps // 2], 1)})
    return rows


def bench_pipeline_workers(enc, size, reps=2):
    """grain pipeline end-to-end rate vs worker_count (subprocess prefetch)."""
    from tumblr_emotions_tpu.data import pipeline, records

    d = tempfile.mkdtemp()
    exs = [records.post_to_example(e, f"post {i}", i % 15, post_id=str(i))
           for i, e in enumerate(enc)]
    records.write_sharded_tfrecords(exs, d, "scale", 4)
    pattern = os.path.join(d, "scale-*.tfrecord")
    rows = []
    for workers in (0, 1, 2):
        for threads in (1, 4):
            cfg = pipeline.PipelineConfig(
                batch_size=16, host_size=size, shuffle=False, num_epochs=1,
                drop_remainder=False, worker_count=workers,
                decode_threads=threads)
            rates = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = sum(int(b["weight"].sum())
                        for b in pipeline.batches(pattern, None, cfg))
                rates.append(n / (time.perf_counter() - t0))
            rows.append({"worker_count": workers, "decode_threads": threads,
                         "images_per_sec": round(max(rates), 1)})
    return rows


def bench_overlap(enc, busy_ms=20.0, reps=3):
    """Overlap efficiency: decode on a background thread while the main
    thread 'computes' (sleeps) — measures how much decode time hides."""
    import threading

    from tumblr_emotions_tpu.data import jpeg

    t0 = time.perf_counter()
    jpeg.decode_batch(enc)
    t_decode = time.perf_counter() - t0
    t_busy = busy_ms / 1000.0

    best = None
    for _ in range(reps):
        done = []

        def producer():
            jpeg.decode_batch(enc)
            done.append(time.perf_counter())

        t0 = time.perf_counter()
        th = threading.Thread(target=producer)
        th.start()
        time.sleep(t_busy)
        th.join()
        total = time.perf_counter() - t0
        best = total if best is None else min(best, total)
    serial = t_decode + t_busy
    overlap_eff = (serial - best) / min(t_decode, t_busy) if best else 0.0
    return {"decode_s": round(t_decode, 3), "busy_s": round(t_busy, 3),
            "overlapped_s": round(best, 3),
            "overlap_efficiency": round(max(0.0, min(1.0, overlap_eff)), 3)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 347
    enc = make_jpegs(n, size)
    kb = sum(len(e) for e in enc) / n / 1024
    print(json.dumps({"n_images": n, "size": size, "avg_kb": round(kb, 1)}))
    print(json.dumps({"decoder_threads": bench_decoder_threads(enc)}))
    print(json.dumps({"pipeline": bench_pipeline_workers(enc, size)}))
    print(json.dumps({"overlap": bench_overlap(enc)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
