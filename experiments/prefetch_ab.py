"""device_prefetch on/off A/B on the production train feed (VERDICT r3 #3).

Two arms, each measured as whole-loop images/sec on the real chip with the
joint train step (B, perf mode, fused train preprocessing):

  records : the REAL production feed — sharded TFRecords -> grain ->
            C++ JPEG batch decode -> (DevicePrefetchIterator | inline
            shard_batch) -> donated train step.  On this 1-core host the
            decode pool is the known bottleneck (~115 img/s measured,
            docs/PERFORMANCE.md), so this arm shows whether prefetch at
            least doesn't HURT an input-bound feed.
  ram     : pre-assembled uint8 numpy batches (decode cost removed) ->
            (prefetch | inline) -> train step.  Isolates what the
            prefetcher actually overlaps — host->device transfer and
            dispatch — from decode; this is the regime a multi-core
            production host with enough decode workers lands in.

Each arm runs prefetch depth {0, 2} interleaved twice so service drift
cancels.  Runs are ISOLATED: every stream is close()d (or dropped and
gc'd) before the next timed window starts — the first version of this
experiment abandoned the records-arm prefetcher mid-decode, so its
producer thread's in-flight JPEG work bled into the next window on this
1-core host and corrupted both arms (ledgered as a measurement bug).  A
one-time host->device transfer probe is printed first so the arm rates
can be attributed: on this tunneled single-chip sandbox the device_put
of a uint8 train batch is itself a large fraction of the loop.

Run: python experiments/prefetch_ab.py [B] [steps] [--probe-only]
"""

import gc
import io
import json
import os
import sys
import tempfile
import time

import numpy as np


def _make_corpus(path: str, n: int, side: int) -> str:
    from PIL import Image

    from tumblr_emotions_tpu.data import records

    rng = np.random.default_rng(0)
    exs = []
    for i in range(n):
        img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        exs.append(records.post_to_example(
            buf.getvalue(), f"synthetic post {i}", int(i % 15),
            post_id=str(i)))
    records.write_sharded_tfrecords(exs, path, "ab", 2)
    return os.path.join(path, "ab-*.tfrecord")


def main() -> int:
    import jax

    sys.path.insert(0, ".")
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.data import pipeline
    from tumblr_emotions_tpu.data.vocab import build_vocabulary
    from tumblr_emotions_tpu.parallel import mesh as mesh_lib
    from tumblr_emotions_tpu.train import Trainer

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(pos[0]) if len(pos) > 0 else 64
    steps = int(pos[1]) if len(pos) > 1 else 24
    host_side = 347

    cfg = get_preset("joint_finetune")
    cfg = cfg.replace(train=cfg.train.replace(batch_size=B,
                                              precision_mode="perf"))
    vocab = build_vocabulary([f"synthetic post {i}" for i in range(64)],
                             min_freq=1)
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=vocab.size))

    tmp = tempfile.mkdtemp(prefix="prefetch_ab_")
    pattern = _make_corpus(tmp, n=max(B * (steps + 4), 512), side=256)
    pcfg = pipeline.PipelineConfig(
        batch_size=B, host_size=host_side, max_len=cfg.text.max_len,
        shuffle=False, num_epochs=None, decode_threads=8)

    trainer = Trainer(cfg, preprocess="train")
    sample = next(pipeline.batches(pattern, vocab, pcfg))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    trainer.compile()
    rng = jax.random.PRNGKey(1)

    # Pre-assembled RAM batches for the decode-free arm (cycled).
    ram = []
    it0 = pipeline.batches(pattern, vocab, pcfg)
    for _ in range(4):
        ram.append(next(it0))

    def run(stream, st):
        t0 = time.perf_counter()
        m = None
        n = 0
        for batch in stream:
            if n >= steps:
                break
            if not isinstance(batch, (dict,)) or "image" not in batch:
                continue
            st, m = trainer._compiled_train(st, batch, rng)
            n += 1
        float(m["loss"])
        rate = B * n / (time.perf_counter() - t0)
        # Isolate windows: stop the producer thread (and its in-flight
        # decode work) before the next window is timed.
        if hasattr(stream, "close"):
            stream.close()
        del stream
        gc.collect()
        time.sleep(1.0)
        return rate, st

    def records_stream(depth):
        raw = pipeline.batches(pattern, vocab, pcfg)
        if depth > 0:
            return pipeline.DevicePrefetchIterator(raw, trainer.mesh,
                                                   depth=depth)
        return (mesh_lib.shard_batch(trainer.mesh, b) for b in raw)

    def ram_stream(depth):
        def gen():
            for i in range(steps + depth + 1):
                yield ram[i % len(ram)]
        if depth > 0:
            return pipeline.DevicePrefetchIterator(gen(), trainer.mesh,
                                                   depth=depth)
        return (mesh_lib.shard_batch(trainer.mesh, b) for b in gen())

    # One-time context probe: pure host->device transfer rate for this
    # batch (the tunnel link on this sandbox), and pure device step rate.
    # Steps are timed INDIVIDUALLY with a block after each, after three
    # un-timed settling steps that chain the OUTPUT state: the first
    # version timed an 8-step window whose first call recompiled (the
    # donated init-layout state differs from the output-layout state), so
    # it reported 67 s/step against arm loops running at ~1 s/step —
    # ledgered as a measurement bug.  Median of per-step times is immune
    # to a one-off recompile and the per-step list makes one visible.
    dev = jax.devices()[0]
    nbytes = sum(v.nbytes for v in ram[0].values())
    t0 = time.perf_counter()
    for i in range(4):
        jax.block_until_ready(
            {k: jax.device_put(v, dev) for k, v in ram[i % len(ram)].items()})
    put_s = (time.perf_counter() - t0) / 4
    on_dev = mesh_lib.shard_batch(trainer.mesh, ram[0])
    st2, m2 = trainer._compiled_train(state, on_dev, rng)
    for _ in range(3):  # settle output layouts before timing
        st2, m2 = trainer._compiled_train(st2, on_dev, rng)
    float(m2["loss"])
    per_step = []
    for _ in range(8):
        t0 = time.perf_counter()
        st2, m2 = trainer._compiled_train(st2, on_dev, rng)
        float(m2["loss"])
        per_step.append(time.perf_counter() - t0)
    step_s = float(np.median(per_step))
    state = st2
    print(json.dumps({
        "probe": {"batch_mb": round(nbytes / 2**20, 1),
                  "device_put_s": round(put_s, 3),
                  "device_put_mb_s": round(nbytes / 2**20 / put_s, 1),
                  "train_step_s": round(step_s, 4),
                  "train_step_s_each": [round(s, 3) for s in per_step],
                  "step_img_s": round(B / step_s, 1)}}), flush=True)
    if "--probe-only" in sys.argv:
        return 0

    # warm both step shapes once (compile outside timed windows)
    _, state = run(ram_stream(0), state)

    results = {}
    for arm, maker in (("records", records_stream), ("ram", ram_stream)):
        for rnd in range(2):
            for depth in (0, 2):
                rate, state = run(maker(depth), state)
                results.setdefault((arm, depth), []).append(rate)
                print(json.dumps({"arm": arm, "depth": depth, "round": rnd,
                                  "img_s": round(rate, 1)}), flush=True)
    summary = {f"{arm}/depth{d}": round(float(np.median(v)), 1)
               for (arm, d), v in results.items()}
    for arm in ("records", "ram"):
        on, off = summary[f"{arm}/depth2"], summary[f"{arm}/depth0"]
        summary[f"{arm}_speedup"] = round(on / off, 3)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
