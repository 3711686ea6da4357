"""Is bench.py's measured rate depressed by fixed per-window overhead?

Each _measure window is: dispatch STEPS async calls, then one scalar
readback.  The timed region therefore contains (a) the first dispatch's
tunnel latency and (b) the final readback RTT as FIXED costs amortized
over STEPS * step_time.  At B=768 / steps=30 a window is ~2.3 s, so
100 ms of fixed cost reads as a 4% throughput loss that the chip never
had.  Measure the same program at steps in {30, 60, 120}, interleaved
3x, plus a fine batch sweep around 768 at the winning steps.

Run on the real chip: python experiments/bench_window.py
"""

import json
import sys
import time


def main() -> int:
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
    from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
    from tumblr_emotions_tpu.train import build_model
    from tumblr_emotions_tpu.utils.compile_opts import tpu_jit

    src = 347
    bs = (736, 768, 800)
    cfg = get_preset("fused_inference")
    model, _ = build_model(cfg)
    t0 = time.perf_counter()
    variables, dev_batches, calib = bench._setup_on_device(model, max(bs), src)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift")
    print(f"# setup+calib {time.perf_counter() - t0:.0f}s", flush=True)

    def body(raw):
        x = preprocess_for_eval(raw, dtype=jnp.bfloat16)
        logits, _ = engine(x)
        return logits.astype(jnp.float32).sum()

    fused = tpu_jit(body)

    def window(b, steps):
        slices = [x[:b] for x in dev_batches]
        float(fused(slices[0]))  # warm
        t0 = time.perf_counter()
        out = None
        for i in range(steps):
            out = fused(slices[i % 4])
        float(out)  # last scalar: stream is serial, proves all finished
        return b * steps / (time.perf_counter() - t0)

    # steps sweep, interleaved 3 rounds so service drift cancels
    acc = {s: [] for s in (30, 60, 120)}
    for _ in range(3):
        for s in acc:
            acc[s].append(window(768, s))
    for s, v in acc.items():
        v.sort()
        print(json.dumps({"steps": s, "median": round(v[1], 1),
                          "max": round(v[-1], 1)}), flush=True)

    # fine batch sweep at steps=120
    for b in bs:
        r = sorted(window(b, 120) for _ in range(3))
        print(json.dumps({"B": b, "steps": 120, "median": round(r[1], 1),
                          "max": round(r[-1], 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
