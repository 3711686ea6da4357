"""Round-4 engine levers, measured whole-engine (B=768, steps=120).

  base : bf16 preprocess -> int8 shift engine (round-3 headline)
  s2d  : preprocess_for_eval_s2d -> stem_s2d="pre" engine (conv1a K=12,
         relayout folded into the resize einsums for free)
  pool : pool_mode="int8" (pool branches requant pre-pool; 1-byte pool
         input instead of 4)
  both : s2d + pool

Interleaved 3 rounds so service drift cancels; one setup compile.
Run on the real chip: python experiments/serving_round4b.py
"""

import json
import sys
import time


def main() -> int:
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.data.preprocessing import (
        preprocess_for_eval, preprocess_for_eval_s2d)
    from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
    from tumblr_emotions_tpu.train import build_model
    from tumblr_emotions_tpu.utils.compile_opts import tpu_jit

    B, steps, src = 768, 120, 347
    cfg = get_preset("fused_inference")
    model, _ = build_model(cfg)
    t0 = time.perf_counter()
    variables, dev_batches, calib = bench._setup_on_device(model, B, src)
    engines = {
        "base": QuantizedInceptionV3(variables, calib, epilogue="shift"),
        "s2d": QuantizedInceptionV3(variables, calib, epilogue="shift",
                                    stem_s2d="pre"),
        "pool": QuantizedInceptionV3(variables, calib, epilogue="shift",
                                     pool_mode="int8"),
        "both": QuantizedInceptionV3(variables, calib, epilogue="shift",
                                     stem_s2d="pre", pool_mode="int8"),
    }
    print(f"# setup+calib {time.perf_counter() - t0:.0f}s", flush=True)

    def make_body(eng, s2d):
        pre = preprocess_for_eval_s2d if s2d else preprocess_for_eval

        def body(raw):
            x = pre(raw, dtype=jnp.bfloat16)
            logits, _ = eng(x)
            return logits.astype(jnp.float32).sum()
        return tpu_jit(body)

    fns = {k: make_body(v, k in ("s2d", "both")) for k, v in engines.items()}

    def window(fn):
        float(fn(dev_batches[0]))  # warm/compile
        t0 = time.perf_counter()
        out = None
        for i in range(steps):
            out = fn(dev_batches[i % 4])
        float(out)
        return B * steps / (time.perf_counter() - t0)

    acc = {k: [] for k in fns}
    for _ in range(3):
        for k, fn in fns.items():
            acc[k].append(window(fn))
    for k, v in acc.items():
        v.sort()
        print(json.dumps({"engine": k, "median": round(v[1], 1),
                          "all": [round(x, 1) for x in v]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
