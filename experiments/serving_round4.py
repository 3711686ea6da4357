"""Round-4 serving sweep: push the 10,110 img/s headline toward >=10.5k.

VERDICT r3 #1: the driver bench landed at 9,945.9 (0.9946x) because the
headline config clears 10k only at the center of the ±1% service-drift
band.  Levers named there, measured here under the default tuned flags
(scoped vmem 64M + scavenge + conv-input downcast fusion):

  A: bf16 preprocess -> int8 shift engine      (round-3 headline)
  U: forward_from_uint8 (int8-GEMM preprocess) (10,066 under the flag)

interleaved at B in {640, 768, 896}, then a fine vmem sweep on the
winner.  One on-device setup compile at the max batch (slow-session-proof
like bench.py); smaller batches slice the same device arrays.

Run on the real chip (kill any other TPU client first):
    python experiments/serving_round4.py [steps]
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
    from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
    from tumblr_emotions_tpu.train import build_model
    from tumblr_emotions_tpu.utils.compile_opts import (
        DEFAULT_TPU_COMPILER_OPTIONS, tpu_jit)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    bs = (640, 768, 896)
    src = 347

    cfg = get_preset("fused_inference")
    model, _ = build_model(cfg)
    t0 = time.perf_counter()
    variables, dev_batches, calib = bench._setup_on_device(model, max(bs), src)
    print(f"# setup {time.perf_counter() - t0:.0f}s", flush=True)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift")
    print(f"# calib {time.perf_counter() - t0:.0f}s", flush=True)

    def body_a(raw):
        x = preprocess_for_eval(raw, dtype=jnp.bfloat16)
        logits, _ = engine(x)
        return logits.astype(jnp.float32).sum()

    def body_u(raw):
        logits, _ = engine.forward_from_uint8(raw)
        return logits.astype(jnp.float32).sum()

    def measure(fn, b, opts=None):
        fused = tpu_jit(fn, compiler_options=opts)
        slices = [x[:b] for x in dev_batches]
        return bench._measure(fused, slices, b, steps)[0]

    results = {}
    for b in bs:
        # Interleave A and U at the same batch so drift cancels.
        a1 = measure(body_a, b)
        u1 = measure(body_u, b)
        results[f"A/B{b}"] = a1
        results[f"U/B{b}"] = u1
        print(json.dumps({"config": f"B={b}", "bf16_pre": round(a1, 1),
                          "uint8_front": round(u1, 1)}), flush=True)

    best_key = max(results, key=results.get)
    variant, bstr = best_key.split("/")
    b = int(bstr[1:])
    fn = body_a if variant == "A" else body_u
    print(json.dumps({"winner": best_key, "img_s": round(results[best_key], 1)}),
          flush=True)

    for kib in (57344, 65536, 73728):
        opts = dict(DEFAULT_TPU_COMPILER_OPTIONS,
                    xla_tpu_scoped_vmem_limit_kib=str(kib))
        r = measure(fn, b, opts)
        print(json.dumps({"config": f"{best_key} vmem={kib // 1024}m",
                          "img_s": round(r, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
