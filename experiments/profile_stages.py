"""Per-stage prefix timing of the int8 engine (tunnel-safe: no profiler).

Times jitted prefixes of the tower ending at each stop_at cut; differences
give per-stage cost.  Per-dispatch tunnel overhead is constant across
prefixes so it cancels in the differences.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tumblr_emotions_tpu.config import get_preset
from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
from tumblr_emotions_tpu.train import build_model
from tumblr_emotions_tpu.ops import quant

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
steps = 16

cfg = get_preset("fused_inference")
model, _ = build_model(cfg)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 299, 299, 3), jnp.bfloat16), train=False)
rng = np.random.RandomState(0)
raw = jax.device_put(rng.randint(0, 256, size=(B, 347, 347, 3), dtype=np.uint8))
calib = preprocess_for_eval(raw[:64], dtype=jnp.float32)
engine = quant.QuantizedInceptionV3(variables, calib)


def timed(fn):
    float(fn(raw))
    best = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(raw) for _ in range(steps)]
        float(jnp.stack(outs).sum())
        best.append((time.perf_counter() - t0) / steps)
    return sorted(best)[1]


def prefix(stop):
    @jax.jit
    def f(raw):
        x = preprocess_for_eval(raw, dtype=jnp.bfloat16)
        if stop == "preprocess":
            return x.astype(jnp.float32).sum()
        ops = quant._Int8Ops(engine.folded, engine.scales,
                             epilogue=engine.epilogue)
        t = quant._tower(ops, x, stop_at=None if stop == "full" else stop)
        if isinstance(t, tuple):
            return t[0].astype(jnp.float32).sum()
        return t.astype(jnp.float32).sum()
    return f


stages = ["preprocess", "stem", "Mixed_5d", "Mixed_6a", "Mixed_6e",
          "Mixed_7a", "full"]
prev = 0.0
print(f"B={B}")
for s in stages:
    t = timed(prefix(s))
    print(f"{s:12s} cum {t*1e3:7.2f} ms  stage {(t-prev)*1e3:7.2f} ms", flush=True)
    prev = t
