"""Bench the int8 quantized engine vs the bf16 packed engine (bench.py's
methodology: 4 cycled device-resident uint8 batches, readback-terminated
windows, median of 3)."""
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
from tumblr_emotions_tpu.ops.inference import FusedInceptionV3
from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
which = sys.argv[3] if len(sys.argv) > 3 else "int8"
src = 347

cfg = get_preset("fused_inference")
model, _ = build_model(cfg)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 299, 299, 3), jnp.bfloat16), train=False)

rng = np.random.RandomState(0)
host = [rng.randint(0, 256, size=(batch, src, src, 3), dtype=np.uint8)
        for _ in range(4)]
dev_batches = [jax.device_put(h) for h in host]

if which == "int8":
    calib = preprocess_for_eval(dev_batches[0][:64], dtype=jnp.float32)
    engine = QuantizedInceptionV3(variables, calib)
else:
    engine = FusedInceptionV3(variables, dtype=jnp.bfloat16, use_pallas=False,
                              pack_branches=(which != "bf16_nopack"))

@jax.jit
def fused(raw):
    x = preprocess_for_eval(raw, dtype=jnp.bfloat16)
    logits, _ = engine(x)
    return logits.astype(jnp.float32).sum()

float(fused(dev_batches[0]))
rates = []
for _ in range(3):
    t0 = time.perf_counter()
    outs = [fused(dev_batches[i % 4]) for i in range(steps)]
    float(jnp.stack(outs).sum())
    rates.append(batch * steps / (time.perf_counter() - t0))
print(f"{which} B={batch}: {sorted(rates)[1]:.1f} img/s (all: {[round(r) for r in rates]})")
