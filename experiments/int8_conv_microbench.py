"""Microbenchmark: int8 vs bf16 convs on representative Inception-v3 shapes.

Round-2 perf exploration (VERDICT.md next-step #1): v5e MXU int8 peak is 2x
bf16 and int8 halves HBM traffic — measure whether XLA:TPU actually lowers
s8xs8->s32 conv_general_dilated onto the int8 MXU path before building the
quantized serving engine.

Usage: python int8_conv_microbench.py [batch] [mode: bf16|int8|both]

Timing methodology per docs/PERFORMANCE.md: through this sandbox's TPU
tunnel block_until_ready() is async, so each timed window ends with a
scalar readback depending on every step.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MODE = sys.argv[2] if len(sys.argv) > 2 else "both"

# (name, H, Cin, Cout, kh, kw, stride)  — representative hot shapes
SHAPES = [
    ("stem 1a 3x3 s2 299->149, 3->32", 299, 3, 32, 3, 3, 2),
    ("stem 2b 3x3 147, 32->64", 147, 32, 64, 3, 3, 1),
    ("stem 4a 3x3 73, 80->192", 73, 80, 192, 3, 3, 1),
    ("A: 3x3 35, 64->96", 35, 64, 96, 3, 3, 1),
    ("A: 1x1 35, 288->64", 35, 288, 64, 1, 1, 1),
    ("B: 1x1 17, 768->192", 17, 768, 192, 1, 1, 1),
    ("B: 1x7 17, 160->160", 17, 160, 160, 1, 7, 1),
    ("B: 7x1 17, 160->192", 17, 160, 192, 7, 1, 1),
    ("C: 3x3 8, 448->384", 8, 448, 384, 3, 3, 1),
]


def bench(fn, args, steps=20):
    out = fn(*args)
    jnp.asarray(out).astype(jnp.float32).sum().item()  # compile+complete
    del out
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(steps):
        o = fn(*args)
        acc = acc + o.astype(jnp.float32).sum()
        del o
    float(acc)
    return (time.perf_counter() - t0) / steps


def make_conv(stride, out_dtype):
    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding="SAME" if stride == 1 else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)
    return f


rng = np.random.RandomState(0)
print(f"B={B} mode={MODE}")
for name, H, Cin, Cout, kh, kw, s in SHAPES:
    flops = 2 * B * (H // s) * (H // s) * kh * kw * Cin * Cout
    line = f"{name:38s}"
    if MODE in ("bf16", "both"):
        xb = jnp.asarray(rng.randn(B, H, H, Cin), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(kh, kw, Cin, Cout), jnp.bfloat16)
        tb = bench(make_conv(s, jnp.float32), (xb, wb))
        line += f" bf16 {tb*1e3:8.2f} ms {flops/tb/1e12:6.1f} TF/s |"
        del xb, wb
    if MODE in ("int8", "both"):
        x8 = jnp.asarray(rng.randint(-127, 127, (B, H, H, Cin)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 127, (kh, kw, Cin, Cout)), jnp.int8)
        try:
            t8 = bench(make_conv(s, jnp.int32), (x8, w8))
            line += f" int8 {t8*1e3:8.2f} ms {flops/t8/1e12:6.1f} TOP/s"
        except Exception as e:
            line += f" int8 FAIL: {type(e).__name__}: {str(e)[:60]}"
        del x8, w8
    print(line, flush=True)
