"""Chained-conv microbenchmark: amortize dispatch overhead inside one jit.

The per-op version (int8_conv_microbench.py) is dominated by ~2-4 ms of
per-dispatch overhead through this sandbox's remote-TPU tunnel, so each
measurement here runs R=24 dependent convs inside ONE jitted program
(conv(x + i) so XLA cannot CSE them; conv output is renormalized/cast back
to the input dtype between taps to keep shapes fixed).

Usage: python int8_conv_chain.py [batch]
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R = 24

SHAPES = [
    ("stem 2b 3x3 147, 64->64", 147, 64, 3, 3),
    ("stem 4a 3x3 71, 192->192", 71, 192, 3, 3),
    ("A: 3x3 35, 96->96", 35, 96, 3, 3),
    ("A: 1x1 35, 288->288", 35, 288, 1, 1),
    ("B: 1x1 17, 768->768", 17, 768, 1, 1),
    ("B: 1x7 17, 192->192", 17, 192, 1, 7),
    ("C: 3x3 8, 384->384", 8, 384, 3, 3),
]


def bench(fn, args, steps=8):
    jnp.asarray(fn(*args)).astype(jnp.float32).sum().item()
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(steps):
        acc = acc + fn(*args).astype(jnp.float32).sum()
    float(acc)
    return (time.perf_counter() - t0) / steps / R  # per conv


def chain(dtype, out_dtype, kh, kw):
    @jax.jit
    def f(x, w):
        y = x
        for i in range(R):
            o = jax.lax.conv_general_dilated(
                y, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=out_dtype)
            if dtype == jnp.int8:
                # shift back into int8 range (cheap VPU op)
                y = (o >> 12).astype(jnp.int8)
            else:
                y = (o * 0.01).astype(dtype)
        return y
    return f


rng = np.random.RandomState(0)
print(f"B={B} chained x{R}")
for name, H, C, kh, kw in SHAPES:
    flops = 2 * B * H * H * kh * kw * C * C
    xb = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(kh, kw, C, C) * 0.05, jnp.bfloat16)
    tb = bench(chain(jnp.bfloat16, jnp.float32, kh, kw), (xb, wb))
    del xb, wb
    x8 = jnp.asarray(rng.randint(-127, 127, (B, H, H, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (kh, kw, C, C)), jnp.int8)
    try:
        t8 = bench(chain(jnp.int8, jnp.int32, kh, kw), (x8, w8))
        i8s = f"int8 {t8*1e3:7.3f} ms {flops/t8/1e12:6.1f} TOP/s  speedup x{tb/t8:.2f}"
    except Exception as e:
        i8s = f"int8 FAIL {type(e).__name__}: {str(e)[:60]}"
    del x8, w8
    print(f"{name:28s} bf16 {tb*1e3:7.3f} ms {flops/tb/1e12:6.1f} TF/s | {i8s}",
          flush=True)
