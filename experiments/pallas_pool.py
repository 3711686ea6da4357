"""Pallas int8 3x3/2 VALID maxpool vs XLA reduce_window (pool3a shape).

pool3a: [B,147,147,32] int8 -> [B,73,73,32].  XLA: 1.74 ms at B=512
(CSE-proof), bandwidth SOL ~0.9 ms.  Memory-bound VPU op — the one class
Pallas hadn't been tried on in this repo.

RESULT (2026-08-17, negative — third Pallas strike on this stack): the
stride-2 compaction is NOT expressible on this Mosaic/libtpu version.
Every data-movement primitive it needs fails:
  - strided slice `b[::2]` (sublane stride): "Shape mismatch in input,
    indices and output" at gather lowering (any rank);
  - lane-permutation `take_along_axis` (same-shape indices, int8 AND
    i32): remote tpu_compile_helper crash (HTTP 500);
  - `pltpu.roll` on lanes, int8: same crash (round-1 already found
    rotate is 32-bit-only here).
The window maxes themselves (concat-shift + maximum, static sublane
slices) lower fine — only the strided SELECT does not.  A log-shuffle
compaction from i32 rolls would cost ~7 select passes over 4x-wide data
and loses on arithmetic alone.  XLA's reduce_window stays.  Ledger:
docs/PERFORMANCE.md.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 768
G = int(sys.argv[2]) if len(sys.argv) > 2 else 4   # images per program
H = W = 147
C = 32
HO = WO = 73


def xla_pool(x):
    return jax.lax.reduce_window(
        x, jnp.int8(jnp.iinfo(jnp.int8).min), jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")


def _kernel_3d(x_ref, o_ref):
    x = x_ref[...]  # [G,147,147,32] int8
    a = jnp.maximum(jnp.maximum(x[:, 0:145], x[:, 1:146]), x[:, 2:147])
    b = jnp.maximum(jnp.maximum(a[:, :, 0:145], a[:, :, 1:146]),
                    a[:, :, 2:147])
    o_ref[...] = b[:, ::2, ::2]


def pallas_pool_3d(x):
    return pl.pallas_call(
        _kernel_3d,
        out_shape=jax.ShapeDtypeStruct((B, HO, WO, C), jnp.int8),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, HO, WO, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


_LANE_IDX = np.asarray(
    [64 * (j // C) + (j % C) for j in range(WO * C)], np.int32)


def _kernel_2d(x_ref, o_ref):
    # Lane-packed: [147, 147*32]; W-neighbor = lane shift by 32.
    x = x_ref[0]  # [147, 4704]
    z = jnp.full((H, C), jnp.iinfo(jnp.int8).min, jnp.int8)
    x1 = jnp.concatenate([x[:, C:], z], axis=1)
    x2 = jnp.concatenate([x[:, 2 * C:], z, z], axis=1)
    a = jnp.maximum(jnp.maximum(x, x1), x2)          # [147, 4704] W-max
    b = jnp.maximum(jnp.maximum(a[0:145], a[1:146]), a[2:147])  # H-max
    sel = b[::2]                                     # [73, 4704] H-stride
    # Lane compaction idx[j] = 64*(j//32) + j%32 = 2*j - j%32, built
    # in-kernel from a 2D iota (constants can't be captured).
    # Mosaic's gather wants indices shaped like the INPUT: express the
    # compaction as a same-width permutation, then slice the live prefix.
    j = jax.lax.broadcasted_iota(jnp.int32, (HO, W * C), 1)
    idx = jnp.where(j < WO * C, 2 * j - (j % C), j)
    g = jnp.take_along_axis(sel, idx, axis=1)
    o_ref[0] = g[:, :WO * C]


def pallas_pool_2d(x):
    xf = x.reshape(B, H, W * C)
    out = pl.pallas_call(
        _kernel_2d,
        out_shape=jax.ShapeDtypeStruct((B, HO, WO * C), jnp.int8),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, HO, WO * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out.reshape(B, HO, WO, C)


def timeit(name, fn, x):
    g = jax.jit(fn)
    try:
        o = g(x)
        np.asarray(jnp.ravel(o)[0])
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(20):
            o = g(x)
        np.asarray(jnp.ravel(o)[0])
        rates.append((time.perf_counter() - t0) / 20 * 1000)
    ms = sorted(rates)[1]
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    x = jax.jit(lambda k: jax.random.randint(
        k, (B, H, W, C), -127, 128, dtype=jnp.int8))(jax.random.PRNGKey(0))
    ref = jax.jit(xla_pool)(x)
    for name, fn in (("pallas_3d", pallas_pool_3d),
                     ("pallas_2d", pallas_pool_2d)):
        try:
            got = jax.jit(fn)(x)
            ok = bool(jnp.array_equal(got, ref))
            print(f"{name} parity: {ok}", flush=True)
            if not ok:
                d = np.argwhere(np.asarray(got) != np.asarray(ref))
                print("  first mismatches:", d[:3])
        except Exception as e:  # noqa: BLE001
            print(f"{name} parity: FAILED {type(e).__name__}: {str(e)[:300]}")
    timeit("xla reduce_window", xla_pool, x)
    timeit("pallas_3d        ", pallas_pool_3d, x)
    timeit("pallas_2d        ", pallas_pool_2d, x)


if __name__ == "__main__":
    main()
