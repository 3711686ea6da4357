"""Pallas int8 plane-shift conv for VALID 3x3 stride-1 layers (stem 4a).

Why this exists: XLA's int8 conv emitter sustains only ~82 TOP/s on the
stem's Conv2d_4a_3x3 ([B,73,73,80] -> [B,71,71,192]) — the single most
expensive conv of the quantized engine (~5.3 ms of a ~55 ms step at
B=512).  A whole input plane fits VMEM (<1 MB int8), so a per-image
program can compute the conv as 9 shifted [H*W, Cin] x [Cin, Cout] MXU
matmuls accumulated in i32, with the integer shift epilogue fused.

The round-1 plane-shift kernels lost to XLA on SAME convs because every
tap needed a validity mask (VPU work) and bf16 halved the MXU rate.  For
VALID convs the masks vanish entirely: out(i,j) = sum_taps x[(i+dy)*W +
(j+dx)] indexed on the INPUT grid, so tap shifts only pollute the last
kh-1 rows / kw-1 cols of the input-grid accumulator — exactly the
rows/cols the VALID slice drops.  int8 doubles the MXU rate on top.

Mosaic constraint: collapsing [H, W, C] -> [H*W, C] needs W to be a
multiple of the int8 sublane tile (32), so the caller pads W up to the
next multiple; the pad columns land in the discarded region like the tap
wrap-around does.

NOT wired into the engine: benched 6x SLOWER than XLA's int8 conv on the
real 4a shape (21 vs 134 TOP/s — the 9 per-tap plane copies and the
K=Cin per-tap contraction cost more than the fusion saves; full ledger
in docs/PERFORMANCE.md).  Kept as a reproducible negative result with a
bit-exact parity test (tests/test_fused_inception.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 32  # int8 sublane tile


def _kernel(x_ref, w_ref, b_ref, k_ref, o_ref, *, H, Wp, Cin, Cout, kh, kw,
            Ho, Wo):
    """One image: VALID khxkw conv + integer requant epilogue.

    x_ref: [1, H, Wp, Cin] int8 (width padded to a sublane multiple);
    w_ref: [kh*kw, Cin, Cout] int8; b_ref/k_ref: [1, Cout] i32;
    o_ref: [1, Ho, Wo, Cout] int8 with Ho = H-kh+1, Wo <= Wp-kw+1.
    """
    flat = x_ref[0].reshape(H * Wp, Cin)
    acc = jnp.zeros((H * Wp, Cout), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            shift = dy * Wp + dx
            # Tap-shifted view on the input grid: out-of-range rows only
            # affect rows/cols the VALID slice below discards — no masks.
            # Shift = static slice + zero tail (Mosaic's rotate is
            # 32-bit-only on this backend; round-1 finding).
            if shift:
                xs = jnp.concatenate(
                    [flat[shift:],
                     jnp.zeros((shift, Cin), flat.dtype)], axis=0)
            else:
                xs = flat
            acc += jax.lax.dot_general(
                xs, w_ref[dy * kw + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = jnp.clip((acc + b_ref[0][None, :]) >> k_ref[0][None, :], 0, 127)
    y = y.astype(jnp.int8).reshape(H, Wp, Cout)
    o_ref[0] = y[:Ho, :Wo, :]


@functools.partial(jax.jit, static_argnames=("kh", "kw", "interpret"))
def _run(x, w, b_i32, k_i32, kh, kw, interpret=False):
    B, H, W, Cin = x.shape
    taps, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    Wp = ((W + _SUBLANE - 1) // _SUBLANE) * _SUBLANE
    if Wp != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    out_shape = jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.int8)
    kern = functools.partial(_kernel, H=H, Wp=Wp, Cin=Cin, Cout=Cout,
                             kh=kh, kw=kw, Ho=Ho, Wo=Wo)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wp, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, Cin, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(x, w, b_i32, k_i32)


def valid_conv3x3_int8_shift(x, w_q, b_i32, k_i32, interpret=False):
    """VALID 3x3 stride-1 int8 conv with fused integer shift epilogue.

    x: [B, H, W, Cin] int8; w_q: [3, 3, Cin, Cout] int8; b_i32/k_i32:
    [Cout] i32 (bias-with-rounding and per-channel right shift, as built
    by ops.quant._Int8Ops._weights in "shift" mode).
    Returns [B, H-2, W-2, Cout] int8 == the XLA path bit for bit.
    """
    kh, kw, Cin, Cout = w_q.shape
    w_flat = jnp.asarray(np.asarray(w_q).reshape(kh * kw, Cin, Cout))
    return _run(jnp.asarray(x), w_flat,
                jnp.asarray(b_i32, jnp.int32)[None, :],
                jnp.asarray(k_i32, jnp.int32)[None, :],
                kh, kw, interpret=interpret)
