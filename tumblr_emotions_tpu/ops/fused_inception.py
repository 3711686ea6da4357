"""Pallas-fused Inception blocks: one HBM read per block instead of ~five.

Profiling the XLA inference path on v5e (see bench.py) shows the Mixed
blocks are HBM-bound: every branch of an Inception block re-reads the same
input plane from HBM, and each branch output is written back before the
concat reads it again.  These kernels keep the whole spatial plane of ONE
image resident in VMEM (35x35x288 bf16 = 0.7 MB, 17x17x768 = 0.45 MB) and
compute every branch there, writing only the concatenated output — ~3-4x
less HBM traffic for the stage.

Technique: on a plane flattened to [H*W, C] (lane dim = channels, where the
MXU wants them), a kxk SAME conv is a sum over taps (dy, dx) of

    roll(X, -(dy*W + dx), axis=0) * valid_mask(dy, dx)  @  W[tap]

— a pure row shift, because flat index p = y*W + x shifts by dy*W + dx.
Each tap is an MXU matmul [HWp, Cin] x [Cin, Cout] accumulated in f32;
masking zeroes rows whose source (y+dy, x+dx) falls outside the image, which
reproduces SAME zero-padding exactly.  Average pool is the same shift/mask
trick with a position-dependent divisor (TF's count_include_pad=False).

Inference-only: batch-norm is folded into the conv weights beforehand
(fold_batchnorm), so each conv is relu(x @ w' + b').  The training path
stays on XLA (these kernels carry no custom VJP; training is not the
10k-img/s north-star path).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flax import traverse_util


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Batch-norm folding (inference)
# ---------------------------------------------------------------------------

def fold_batchnorm(params: Dict, batch_stats: Dict, eps: float = 0.001
                   ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Fold slim BN (scale=False) into conv weights for inference.

    Returns {conv_scope: (w_folded [kh,kw,Cin,Cout], b_folded [Cout])}.
    y = (x*w - mean) * inv + beta  ==  x @ (w*inv) + (beta - mean*inv).
    Convs without BN (Logits/AuxLogits heads) pass through with their biases.
    """
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_s = traverse_util.flatten_dict(batch_stats, sep="/")
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for key, w in flat_p.items():
        if not key.endswith("/weights"):
            continue
        scope = key[: -len("/weights")]
        w = np.asarray(w, np.float32)
        mean = flat_s.get(f"{scope}/BatchNorm/moving_mean")
        if mean is not None:
            var = np.asarray(flat_s[f"{scope}/BatchNorm/moving_variance"],
                             np.float32)
            beta = np.asarray(flat_p[f"{scope}/BatchNorm/beta"], np.float32)
            gamma = flat_p.get(f"{scope}/BatchNorm/gamma")
            inv = 1.0 / np.sqrt(var + eps)
            if gamma is not None:
                inv = inv * np.asarray(gamma, np.float32)
            out[scope] = (w * inv, beta - np.asarray(mean, np.float32) * inv)
        else:
            b = flat_p.get(f"{scope}/biases")
            out[scope] = (w, np.zeros(w.shape[-1], np.float32) if b is None
                          else np.asarray(b, np.float32))
    return out


def _taps(w: np.ndarray) -> np.ndarray:
    """[kh,kw,Cin,Cout] -> [kh*kw, Cin, Cout] tap stack."""
    kh, kw, ci, co = w.shape
    return np.ascontiguousarray(w.reshape(kh * kw, ci, co))


# ---------------------------------------------------------------------------
# The kernel builder
# ---------------------------------------------------------------------------

def _valid_mask(H: int, W: int, HWp: int, dy: int, dx: int, dtype,
                rows: Optional[int] = None):
    """[rows, 1] mask: 1 where source (y+dy, x+dx) is inside the image.

    ``rows`` may be a multiple of HWp (several images stacked in one plane
    buffer); the mask pattern repeats per image.  Within-image row shifts
    never cross plane boundaries for VALID targets (a valid target's source
    index stays < H*W <= HWp), so cross-plane reads only happen on rows this
    mask zeroes.
    """
    rows = HWp if rows is None else rows
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % HWp
    y = idx // W
    x = idx - y * W
    ok = (idx < H * W) & (y + dy >= 0) & (y + dy < H) \
        & (x + dx >= 0) & (x + dx < W)
    return ok.astype(dtype)


def _shift_rows(x, k: int):
    """out[p] = x[p + k], zero-filled outside — a non-wrapping row shift.

    Implemented as static slice + concat with zeros (Mosaic's rotate op only
    supports 32-bit data on this backend, and the wrapped rows would be
    masked to zero anyway).
    """
    if k == 0:
        return x
    zeros = jnp.zeros((abs(k), x.shape[1]), x.dtype)
    if k > 0:
        return jnp.concatenate([x[k:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:k]], axis=0)


def _conv_same(x, w_ref, b_ref, H: int, W: int, HWp: int, kh: int, kw: int,
               relu: bool = True, dtype=jnp.bfloat16):
    """SAME conv on flattened [G*HWp, Cin] stacked planes via shifted MXU
    matmuls (G images per program)."""
    rows = x.shape[0]
    acc = None
    tap = 0
    for dy in range(-(kh // 2), kh // 2 + 1):
        for dx in range(-(kw // 2), kw // 2 + 1):
            src = _shift_rows(x, dy * W + dx)
            src = src * _valid_mask(H, W, HWp, dy, dx, x.dtype, rows)
            d = jnp.dot(src, w_ref[tap], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            tap += 1
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(dtype)


def _avg_pool3(x, H: int, W: int, HWp: int):
    """3x3 stride-1 SAME avg pool, count_include_pad=False, on stacked
    [G*HWp, C] planes."""
    rows = x.shape[0]
    acc = jnp.zeros(x.shape, jnp.float32)
    cnt = jnp.zeros((rows, 1), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m = _valid_mask(H, W, HWp, dy, dx, jnp.float32, rows)
            src = _shift_rows(x, dy * W + dx)
            acc = acc + src.astype(jnp.float32) * m
            cnt = cnt + m
    cnt = jnp.maximum(cnt, 1.0)
    return (acc / cnt).astype(x.dtype)


def _plane_kernel(branch_fn, n_weights: int):
    """Wrap a branch_fn(x, weight_refs...) into a pallas kernel body."""

    def kernel(x_ref, *refs):
        w_refs = refs[:n_weights]
        out_ref = refs[n_weights]
        g, hwp, cin = x_ref.shape
        x = x_ref[:].reshape(g * hwp, cin)
        out = branch_fn(x, w_refs)
        out_ref[:] = out.reshape(g, hwp, out.shape[-1])

    return kernel


def _run_plane_block(x: jax.Array, H: int, W: int, weights: List[np.ndarray],
                     branch_fn, cout: int, interpret: bool = False,
                     images_per_block: int = 1) -> jax.Array:
    """Launch the plane kernel: x [B, H, W, Cin] -> [B, H, W, cout].

    ``images_per_block`` (G) stacks several images per grid step so each tap
    matmul has G*HWp rows — better MXU utilization at the cost of VMEM.
    """
    B, h, w, cin = x.shape
    assert (h, w) == (H, W), (x.shape, H, W)
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    HWp = _round_up(H * W, sub)
    G = images_per_block
    pad_b = (-B) % G
    xf = x.reshape(B, H * W, cin)
    if HWp != H * W:
        xf = jnp.pad(xf, ((0, 0), (0, HWp - H * W), (0, 0)))
    if pad_b:
        xf = jnp.pad(xf, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b

    w_arrs = []
    for a in weights:
        if a.ndim == 1:  # bias: VMEM wants >=2D, keep f32
            w_arrs.append(jnp.asarray(a, jnp.float32).reshape(1, -1))
        else:
            w_arrs.append(jnp.asarray(a, x.dtype))
    in_specs = [pl.BlockSpec((G, HWp, cin), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    for a in w_arrs:
        in_specs.append(pl.BlockSpec(
            a.shape, functools.partial(lambda nd, b: (0,) * nd, a.ndim),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _plane_kernel(branch_fn, len(w_arrs)),
        grid=(Bp // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, HWp, cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, HWp, cout), x.dtype),
        # The unrolled tap chain peaks slightly over the 16 MB default
        # scoped-vmem budget; v5e has headroom above that.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, *w_arrs)
    return out[:B, : H * W].reshape(B, H, W, cout)


# ---------------------------------------------------------------------------
# Inception-A (Mixed_5b/5c/5d): 35x35 stage
# ---------------------------------------------------------------------------

def fused_inception_a(x: jax.Array, folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
                      scope: str, quirky_5c: bool = False,
                      interpret: bool = False,
                      images_per_block: int = 1) -> jax.Array:
    """x [B, 35, 35, Cin] -> [B, 35, 35, Cout] with one HBM round trip.

    ``folded``: fold_batchnorm() output for the whole tower; ``scope`` e.g.
    "Mixed_5b".  Weight naming mirrors models/inception_v3.py (incl. the
    Mixed_5c scope quirk).
    """
    B, H, W, cin = x.shape

    def g(name):
        w, b = folded[f"{scope}/{name}"]
        return _taps(w), b

    b1a = ("Branch_1/Conv2d_0b_1x1", "Branch_1/Conv_1_0c_5x5") if quirky_5c \
        else ("Branch_1/Conv2d_0a_1x1", "Branch_1/Conv2d_0b_5x5")
    names = ["Branch_0/Conv2d_0a_1x1", b1a[0], b1a[1],
             "Branch_2/Conv2d_0a_1x1", "Branch_2/Conv2d_0b_3x3",
             "Branch_2/Conv2d_0c_3x3", "Branch_3/Conv2d_0b_1x1"]
    packed: List[np.ndarray] = []
    for n in names:
        w, b = g(n)
        packed.extend([w, b])
    cout = sum(folded[f"{scope}/{n}"][0].shape[-1]
               for n in [names[0], names[2], names[5], names[6]])

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    HWp = _round_up(H * W, sub)

    def branches(xp, refs):
        conv = functools.partial(_conv_same, H=H, W=W, HWp=HWp, dtype=xp.dtype)
        r = lambda i: (refs[2 * i], refs[2 * i + 1])
        b0 = conv(xp, *r(0), kh=1, kw=1)
        b1 = conv(xp, *r(1), kh=1, kw=1)
        b1 = conv(b1, *r(2), kh=5, kw=5)
        b2 = conv(xp, *r(3), kh=1, kw=1)
        b2 = conv(b2, *r(4), kh=3, kw=3)
        b2 = conv(b2, *r(5), kh=3, kw=3)
        b3 = _avg_pool3(xp, H, W, HWp)
        b3 = conv(b3, *r(6), kh=1, kw=1)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    return _run_plane_block(x, H, W, packed, branches, cout,
                            interpret=interpret,
                            images_per_block=images_per_block)


# ---------------------------------------------------------------------------
# Inception-B (Mixed_6b..6e): 17x17 stage, factorized 7x7
# ---------------------------------------------------------------------------

def fused_inception_b(x: jax.Array, folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
                      scope: str, interpret: bool = False,
                      images_per_block: int = 1) -> jax.Array:
    B, H, W, cin = x.shape

    names_and_kernels = [
        ("Branch_0/Conv2d_0a_1x1", (1, 1)),
        ("Branch_1/Conv2d_0a_1x1", (1, 1)),
        ("Branch_1/Conv2d_0b_1x7", (1, 7)),
        ("Branch_1/Conv2d_0c_7x1", (7, 1)),
        ("Branch_2/Conv2d_0a_1x1", (1, 1)),
        ("Branch_2/Conv2d_0b_7x1", (7, 1)),
        ("Branch_2/Conv2d_0c_1x7", (1, 7)),
        ("Branch_2/Conv2d_0d_7x1", (7, 1)),
        ("Branch_2/Conv2d_0e_1x7", (1, 7)),
        ("Branch_3/Conv2d_0b_1x1", (1, 1)),
    ]
    packed: List[np.ndarray] = []
    for n, _ in names_and_kernels:
        w, b = folded[f"{scope}/{n}"]
        packed.extend([_taps(w), b])
    cout = sum(folded[f"{scope}/{n}"][0].shape[-1]
               for n in ["Branch_0/Conv2d_0a_1x1", "Branch_1/Conv2d_0c_7x1",
                         "Branch_2/Conv2d_0e_1x7", "Branch_3/Conv2d_0b_1x1"])

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    HWp = _round_up(H * W, sub)

    def branches(xp, refs):
        conv = functools.partial(_conv_same, H=H, W=W, HWp=HWp, dtype=xp.dtype)
        r = lambda i: (refs[2 * i], refs[2 * i + 1])
        ks = [k for _, k in names_and_kernels]
        b0 = conv(xp, *r(0), kh=ks[0][0], kw=ks[0][1])
        b1 = conv(xp, *r(1), kh=ks[1][0], kw=ks[1][1])
        b1 = conv(b1, *r(2), kh=ks[2][0], kw=ks[2][1])
        b1 = conv(b1, *r(3), kh=ks[3][0], kw=ks[3][1])
        b2 = conv(xp, *r(4), kh=ks[4][0], kw=ks[4][1])
        b2 = conv(b2, *r(5), kh=ks[5][0], kw=ks[5][1])
        b2 = conv(b2, *r(6), kh=ks[6][0], kw=ks[6][1])
        b2 = conv(b2, *r(7), kh=ks[7][0], kw=ks[7][1])
        b2 = conv(b2, *r(8), kh=ks[8][0], kw=ks[8][1])
        b3 = _avg_pool3(xp, H, W, HWp)
        b3 = conv(b3, *r(9), kh=ks[9][0], kw=ks[9][1])
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    return _run_plane_block(x, H, W, packed, branches, cout,
                            interpret=interpret,
                            images_per_block=images_per_block)
