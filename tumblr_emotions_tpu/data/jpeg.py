"""Python binding for the C++ batched JPEG decoder (ctypes over a C ABI).

SURVEY.md §2b: the reference's JPEG decode is TF's C++ kernel over libjpeg;
here it is our own libjpeg extension (jpeg_cpp/decoder.cc) driven from the
grain host pipeline.  The extension is built on demand with ``make`` (no
pybind11 in this environment); if the toolchain or libjpeg is unavailable a
PIL fallback keeps the pipeline functional (``backend="pil"``).

Decode knobs mirror TF's DecodeJpeg attributes: ``dct_method``
("islow"/"ifast"/"float") and fancy upsampling, so decode output can be
matched bit-for-bit against the TF oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_THIS_DIR, "jpeg_cpp")
_SO_PATH = os.path.join(_SRC_DIR, "libtejpeg.so")

_DCT = {"islow": 0, "ifast": 1, "float": 2}

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.tejpeg_decode_size.restype = ctypes.c_int
    lib.tejpeg_decode_size.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.tejpeg_decode.restype = ctypes.c_int
    lib.tejpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tejpeg_decode_batch.restype = ctypes.c_int
    lib.tejpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_ulong),
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_size(data: bytes) -> Tuple[int, int, int]:
    """(height, width, channels) from the JPEG header."""
    lib = _load()
    if lib is None:
        raise RuntimeError("C++ JPEG decoder unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.tejpeg_decode_size(data, len(data), ctypes.byref(h),
                              ctypes.byref(w), ctypes.byref(c)) != 0:
        raise ValueError("corrupt JPEG header")
    return h.value, w.value, c.value


def decode(data: bytes, dct_method: str = "islow", fancy: bool = True,
           scale_num: int = 8) -> np.ndarray:
    """Decode one JPEG to an RGB uint8 array [H, W, 3].

    ``scale_num``/8 applies libjpeg's cheap DCT-domain downscale (1..8).
    """
    lib = _load()
    if lib is None:
        return _decode_pil(data)
    h0, w0, _ = decode_size(data)
    oh_max = (h0 * scale_num + 7) // 8
    ow_max = (w0 * scale_num + 7) // 8
    out = np.empty((oh_max, ow_max, 3), np.uint8)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    rc = lib.tejpeg_decode(data, len(data),
                           out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
                           _DCT[dct_method], int(fancy), scale_num,
                           ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return np.ascontiguousarray(out[:oh.value, :ow.value])


def decode_batch(datas: Sequence[bytes], dct_method: str = "islow",
                 fancy: bool = True, scale_num: int = 8,
                 num_threads: int = 8) -> List[np.ndarray]:
    """Parallel decode of a batch of JPEGs -> list of [H, W, 3] uint8."""
    lib = _load()
    if lib is None:
        return [_decode_pil(d) for d in datas]
    n = len(datas)
    if n == 0:
        return []
    dims = []
    for d in datas:
        try:
            dims.append(decode_size(d))
        except ValueError:
            dims.append((1, 1, 3))  # batch decode will report the failure
    outs = []
    for (h0, w0, _) in dims:
        oh = (h0 * scale_num + 7) // 8
        ow = (w0 * scale_num + 7) // 8
        outs.append(np.empty((oh, ow, 3), np.uint8))

    arr_data = (ctypes.c_char_p * n)(*datas)
    arr_size = (ctypes.c_ulong * n)(*[len(d) for d in datas])
    arr_out = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
    arr_cap = (ctypes.c_long * n)(*[o.nbytes for o in outs])
    arr_h = (ctypes.c_int * n)()
    arr_w = (ctypes.c_int * n)()
    arr_rc = (ctypes.c_int * n)()
    failures = lib.tejpeg_decode_batch(
        arr_data, arr_size, n, arr_out, arr_cap, arr_h, arr_w,
        _DCT[dct_method], int(fancy), scale_num, num_threads, arr_rc)
    if failures:
        bad = [i for i in range(n) if arr_rc[i] != 0]
        raise ValueError(f"JPEG decode failed for {len(bad)} images "
                         f"(first index {bad[0]})")
    return [np.ascontiguousarray(o[:arr_h[i], :arr_w[i]])
            for i, o in enumerate(outs)]


def _decode_pil(data: bytes) -> np.ndarray:
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, np.uint8)
