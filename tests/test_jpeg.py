"""C++ JPEG decoder tests: TF-oracle bit-compat, batching, error paths."""

import io

import numpy as np
import pytest

from tumblr_emotions_tpu.data import jpeg as tj

pytestmark = pytest.mark.skipif(not tj.available(),
                                reason="C++ decoder not built")


def _jpeg_bytes(seed=0, hw=(240, 320), quality=90):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (np.cumsum(np.cumsum(rng.rand(*hw, 3), 0), 1) * 7 % 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_size():
    data = _jpeg_bytes(hw=(123, 77))
    assert tj.decode_size(data) == (123, 77, 3)


def test_decode_matches_pil():
    data = _jpeg_bytes()
    np.testing.assert_array_equal(tj.decode(data), tj._decode_pil(data))


def test_decode_matches_tf_oracle():
    """Bit-compat with tf.io.decode_jpeg (the op the reference's input
    pipeline calls — SURVEY.md §2b decode-parity requirement)."""
    tf = pytest.importorskip("tensorflow")
    for seed, quality in [(0, 95), (1, 80), (2, 60)]:
        data = _jpeg_bytes(seed=seed, quality=quality)
        theirs = tf.io.decode_jpeg(data, channels=3,
                                   dct_method="INTEGER_ACCURATE").numpy()
        ours = tj.decode(data, dct_method="islow", fancy=True)
        np.testing.assert_array_equal(ours, theirs)


def test_batch_decode_parallel_deterministic():
    datas = [_jpeg_bytes(seed=s, hw=(64 + s, 80 + 2 * s)) for s in range(16)]
    singles = [tj.decode(d) for d in datas]
    for threads in (1, 4, 8):
        outs = tj.decode_batch(datas, num_threads=threads)
        for a, b in zip(outs, singles):
            np.testing.assert_array_equal(a, b)


def test_dct_scaling():
    data = _jpeg_bytes(hw=(200, 120))
    half = tj.decode(data, scale_num=4)
    assert half.shape == (100, 60, 3)


def test_corrupt_jpeg_raises_not_crashes():
    with pytest.raises(ValueError):
        tj.decode(b"\xff\xd8garbage")
    datas = [_jpeg_bytes(), b"\xff\xd8broken", _jpeg_bytes(seed=1)]
    with pytest.raises(ValueError, match="1 images"):
        tj.decode_batch(datas)


def test_grayscale_converted_to_rgb():
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 255,
                    mode="L").save(buf, "JPEG")
    out = tj.decode(buf.getvalue())
    assert out.shape == (64, 64, 3)
    # RGB channels equal for grayscale input
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
