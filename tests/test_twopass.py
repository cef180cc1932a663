"""Two-pass parallel decode of restart-free Huffman scans.

Real-world JPEGs overwhelmingly carry no restart markers, so the codec's
restart-segmented parallelism (decoder.inc run_segmented) cannot apply; the
two-pass index/decode pipeline (decoder.inc decode_huff_twopass) parallelizes
those scans instead.  These tests pin down bit-exactness of the parallel
path against the serial decoder across scan shapes, and sane behavior on
truncated streams.  Reference behavior replaced: libjpeg's inherently serial
bitstream walk (/root/reference/src/image.c:94).
"""

import io

import numpy as np
import pytest

from libmodjpeg_tpu import codec

from util import encode_pil


def _noisy_pixels(rng, w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = 128 + 90 * np.sin(xx / 29.0) * np.cos(yy / 41.0)
    noise = rng.normal(0, 18, (h, w, 3))
    return np.clip(smooth[..., None] + noise, 0, 255).astype(np.uint8)


def _assert_same(data):
    a = codec.decode(data, nthreads=1)
    b = codec.decode(data, nthreads=4)
    for c1, c4 in zip(a.coefs, b.coefs):
        np.testing.assert_array_equal(c1, c4)


@pytest.mark.parametrize("prog", [False, True], ids=["seq", "prog"])
@pytest.mark.parametrize("mode,sub", [("RGB", "420"), ("RGB", "444"),
                                      ("L", None)])
def test_twopass_matches_serial(prog, mode, sub):
    # 1280x720 4:2:0 noisy q85 is ~330 KB of entropy data — above both the
    # MCU-count and scan-byte gates, so the two-pass path really engages
    rng = np.random.default_rng(11)
    pix = _noisy_pixels(rng, 1280, 720)
    data = encode_pil(pix, mode=mode, quality=85, subsampling=sub,
                      progressive=prog)
    _assert_same(data)


def test_twopass_sparse_stream():
    # mixed content: smooth regions (short blocks, heavy EOB traffic) plus a
    # noisy band so the scan still clears the 256 KB size gate
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:1080:1, 0:1920:1]
    pix = np.clip(128 + 60 * np.sin(xx / 200.0) * np.cos(yy / 150.0), 0,
                  255).astype(np.uint8)
    pix = np.stack([pix] * 3, axis=-1)
    pix[400:700] = _noisy_pixels(rng, 1920, 300)
    data = encode_pil(pix, quality=85, subsampling="420")
    _assert_same(data)


def test_twopass_truncated_stream():
    # Truncation mid-scan: BitReader zero-feeds past the end; serial and
    # parallel paths must agree (both produce the same coefficients or the
    # same error class) and never crash.
    rng = np.random.default_rng(5)
    pix = _noisy_pixels(rng, 1280, 720)
    data = encode_pil(pix, quality=85, subsampling="420")
    cut = data[: len(data) * 2 // 3]
    try:
        a = codec.decode(cut, nthreads=1)
    except Exception as e1:
        with pytest.raises(type(e1)):
            codec.decode(cut, nthreads=4)
        return
    b = codec.decode(cut, nthreads=4)
    for c1, c4 in zip(a.coefs, b.coefs):
        np.testing.assert_array_equal(c1, c4)


def test_twopass_12bit_extended():
    # 12-bit extended sequential uses DC sizes up to 16 / AC magnitudes to
    # 14 — exercises wide value fields in the skip tables.  Build via the
    # codec's own 12-bit encoder.
    from libmodjpeg_tpu.encode_pixels import from_pixels

    rng = np.random.default_rng(9)
    pix = _noisy_pixels(rng, 1280, 720)
    img = from_pixels(pix, quality=90, subsampling="420")
    for c in range(len(img.coefs)):
        img.coefs[c] = (img.coefs[c].astype(np.int32) * 3).clip(
            -2047, 2047).astype(np.int16)
    img.precision = 12
    data = codec.encode(img)
    _assert_same(data)


def test_twopass_fuzz_shapes():
    # Randomized sweep over quality (shifts the code-length distribution
    # between the fused fast path and the generic long-code path), optimized
    # tables (skewed lengths), subsampling, and odd dimensions.  Each config
    # must be bit-identical between the serial and two-pass decoders.
    from libmodjpeg_tpu.encode_pixels import from_pixels

    rng = np.random.default_rng(77)
    configs = [
        dict(quality=30, subsampling="420"),
        dict(quality=55, subsampling="422"),
        dict(quality=75, subsampling="444"),
        dict(quality=92, subsampling="420"),
        dict(quality=97, subsampling="444"),
    ]
    for i, cfg in enumerate(configs):
        w = 1184 + 16 * i + 3   # odd sizes: partial right/bottom MCUs
        h = 688 + 8 * i + 5
        pix = _noisy_pixels(rng, w, h)
        img = from_pixels(pix, **cfg)
        from libmodjpeg_tpu import constants as C
        for options in (0, C.OPTION_OPTIMIZE):
            data = codec.encode(img, options=options)
            if len(data) < (256 << 10):  # stay above the two-pass gate
                continue
            _assert_same(data)
