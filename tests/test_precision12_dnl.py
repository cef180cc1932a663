"""12-bit sample precision and DNL-deferred-height support.

Capability extensions beyond the reference (SURVEY.md quirks registry /
STATUS.md round-2 candidates): the reference's libjpeg build is 8-bit-only
and rejects DNL frames; here 12-bit frames (SOF1/SOF2/SOF9/SOF10) decode,
encode, compose and convert to/from pixels, and a zero-height SOF is
resolved from the DNL marker after the first scan (T.81 B.2.5).
"""

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec
from libmodjpeg_tpu.encode_pixels import from_pixels
from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling
from libmodjpeg_tpu.pixels import to_pixels

from util import make_gradient_pixels


def _coef_image_12(rng, w=80, h=64):
    comps, coefs = [], []
    for c, (hs, vs) in enumerate([(2, 2), (1, 1), (1, 1)]):
        pw, ph = (w // 16) * hs, (h // 16) * vs
        comps.append(ComponentInfo(
            component_id=c + 1, h_samp=hs, v_samp=vs,
            quant_tbl_no=0 if c == 0 else 1,
            width_in_blocks=pw, height_in_blocks=ph,
            padded_width_in_blocks=pw, padded_height_in_blocks=ph))
        a = rng.randint(-16000, 16000, (ph, pw, 8, 8)).astype(np.int16)
        a = (a * (rng.rand(ph, pw, 8, 8) < 0.2)).astype(np.int16)
        coefs.append(a)
    qt = {0: np.ones((8, 8), np.uint16) * 16,
          1: np.full((8, 8), 32, np.uint16)}
    return CoefImage(width=w, height=h, jpeg_color_space=3, components=comps,
                     coefs=coefs, quant_tables=qt, sampling=Sampling(2, 2),
                     precision=12)


@pytest.mark.parametrize("options", [0, 1, 2, 4, 6],
                         ids=["plain", "optimize", "progressive",
                              "arith", "arith-prog"])
def test_12bit_roundtrip(options):
    rng = np.random.RandomState(7)
    img = _coef_image_12(rng)
    data = codec.encode(img, options=options)
    back = codec.decode(data)
    assert back.precision == 12
    # 12-bit sequential Huffman must be extended sequential (SOF1), and the
    # file must never claim baseline (SOF0 is 8-bit only)
    assert b"\xff\xc0" not in data.split(b"\xff\xda")[0] or options >= 4
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_12bit_restart_segments():
    rng = np.random.RandomState(8)
    img = _coef_image_12(rng)
    data = codec.encode(img, options=1, restart_interval=2)
    back = codec.decode(data)
    assert back.precision == 12 and back.restart_interval == 2
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_12bit_pixels_roundtrip():
    rng = np.random.RandomState(9)
    pix8 = make_gradient_pixels(rng, 64, 48)
    pix12 = (pix8.astype(np.uint16) << 4)
    img = from_pixels(pix12, quality=95, subsampling="444", precision=12)
    assert img.precision == 12
    data = codec.encode(img, options=1)
    back = codec.decode(data)
    out = to_pixels(back)
    assert out.dtype == np.uint16
    # 12-bit pipeline at q95 should reconstruct within a few 12-bit steps
    err = np.abs(out.astype(np.int32) - pix12.astype(np.int32))
    assert err.mean() < 40.0 and err.max() < 600


def test_12bit_compose_untouched_bitexact_and_footprint():
    rng = np.random.RandomState(10)
    pix8 = make_gradient_pixels(rng, 128, 96)
    img12 = from_pixels((pix8.astype(np.uint16) << 4), quality=90,
                        subsampling="420", precision=12)
    img8 = from_pixels(pix8, quality=90, subsampling="420")

    logo = rng.randint(0, 255, (24, 40, 4), dtype=np.uint8)
    logo[..., 3] = 200
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 40, 24)

    out12 = mj.compose(img12, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 16, 16)
    out8 = mj.compose(img8, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 16, 16)

    # untouched MCUs bit-exact (the headline guarantee, README.md:69-81)
    for c in range(3):
        f = 2 if c == 0 else 1
        y0, y1 = (16 // 16) * f, -(-(16 + 24) // 16) * f
        x0, x1 = (16 // 16) * f, -(-(16 + 40) // 16) * f
        mask = np.ones(out12.coefs[c].shape[:2], bool)
        mask[y0:y1, x0:x1] = False
        np.testing.assert_array_equal(out12.coefs[c][mask],
                                      img12.coefs[c][mask])

    # footprint: the 12-bit composite, scaled down, must match the 8-bit
    # composite closely (identical blend math at 16x the sample scale)
    p12 = to_pixels(out12).astype(np.float64) / 16.0
    p8 = to_pixels(out8).astype(np.float64)
    fp12 = p12[16:40, 16:56]
    fp8 = p8[16:40, 16:56]
    rmse = np.sqrt(np.mean((fp12 - fp8) ** 2))
    assert rmse < 3.0, rmse


def test_12bit_effects_clamp():
    rng = np.random.RandomState(11)
    img = _coef_image_12(rng)
    out = mj.effect_luminance(img, 3000)
    # 8-bit clamp (2047) would crush every DC toward the cap; 12-bit range
    # must allow DC magnitudes well beyond 2047 after the +3000 shift
    dc = out.coefs[0][:, :, 0, 0].astype(np.int32) * 16
    assert dc.max() > 2047
    # and tint/luminance still roundtrip through the codec
    back = codec.decode(codec.encode(out, options=1))
    np.testing.assert_array_equal(back.coefs[0], out.coefs[0])


def _patch_dnl(data: bytes, height: int) -> bytes:
    buf = bytearray(data)
    for sof in (b"\xff\xc0", b"\xff\xc1", b"\xff\xc2"):
        i = buf.find(sof)
        if i >= 0:
            break
    assert i >= 0
    hoff = i + 5
    buf[hoff:hoff + 2] = (0).to_bytes(2, "big")
    assert bytes(buf[-2:]) == b"\xff\xd9"
    dnl = b"\xff\xdc\x00\x04" + int(height).to_bytes(2, "big")
    return bytes(buf[:-2]) + dnl + b"\xff\xd9"


def test_dnl_deferred_height():
    rng = np.random.RandomState(12)
    pix = make_gradient_pixels(rng, 64, 48)
    img = from_pixels(pix, quality=85, subsampling="420")
    data = codec.encode(img)
    back = codec.decode(_patch_dnl(data, 48))
    assert back.height == 48
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_dnl_missing_raises():
    rng = np.random.RandomState(13)
    pix = make_gradient_pixels(rng, 32, 32)
    data = bytearray(codec.encode(from_pixels(pix, subsampling="444")))
    i = data.find(b"\xff\xc0")
    data[i + 5:i + 7] = (0).to_bytes(2, "big")
    with pytest.raises(Exception, match="DNL"):
        codec.decode(bytes(data))


def test_dnl_respects_max_pixel():
    rng = np.random.RandomState(14)
    pix = make_gradient_pixels(rng, 64, 48)
    data = _patch_dnl(codec.encode(from_pixels(pix, subsampling="420")), 48)
    with pytest.raises(Exception, match="max_pixel"):
        codec.decode(data, max_pixel=100)


def test_dnl_files_do_not_share_watermark_cache_key():
    """Round-5 regression (caught in review): watermark()'s header-only
    geometry probe must NOT key DNL streams by their SOF height (always
    0) — two same-skeleton DNL files of different real heights would
    collide in the composer cache and composite at the wrong rows."""
    import libmodjpeg_tpu as mj

    rng = np.random.RandomState(31)
    datas = []
    for h in (48, 480):
        pix = make_gradient_pixels(rng, 64, h)
        datas.append(_patch_dnl(codec.encode(from_pixels(
            pix, quality=85, subsampling="420")), h))
    logo = np.full((16, 32, 4), 200, np.uint8)
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 32, 16)
    mj._WATERMARK_CACHE.clear()
    # warm the cache with the SHORT file, then watermark the TALL one:
    # its logo must land at ITS bottom, not the short file's
    out_short = mj.watermark(datas[0], d, mj.ALIGN_BOTTOM)
    out_tall = mj.watermark(datas[1], d, mj.ALIGN_BOTTOM)
    mj._WATERMARK_CACHE.clear()
    out_tall_fresh = mj.watermark(datas[1], d, mj.ALIGN_BOTTOM)
    assert out_tall == out_tall_fresh
    a = codec.decode(out_tall)
    b = codec.decode(datas[1])
    diff_rows = np.nonzero((a.coefs[0] != b.coefs[0]).any(axis=(1, 2, 3)))[0]
    assert diff_rows.size and diff_rows.min() >= (480 - 16) // 8 - 2, \
        diff_rows
    assert len(out_short) > 0
    mj._WATERMARK_CACHE.clear()
