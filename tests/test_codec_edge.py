"""Codec edge cases: exotic tables, colorspace guards, big values."""

import io

import numpy as np
import pytest
from PIL import Image

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from libmodjpeg_tpu.errors import UnsupportedColorspaceError
from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling

from conftest import FIXTURE_IMAGES as IMAGES


def synthetic_image(qdc=400, w=64, h=48):
    """Build a CoefImage with a 16-bit quant table (values > 255)."""
    comps, coefs = [], []
    # 64x48 with 4:2:0 -> 4x3 MCUs; padded comp grid is (4*sh) x (3*sv)
    for c, (sh, sv) in enumerate([(2, 2), (1, 1), (1, 1)]):
        pw, ph = 4 * sh, 3 * sv
        rng = np.random.RandomState(c)
        a = (rng.randn(ph, pw, 8, 8) * 3).astype(np.int16)
        comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                   pw, ph, pw, ph))
        coefs.append(a)
    qt0 = np.full((8, 8), 3, np.uint16)
    qt0[0, 0] = qdc  # forces 16-bit DQT when > 255
    return CoefImage(width=w, height=h, jpeg_color_space=C.JCS_YCbCr,
                     components=comps, coefs=coefs,
                     quant_tables={0: qt0, 1: np.full((8, 8), 7, np.uint16)},
                     sampling=Sampling(2, 2))


def test_16bit_quant_table_roundtrip(ref_tools, tmp_path):
    _, dump = ref_tools
    img = synthetic_image(qdc=1000)
    data = encode(img)
    back = decode(data)
    np.testing.assert_array_equal(back.quant_tables[0], img.quant_tables[0])
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])
    # libjpeg agrees (16-bit DQT interop)
    p = tmp_path / "q16.jpg"
    p.write_bytes(data)
    from util import assert_matches_libjpeg
    assert_matches_libjpeg(back, dump, str(p))


def test_cmyk_rejected_like_reference(tmp_path):
    """4-component JPEGs must be rejected by read_jpeg (image.c:84-92) even
    though the raw codec can decode them."""
    buf = io.BytesIO()
    Image.new("CMYK", (32, 32), (10, 200, 30, 40)).save(buf, format="JPEG")
    img = decode(buf.getvalue())  # codec itself handles 4 comps
    assert img.num_components == 4
    with pytest.raises(UnsupportedColorspaceError):
        mj.read_jpeg(buf.getvalue())


def test_extreme_coefficients_roundtrip():
    """Maximum legal magnitudes (8-bit precision: DC in [-1024,1023] so the
    diff stays within 11 bits; AC within 10 bits) in all entropy modes."""
    img = synthetic_image()
    img.coefs[0][0, 0, 0, 0] = 1023
    img.coefs[0][0, 1, 0, 0] = -1024
    img.coefs[0][1, 0, 7, 7] = 1023
    img.coefs[0][1, 1, 7, 7] = -1023
    for opt in (0, C.OPTION_OPTIMIZE, C.OPTION_PROGRESSIVE,
                C.OPTION_ARITHMETRIC,
                C.OPTION_PROGRESSIVE | C.OPTION_ARITHMETRIC):
        back = decode(encode(img, options=opt))
        for c in range(3):
            np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_out_of_range_dc_raises():
    """A DC diff needing >11 bits must raise EncodeError (matching libjpeg's
    'DC coefficient out of range'), not silently emit a corrupt stream."""
    from libmodjpeg_tpu.errors import EncodeError

    img = synthetic_image()
    img.coefs[0][0, 0, 0, 0] = 2047
    img.coefs[0][0, 1, 0, 0] = -2047
    with pytest.raises(EncodeError):
        encode(img)


def test_exif_and_com_survive_cli(tmp_path):
    """EXIF APP1 + COM markers survive the full CLI pipeline
    (image.c:66-72,196-200 semantics)."""
    from libmodjpeg_tpu.cli import main as cli_main

    src = mj.read_jpeg(f"{IMAGES}/image.jpg")
    exif = (0xFFE1, b"Exif\x00\x00" + bytes(64))
    com = (0xFFFE, b"hello metadata")
    src.markers = [src.markers[0], exif, com]
    inp = tmp_path / "in.jpg"
    mj.write_jpeg(src, str(inp))
    out = tmp_path / "out.jpg"
    assert cli_main(["-i", str(inp), "-p", "br",
                     "-d", f"{IMAGES}/dropon.png", "-x",
                     "-o", str(out)]) == 0
    res = decode(out.read_bytes())
    assert exif in res.markers and com in res.markers


def test_sampling_211_and_4x1(ref_tools, tmp_path):
    """Unusual sampling factor combinations decode/encode correctly."""
    _, dump = ref_tools
    from util import assert_matches_libjpeg

    comps, coefs = [], []
    for c, (sh, sv) in enumerate([(4, 1), (1, 1), (2, 1)]):
        pw, ph = 4 * sh, 3  # mcus 4x3
        rng = np.random.RandomState(c)
        a = (rng.randn(ph, pw, 8, 8) * 2).astype(np.int16)
        comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                   pw, ph, pw, ph))
        coefs.append(a)
    img = CoefImage(width=4 * 8 * 4 - 5, height=3 * 8 - 2,
                    jpeg_color_space=C.JCS_YCbCr, components=comps,
                    coefs=coefs,
                    quant_tables={0: np.full((8, 8), 4, np.uint16),
                                  1: np.full((8, 8), 9, np.uint16)},
                    sampling=Sampling(4, 1))
    for opt in (0, C.OPTION_PROGRESSIVE, C.OPTION_ARITHMETRIC):
        data = encode(img, options=opt)
        back = decode(data)
        for c in range(3):
            np.testing.assert_array_equal(back.coefs[c], img.coefs[c])
    p = tmp_path / "s41.jpg"
    p.write_bytes(encode(img))
    assert_matches_libjpeg(decode(p.read_bytes()), dump, str(p))


def test_progressive_with_many_restart_segments():
    img = synthetic_image()
    data = encode(img, options=C.OPTION_PROGRESSIVE, restart_interval=1)
    back = decode(data)
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_ram_bound_graceful_error(monkeypatch):
    """A frame whose dense coefficient planes exceed available host RAM
    must fail with ImageSizeError + guidance, not the OOM killer
    (docs/SCALING.md host-RAM bound; libjpeg's virtual-array spill is a
    documented non-goal)."""
    import libmodjpeg_tpu.codec as codec_mod
    from libmodjpeg_tpu.errors import ImageSizeError

    with open(f"{IMAGES}/image.jpg", "rb") as f:
        data = f.read()
    monkeypatch.setattr(codec_mod, "_available_ram_bytes", lambda: 1024)
    with pytest.raises(ImageSizeError, match="host RAM"):
        codec_mod.decode(data)
    monkeypatch.setattr(codec_mod, "_available_ram_bytes", lambda: None)
    img = codec_mod.decode(data)          # guard off (non-Linux): decodes
    assert img.width == 256
