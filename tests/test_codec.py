"""Native entropy codec tests: roundtrips + bit-level interop with libjpeg.

Codec capability parity target: image.c/jpeg.c of the reference delegate all
entropy work to libjpeg (image.c:94,191-194); our from-scratch codec must
agree with libjpeg coefficient-for-coefficient in both directions, across
baseline/progressive/optimized/arithmetic modes and restart markers.
"""

import io
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode

from util import assert_matches_libjpeg
from conftest import FIXTURE_IMAGES as IMAGES

MODES = {
    "baseline": (0, None),
    "optimize": (C.OPTION_OPTIMIZE, None),
    "progressive": (C.OPTION_PROGRESSIVE, None),
    "prog+opt": (C.OPTION_PROGRESSIVE | C.OPTION_OPTIMIZE, None),
    "arith": (C.OPTION_ARITHMETRIC, None),
    "arith+prog": (C.OPTION_ARITHMETRIC | C.OPTION_PROGRESSIVE, None),
    "baseline_rst4": (0, 4),
    "optimize_rst5": (C.OPTION_OPTIMIZE, 5),
    "progressive_rst4": (C.OPTION_PROGRESSIVE, 4),
    "arith_rst7": (C.OPTION_ARITHMETRIC, 7),
    "arith+prog_rst3": (C.OPTION_ARITHMETRIC | C.OPTION_PROGRESSIVE, 3),
}


def test_decode_fixture_metadata(fixture_jpeg):
    img = decode(fixture_jpeg)
    assert (img.width, img.height) == (256, 256)
    assert img.jpeg_color_space == C.JCS_YCbCr
    assert not img.progressive
    assert [(-(-c.h_samp // 1), c.v_samp) for c in img.components] == [
        (2, 2), (1, 1), (1, 1)]  # 4:2:0
    assert img.markers and img.markers[0][0] == 0xFFE0  # JFIF APP0 preserved


def test_decode_matches_libjpeg(fixture_jpeg, ref_tools):
    _, dump = ref_tools
    img = decode(fixture_jpeg)
    assert_matches_libjpeg(img, dump, f"{IMAGES}/image.jpg")


@pytest.mark.parametrize("mode", list(MODES))
def test_roundtrip(fixture_jpeg, mode):
    options, ri = MODES[mode]
    img = decode(fixture_jpeg)
    enc = encode(img, options=options, restart_interval=ri)
    img2 = decode(enc)
    for c in range(img.num_components):
        np.testing.assert_array_equal(img.coefs[c], img2.coefs[c])
    for t in img.quant_tables:
        np.testing.assert_array_equal(img.quant_tables[t], img2.quant_tables[t])


@pytest.mark.parametrize("mode", list(MODES))
def test_encode_interop_libjpeg(fixture_jpeg, ref_tools, mode, tmp_path):
    """Our encodes must decode identically under libjpeg (the oracle)."""
    options, ri = MODES[mode]
    _, dump = ref_tools
    img = decode(fixture_jpeg)
    enc = encode(img, options=options, restart_interval=ri)
    p = tmp_path / "ours.jpg"
    p.write_bytes(enc)
    img_check = decode(enc)
    assert_matches_libjpeg(img_check, dump, str(p))
    # and the coefficients are the original ones
    for c in range(img.num_components):
        np.testing.assert_array_equal(img.coefs[c], img_check.coefs[c])


@pytest.mark.parametrize(
    "flags", [[], ["-O"], ["-P"], ["-A"], ["-P", "-A"], ["-O", "-P"]]
)
def test_decode_interop_libjpeg_outputs(fixture_jpeg, ref_tools, flags, tmp_path):
    """Files written by libjpeg (via the reference CLI) decode bit-exactly."""
    modjpeg, dump = ref_tools
    out = tmp_path / "ref.jpg"
    subprocess.run(
        [modjpeg, "-i", f"{IMAGES}/image.jpg"]
        + flags + ["-o", str(out)],
        check=True, capture_output=True)
    img = decode(out.read_bytes())
    assert_matches_libjpeg(img, dump, str(out))


def test_grayscale_modes(fixture_jpeg):
    buf = io.BytesIO()
    Image.open(io.BytesIO(fixture_jpeg)).convert("L").save(
        buf, format="JPEG", quality=85)
    g = decode(buf.getvalue())
    assert g.num_components == 1
    assert g.jpeg_color_space == C.JCS_GRAYSCALE
    for options in (0, C.OPTION_OPTIMIZE, C.OPTION_PROGRESSIVE,
                    C.OPTION_ARITHMETRIC,
                    C.OPTION_ARITHMETRIC | C.OPTION_PROGRESSIVE):
        enc = encode(g, options=options)
        g2 = decode(enc)
        np.testing.assert_array_equal(g.coefs[0], g2.coefs[0])


def test_pil_progressive_decodes(fixture_jpeg, ref_tools, tmp_path):
    _, dump = ref_tools
    buf = io.BytesIO()
    Image.open(io.BytesIO(fixture_jpeg)).save(
        buf, format="JPEG", progressive=True, quality=92)
    p = tmp_path / "prog.jpg"
    p.write_bytes(buf.getvalue())
    img = decode(buf.getvalue())
    assert img.progressive
    assert_matches_libjpeg(img, dump, str(p))


def test_422_and_444_sampling(fixture_jpeg, ref_tools, tmp_path):
    _, dump = ref_tools
    src = Image.open(io.BytesIO(fixture_jpeg))
    for subsampling, name in ((0, "444"), (1, "422")):
        buf = io.BytesIO()
        src.save(buf, format="JPEG", quality=90, subsampling=subsampling)
        p = tmp_path / f"s{name}.jpg"
        p.write_bytes(buf.getvalue())
        img = decode(buf.getvalue())
        assert_matches_libjpeg(img, dump, str(p))
        enc = encode(img, options=C.OPTION_OPTIMIZE)
        img2 = decode(enc)
        for c in range(3):
            np.testing.assert_array_equal(img.coefs[c], img2.coefs[c])


def test_odd_dimensions(ref_tools, tmp_path):
    """Non-MCU-multiple dims: edge blocks and padding must be handled."""
    _, dump = ref_tools
    rng = np.random.RandomState(0)
    for (w, h) in ((17, 31), (255, 129), (16, 8), (1, 1), (63, 65)):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        p = tmp_path / f"odd_{w}x{h}.jpg"
        p.write_bytes(buf.getvalue())
        img = decode(buf.getvalue())
        assert (img.width, img.height) == (w, h)
        assert_matches_libjpeg(img, dump, str(p))
        for options in (0, C.OPTION_PROGRESSIVE, C.OPTION_ARITHMETRIC):
            enc = encode(img, options=options)
            img2 = decode(enc)
            for c in range(img.num_components):
                np.testing.assert_array_equal(img.coefs[c], img2.coefs[c])


def test_marker_preservation(fixture_jpeg):
    img = decode(fixture_jpeg)
    com = (0xFFFE, b"libmodjpeg_tpu test comment")
    exif = (0xFFE1, b"Exif\x00\x00" + bytes(range(64)))
    img.markers = [img.markers[0], exif, com]
    enc = encode(img)
    img2 = decode(enc)
    assert img2.markers == img.markers


def test_restart_interval_preserved_by_default(fixture_jpeg):
    img = decode(fixture_jpeg)
    enc = encode(img, restart_interval=6)
    img2 = decode(enc)
    assert img2.restart_interval == 6
    enc2 = encode(img2)  # None = preserve
    assert decode(enc2).restart_interval == 6
    enc3 = encode(img2, restart_interval=0)  # 0 = strip
    assert decode(enc3).restart_interval == 0


def test_truncated_data_raises(fixture_jpeg):
    from libmodjpeg_tpu.errors import DecodeError
    with pytest.raises(DecodeError):
        decode(b"\xff\xd8\xff\xe0")
    with pytest.raises(DecodeError):
        decode(b"not a jpeg at all")
