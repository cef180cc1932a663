"""In-the-wild interop: bitstreams AUTHORED BY foreign encoders.

The reference documents a tested envelope across libjpeg v6b-v9c,
libjpeg-turbo and mozjpeg (/root/reference/README.md:166-175).  The
committed fixtures under tests/fixtures/interop/ were produced by two
genuinely foreign encoder builds on this image:

  - tools/make_interop_fixtures.c  -> the SYSTEM libjpeg-turbo 2.1.5
    (the library the reference itself links), covering baseline /
    optimized / progressive / restart-segmented / arithmetic /
    grayscale across 420/422/444, with EXIF-shaped APP1 + COM markers
  - tools/make_pil_interop_fixtures.py -> Pillow's BUNDLED
    libjpeg-turbo (a separate build), with ICC APP2, EXIF, and
    non-standard "web_high" quant tables

(mozjpeg ships no binary in this image; its scan-script shapes are
fuzzed separately in test_scan_scripts.py.)

For every fixture: our decode must equal the system-libjpeg oracle
coefficient-for-coefficient; a composed re-encode must keep untouched
blocks bit-exact under the oracle's eyes and preserve the markers.
"""

import glob
import os
import subprocess

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec

from conftest import FIXTURE_IMAGES
from util import load_dump

INTEROP = os.path.join(FIXTURE_IMAGES, "interop")
FIXTURES = sorted(glob.glob(os.path.join(INTEROP, "*.jpg")))


def _oracle_dump(ref_tools, path, tmp_path, tag):
    _, dump_coefs = ref_tools
    out = str(tmp_path / f"{tag}.bin")
    subprocess.run([dump_coefs, path, out], check=True, capture_output=True)
    return load_dump(out)


def test_fixture_set_present():
    """The committed corpus must cover the envelope's shapes."""
    names = [os.path.basename(f) for f in FIXTURES]
    assert len(names) >= 10, names
    assert any("progressive" in n for n in names)
    assert any("arith" in n for n in names)
    assert any("restart" in n for n in names)
    assert any("pil_" in n for n in names)
    assert any("gray" in n for n in names)


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(f) for f in FIXTURES])
def test_decode_matches_oracle(ref_tools, tmp_path, path):
    """Our from-scratch decoder must agree with the system libjpeg on
    every coefficient, quant table, and sampling factor of the
    foreign-authored file."""
    with open(path, "rb") as f:
        data = f.read()
    img = codec.decode(data)
    w, h, comps, quants, coefs = _oracle_dump(ref_tools, path, tmp_path, "in")
    assert (img.width, img.height) == (w, h)
    assert img.num_components == len(comps)
    for c in range(len(comps)):
        _, hs, vs, qno, wib, hib = comps[c]
        ci = img.components[c]
        assert (ci.h_samp, ci.v_samp) == (hs, vs)
        ours = img.coefs[c][:hib, :wib]
        np.testing.assert_array_equal(ours, coefs[c], err_msg=f"comp {c}")
        np.testing.assert_array_equal(
            img.quant_table_for(c).astype(np.int32), quants[qno])


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(f) for f in FIXTURES])
def test_compose_reencode_roundtrip(ref_tools, tmp_path, path):
    """watermark the foreign file, re-encode, and verify under the
    oracle: untouched blocks bit-exact, markers preserved."""
    with open(path, "rb") as f:
        data = f.read()
    base = mj.read_jpeg(path)
    logo = mj.read_dropon(os.path.join(FIXTURE_IMAGES, "dropon.png"))
    # functional style: compose RETURNS the composed image (the reference
    # mutates in place — documented deviation)
    composed = mj.compose(base, logo, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT,
                          -8, -8)
    out = str(tmp_path / "out.jpg")
    mj.write_jpeg(composed, out)

    _, _, comps_in, _, coefs_in = _oracle_dump(ref_tools, path, tmp_path,
                                               "oin")
    _, _, comps_out, _, coefs_out = _oracle_dump(ref_tools, out, tmp_path,
                                                 "oout")
    # untouched region: everything above/left of the bottom-right
    # footprint (logo 160x50 at offset -8,-8 from bottom-right)
    diff_any = 0
    for c in range(len(comps_in)):
        a, b = coefs_in[c], coefs_out[c]
        assert a.shape == b.shape
        hb = a.shape[0]
        top = hb - (50 // 8 + 3)  # footprint rows + alignment slack
        np.testing.assert_array_equal(a[:top], b[:top],
                                      err_msg=f"untouched rows comp {c}")
        diff_any += int((a != b).sum())
    assert diff_any > 0, "compose must actually change the footprint"

    # markers survive (EXIF APP1 / ICC APP2 / COM per fixture)
    img_in = codec.decode(data)
    img_out = codec.decode(open(out, "rb").read())
    assert img_in.markers == img_out.markers
