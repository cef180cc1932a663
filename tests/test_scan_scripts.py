"""Custom scan scripts (cjpeg/mozjpeg -scans parity) + mozjpeg-envelope fuzz.

The reference documents interop with mozjpeg (README.md:166-175); mozjpeg's
signature bitstream feature is its progressive scan scripts, which differ
from libjpeg's jpeg_simple_progression (band split at 8/9, chroma full-band
without successive approximation, DC-split variants).  No mozjpeg binary is
available in this image, so the envelope is exercised by AUTHORING files
with mozjpeg-shaped scripts through our own encoder and oracling both
directions against libjpeg (dump_coefs): libjpeg must read our
script-authored files coefficient-for-coefficient, and our decoder must
read them identically to its own writer.
"""

import subprocess

import numpy as np
import pytest

from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from test_fuzz_roundtrip import random_image
from util import assert_matches_libjpeg, make_gradient_pixels

# mozjpeg jcparam.c standard progressive script shape for YCbCr
# (dc_scan_opt_mode=0: single DC scan, luma split at 1-8/9-63 with
# successive approximation, chroma full-band in one pass each):
MOZJPEG_YCC = [
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 8, 0, 2),
    ((1,), 1, 8, 0, 0),
    ((2,), 1, 8, 0, 0),
    ((0,), 9, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((1,), 9, 63, 0, 0),
    ((2,), 9, 63, 0, 0),
]

# mozjpeg's dc_scan_opt_mode=1 variant: luma DC separate from chroma DC
MOZJPEG_YCC_DCSPLIT = [
    ((0,), 0, 0, 0, 0),
    ((1, 2), 0, 0, 0, 0),
    ((0,), 1, 8, 0, 2),
    ((1,), 1, 8, 0, 0),
    ((2,), 1, 8, 0, 0),
    ((0,), 9, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((1,), 9, 63, 0, 0),
    ((2,), 9, 63, 0, 0),
]

# multi-scan SEQUENTIAL (full-band per-component scans -> SOF0, the other
# legal use of scan scripts)
SEQ_SPLIT = [
    ((0,), 0, 63, 0, 0),
    ((1, 2), 0, 63, 0, 0),
]

# a deep successive-approximation chain exercising Al 3->0
DEEP_SA = [
    ((0, 1, 2), 0, 0, 0, 3),
    ((0, 1, 2), 0, 0, 3, 2),
    ((0, 1, 2), 0, 0, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
]

SCRIPTS = {
    "mozjpeg": MOZJPEG_YCC,
    "mozjpeg_dcsplit": MOZJPEG_YCC_DCSPLIT,
    "seq_split": SEQ_SPLIT,
    "deep_sa": DEEP_SA,
}


@pytest.mark.parametrize("name", list(SCRIPTS))
def test_script_roundtrip_self(name):
    """encode(scan_script) -> our decode reproduces every coefficient."""
    rng = np.random.RandomState(hash(name) % 2 ** 31)
    img = random_image(rng, "420", 5, 4, 3, 5)
    data = encode(img, scan_script=SCRIPTS[name])
    out = decode(data)
    # SOF selection: partial bands/SA passes -> progressive
    expect_prog = any(s[1:] != (0, 63, 0, 0) for s in SCRIPTS[name])
    assert out.progressive == expect_prog, name
    for c in range(3):
        h, w = img.coefs[c].shape[:2]
        np.testing.assert_array_equal(out.coefs[c][:h, :w],
                                      img.coefs[c][:h, :w])


@pytest.mark.parametrize("name", list(SCRIPTS))
@pytest.mark.parametrize("arith", [0, C.OPTION_ARITHMETRIC],
                         ids=["huff", "arith"])
def test_script_restart_and_arith_roundtrip(name, arith):
    """Scripts compose with restart markers and arithmetic coding."""
    rng = np.random.RandomState((hash(name) + arith) % 2 ** 31)
    img = random_image(rng, "444", 4, 3)
    data = encode(img, options=arith, restart_interval=3,
                  scan_script=SCRIPTS[name])
    out = decode(data)
    for c in range(3):
        h, w = img.coefs[c].shape[:2]
        np.testing.assert_array_equal(out.coefs[c][:h, :w],
                                      img.coefs[c][:h, :w])


@pytest.mark.parametrize("name", list(SCRIPTS))
def test_script_files_read_by_libjpeg(name, ref_tools, tmp_path):
    """Direction A: libjpeg is the decode oracle for script-authored files."""
    _, dump = ref_tools
    rng = np.random.RandomState((hash(name) + 77) % 2 ** 31)
    for sampling, trim in (("420", 3), ("444", 0)):
        img = random_image(rng, sampling, 4, 4, trim, trim)
        data = encode(img, scan_script=SCRIPTS[name])
        p = tmp_path / f"{name}_{sampling}.jpg"
        p.write_bytes(data)
        out = subprocess.run([dump, str(p), str(p) + ".bin"],
                             capture_output=True)
        assert out.returncode == 0, (
            f"libjpeg rejected {name}/{sampling}: {out.stderr.decode()}")
        assert_matches_libjpeg(img, dump, str(p))


def test_mozjpeg_shaped_file_through_compose(ref_tools, tmp_path):
    """End-to-end mozjpeg envelope: a watermark composed onto a
    mozjpeg-script-authored progressive file round-trips with untouched
    blocks intact and libjpeg agreeing on the output."""
    import libmodjpeg_tpu as mj
    from libmodjpeg_tpu.encode_pixels import from_pixels

    _, dump = ref_tools
    rng = np.random.RandomState(4242)
    pix = make_gradient_pixels(rng, 320, 240)
    src = encode(from_pixels(pix, quality=88, subsampling="420"),
                 scan_script=MOZJPEG_YCC)
    img = mj.read_jpeg(src)
    before = [a.copy() for a in img.coefs]
    logo = np.zeros((40, 64, 4), np.uint8)
    logo[..., :3] = rng.randint(0, 255, (40, 64, 3))
    logo[8:32, 8:56, 3] = 255
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 64, 40)
    out = mj.compose(img, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 16, 16)
    result = mj.write_jpeg(out, options=mj.OPTION_PROGRESSIVE)
    p = tmp_path / "mozenv.jpg"
    p.write_bytes(result)
    back = decode(result)
    assert_matches_libjpeg(back, dump, str(p))
    # untouched block far from the overlay is bit-exact
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c][-1, -1],
                                      before[c][-1, -1])


@pytest.mark.parametrize("bad,msg", [
    ([((0, 1, 2), 1, 5, 0, 0)], "one component"),     # interleaved AC
    ([((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0),
      ((0,), 1, 5, 0, 0)], "first-coded twice"),      # double first-code
    ([((0,), 1, 63, 0, 0)], "before DC"),             # AC before DC
    ([((0, 1, 2), 0, 0, 0, 1),
      ((0, 1, 2), 0, 0, 1, 1)], "lower Al"),          # Al != Ah-1
    ([((2, 1), 0, 63, 0, 0), ((0,), 0, 63, 0, 0)], "frame order"),
    ([((0,), 0, 63, 0, 0)], "uncoded"),               # missing comps (seq)
    ([((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 2, 1)], "chain"),
])
def test_script_validation_rejects(bad, msg):
    rng = np.random.RandomState(1)
    img = random_image(rng, "420", 2, 2)
    with pytest.raises(Exception) as ei:
        encode(img, scan_script=bad)
    assert msg in str(ei.value), str(ei.value)
