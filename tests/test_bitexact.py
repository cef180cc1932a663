"""Byte-parity mode: whole output files identical to the reference binary.

The default compose contract is untouched-bit-exact + footprint PSNR; the
bitexact mode (libmodjpeg_tpu/bitexact.py) reproduces the reference's exact
arithmetic — libjpeg Q100 dropon compilation, compose.c/convolve.c float
semantics, and libjpeg's duplicated-JFIF marker emission — so the whole
file matches byte for byte (SURVEY §7 "Bit-parity of touched blocks").
"""

import struct
import subprocess

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.bitexact import compile_dropon_bitexact, compose_bitexact
from libmodjpeg_tpu.dropon import read_dropon

from conftest import FIXTURE_IMAGES as IMAGES


def _load_compiled_dump(path):
    data = open(path, "rb").read()

    def side(off):
        n, = struct.unpack_from("<i", data, off)
        off += 4
        comps = []
        for _ in range(n):
            h, v, wib, hib = struct.unpack_from("<4i", data, off)
            off += 16
            a = np.frombuffer(data, "<f4", wib * hib * 64, off) \
                .reshape(hib, wib, 8, 8)
            off += wib * hib * 256
            comps.append(a.copy())
        return comps, off

    img, off = side(0)
    alpha, _ = side(off)
    return img, alpha


SAMP = {"420": (2, 2, [(2, 2), (1, 1), (1, 1)]),
        "422": (2, 1, [(2, 1), (1, 1), (1, 1)]),
        "444": (1, 1, [(1, 1), (1, 1), (1, 1)])}


@pytest.mark.parametrize("samp,boff", [("420", (3, 5)), ("420", (0, 0)),
                                       ("422", (7, 0)), ("444", (2, 6))])
def test_compile_matches_reference_library(samp, boff, ref_tools, tmp_path):
    """Our libjpeg-pipeline reimplementation == the reference's actual
    libjpeg Q100 re-encode, float for float (image AND alpha weights)."""
    dumper = ref_tools[1].replace("dump_coefs", "dump_dropon")
    d = read_dropon(f"{IMAGES}/dropon.png")
    out = tmp_path / "cd.bin"
    subprocess.run([dumper, f"{IMAGES}/dropon.png", samp, str(boff[0]),
                    str(boff[1]), "0", "0", str(d.width), str(d.height),
                    str(out)], check=True)
    rimg, ralpha = _load_compiled_dump(out)
    max_h, max_v, factors = SAMP[samp]
    ours_img, ours_alpha = compile_dropon_bitexact(
        d, C.JCS_YCbCr, max_h, max_v, factors, boff[0], boff[1],
        0, 0, d.width, d.height)
    for c in range(3):
        np.testing.assert_array_equal(ours_img[c], rimg[c],
                                      err_msg=f"image comp {c}")
        np.testing.assert_array_equal(ours_alpha[c], ralpha[c],
                                      err_msg=f"alpha comp {c}")


@pytest.mark.parametrize("pos", ["br", "tl", "cc", "cr", "bl"])
def test_whole_file_byte_identical_cli(pos, ref_tools, tmp_path):
    """modjpeg -p POS -d dropon.png == our CLI with -X, byte for byte."""
    modjpeg, _ = ref_tools
    ref_out = tmp_path / "ref.jpg"
    our_out = tmp_path / "ours.jpg"
    subprocess.run([modjpeg, "-i", f"{IMAGES}/image.jpg", "-p", pos,
                    "-d", f"{IMAGES}/dropon.png", "-o", str(ref_out)],
                   check=True)
    from libmodjpeg_tpu.cli import main
    rc = main(["-X", "-i", f"{IMAGES}/image.jpg", "-p", pos,
               "-d", f"{IMAGES}/dropon.png", "-o", str(our_out)])
    assert rc in (0, None)
    assert our_out.read_bytes() == ref_out.read_bytes()


def test_whole_file_byte_identical_offsets(ref_tools, tmp_path):
    """Arbitrary align+offset placements through the reference LIBRARY
    (ref_compose) == compose(bitexact=True), byte for byte."""
    refcompose = ref_tools[1].replace("dump_coefs", "ref_compose")
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = read_dropon(f"{IMAGES}/dropon.png", blend=C.BLEND_FULL)
    for align, ox, oy in [(C.ALIGN_CENTER, 3, -7),
                          (C.ALIGN_TOP | C.ALIGN_RIGHT, -11, 13),
                          (C.ALIGN_BOTTOM | C.ALIGN_LEFT, 1, -2)]:
        ref_out = tmp_path / f"r{align}_{ox}_{oy}.jpg"
        subprocess.run([refcompose, f"{IMAGES}/image.jpg",
                        f"{IMAGES}/dropon.png", "255", str(align), str(ox),
                        str(oy), str(ref_out)], check=True)
        ours = compose_bitexact(img, d, align, ox, oy)
        data = mj.write_jpeg(ours, ref_markers=True)
        assert data == ref_out.read_bytes(), (align, ox, oy)


def test_bitexact_matches_default_mode_closely():
    """The default device compose and the bitexact path agree to within one
    quantization step on touched blocks (sanity: same math, different
    rounding), and exactly off the footprint."""
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = read_dropon(f"{IMAGES}/dropon.png")
    a = mj.compose(img, d, C.ALIGN_CENTER)
    b = mj.compose(img, d, C.ALIGN_CENTER, bitexact=True)
    for c in range(3):
        diff = a.coefs[c].astype(int) - b.coefs[c].astype(int)
        assert np.abs(diff).max() <= 1
